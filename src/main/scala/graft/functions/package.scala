package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.bridge

/** Column-level entry points for the engine's custom Catalyst
  * expressions (Spark 4 classic bridge: Column ⇄ catalyst Expression).
  */
package object functions {

  /** Codegen'd dot product of two array<double> columns (see
    * [[graft.functions.DotProduct]]).
    */
  def dot_product(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** Codegen'd PQ code assignment: argmin cid over a cid-sorted
    * candidate array (see [[graft.functions.PqArgmin]]).
    */
  def pq_argmin(sub: Column, cands: Column): Column =
    bridge.column(PqArgmin(bridge.expression(sub), bridge.expression(cands)))
}
