package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query; those expressible in ANSI SQL carry a DuckDB oracle the
  * driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All registered operator queries (whisper core + extensions). */
  def allDefs: Seq[QueryDef] =
    WhisperQueries.defs ++ ExtQueries.defs ++ RelationalQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * w01 (the update_many LWW ingest) is the only whisper-core query
    * guaranteed non-empty at the sparsest scale — xff-gated rollups can
    * legitimately produce zero windows at sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    WhisperQueries.defs
      .find(_.name == "w01_update_many_lww")
      .get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
