package graft.sources

import org.apache.spark.sql.functions._

import graft.model.{AggregationMethod, ArchiveInfo, RetentionPolicy}
import graft.store.MetricStore

/** rrd2whisper parity without the rrdtool binary: parse `rrdtool dump`
  * XML (the portable, text representation of an RRD ring file), select
  * the RRAs whose consolidation function matches the requested
  * aggregation, derive the whisper policy — (pdp_per_row·step, rows)
  * per matching RRA, xFilesFactor from the first matching RRA unless
  * overridden — and migrate the stored CDPs coarsest-RRA-first so finer
  * archives overwrite the recent windows they cover. Mirrors
  * /root/reference/bin/rrd2whisper.py:96-164, including: one output
  * metric per datasource (`_<ds>` suffix only when the RRD has several,
  * rrd2whisper.py:118), RRD having no sum/absmax/absmin consolidation,
  * the newest row of every RRA dropped (the reference's `rows.pop()` —
  * RRD's still-open consolidation window "sometimes gives funky
  * values"), and unknown (NaN) slots skipped.
  *
  * The XML is parsed on the driver deliberately: an RRD is a bounded
  * ring buffer (its dump is megabytes at most), so this is catalog-side
  * work; the MIGRATION is a normal distributed `updateMany` per RRA.
  * Row timestamps are reconstructed from `lastupdate` (rows run oldest
  * to newest; the newest row sits at `lastupdate` aligned down to the
  * RRA step) rather than from the dump's timestamp comments, so the
  * parser doesn't depend on comment preservation.
  */
object RrdXmlSource {

  final case class RraDump(cf: String, pdpPerRow: Int, xff: Float,
                           rows: Seq[Array[Double]]) // NaN = unknown slot
  final case class RrdDump(step: Int, lastUpdate: Long,
                           dsNames: Seq[String], rras: Seq[RraDump])

  /** RRD consolidation functions representable as whisper aggregation
    * methods (the reference strips sum/absmax/absmin, rrd2whisper.py:26-30).
    */
  val cfToMethod: Map[String, AggregationMethod] = Map(
    "AVERAGE" -> AggregationMethod.Average,
    "MIN" -> AggregationMethod.Min,
    "MAX" -> AggregationMethod.Max,
    "LAST" -> AggregationMethod.Last)

  def parse(path: String): RrdDump = {
    val root = scala.xml.XML.loadFile(path)
    def txt(n: scala.xml.NodeSeq): String = n.text.trim
    val step = txt(root \ "step").toInt
    val last = txt(root \ "lastupdate").toLong
    val ds = (root \ "ds").map(d => txt(d \ "name"))
    require(ds.nonEmpty, s"no datasources in $path")
    val rras = (root \ "rra").map { rra =>
      val xff = {
        val p = rra \ "params" \ "xff" // format >= 0003
        val node = if (p.nonEmpty) p else rra \ "xff" // legacy dumps
        txt(node).toDouble.toFloat
      }
      val rows = (rra \ "database" \ "row").map { row =>
        (row \ "v").map(v => parseV(v.text)).toArray
      }
      rows.foreach(r => require(r.length == ds.size,
        s"row width ${r.length} != ${ds.size} datasources in $path"))
      RraDump(txt(rra \ "cf").toUpperCase, txt(rra \ "pdp_per_row").toInt,
        xff, rows)
    }
    require(rras.nonEmpty, s"no RRAs in $path")
    RrdDump(step, last, ds, rras)
  }

  private def parseV(s: String): Double = {
    val t = s.trim
    if (t.equalsIgnoreCase("NaN") || t.equalsIgnoreCase("U") || t.isEmpty)
      Double.NaN
    else t.toDouble
  }

  /** Create one metric per datasource from the dump's RRAs matching
    * `method` and migrate their data — the rrd2whisper flow. Returns the
    * created metric names. `baseName` plays the role of the .rrd file
    * basename; multi-datasource RRDs get `_<ds>`-suffixed metrics.
    */
  def importDump(store: MetricStore, path: String, baseName: String,
                 now: Long,
                 method: AggregationMethod = AggregationMethod.Average,
                 xFilesFactor: Option[Float] = None): Seq[String] = {
    val cf = cfToMethod.collectFirst { case (k, m) if m == method => k }
      .getOrElse(throw new graft.model.InvalidAggregationMethod(
        s"RRD has no consolidation function for: ${method.name}"))
    val dump = parse(path)
    val relevant = dump.rras.filter(_.cf == cf)
    require(relevant.nonEmpty,
      s"Unable to find any RRAs with consolidation function: $cf")
    // archive list in RRA order, validated by create (whisper semantics:
    // an ill-ordered RRD is an invalid whisper configuration, not data)
    val archives = relevant.map(r =>
      ArchiveInfo(r.pdpPerRow * dump.step, r.rows.size))
    val xff = xFilesFactor.getOrElse(relevant.head.xff)
    val policy = RetentionPolicy(archives, xff, method)
    val spark = store.spark
    import spark.implicits._
    val metrics = dump.dsNames.map(d =>
      if (dump.dsNames.size > 1) s"${baseName}_$d" else baseName)
    metrics.foreach(store.create(_, policy))
    // coarsest RRA first (reference: `for ... in reversed(archives)`), so
    // each finer RRA's updateMany overwrites the windows it re-covers;
    // update_many's age routing then lands old points in coarse archives
    dump.dsNames.zipWithIndex.foreach { case (d, di) =>
      val metric = metrics(di)
      relevant.reverse.foreach { rra =>
        val rraStep = rra.pdpPerRow * dump.step
        val tsLast = dump.lastUpdate - dump.lastUpdate % rraStep
        val n = rra.rows.size
        val pts = rra.rows.zipWithIndex
          .map { case (vals, i) => (tsLast - (n - 1 - i).toLong * rraStep, vals(di)) }
          .dropRight(1) // the reference's rows.pop(): open CDP window
          .filterNot { case (_, v) => v.isNaN }
          .map { case (ts, v) => (metric, ts, v, ts) } // unique ts → seq=ts
        if (pts.nonEmpty)
          store.updateMany(pts.toDF("metric", "ts", "value", "seq"), now)
      }
    }
    metrics
  }
}
