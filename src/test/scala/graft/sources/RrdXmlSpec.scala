package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._
import graft.store.MetricStore

/** rrd2whisper parity from `rrdtool dump` XML: RRA→archive mapping, xff
  * inheritance, per-datasource metrics, coarsest-first migration with
  * the newest row dropped and NaN slots skipped.
  */
class RrdXmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // lastupdate 123s past a 300s boundary; 300s-step base, hourly RRA
  private val Last = 1706659123L
  private val T300 = Last - Last % 300   // newest fine CDP slot
  private val T3600 = Last - Last % 3600 // newest hourly CDP slot

  /** Hand-authored dump: 2 datasources, AVERAGE RRAs at 1 and 12 pdp
    * (300s and 3600s), plus a MAX RRA the average import must ignore.
    * Fine rows count 24 (7200s retention covers the hourly step as
    * whisper's archive validation requires).
    */
  private def fixture(): String = {
    val fineRows = (0 until 24).map { i =>
      // value encodes the slot index; ds b = 1000 + slot; slot 20 unknown
      val ts = T300 - (23 - i) * 300L
      val slot = i
      val (a, b) =
        if (i == 20) ("NaN", "NaN") else (s"$slot.0", s"${1000 + slot}.0")
      s"<row><v> $a </v><v> $b </v></row>"
    }.mkString("\n")
    val hourRows = (0 until 3).map { i =>
      val v = 500 + i
      s"<row><v> $v.0 </v><v> ${2000 + i}.0 </v></row>"
    }.mkString("\n")
    val maxRows = "<row><v> 9999.0 </v><v> 9999.0 </v></row>" * 2
    val xml =
      s"""<!-- Round-trip representation of an RRD -->
         |<rrd>
         |  <version> 0003 </version>
         |  <step> 300 </step>
         |  <lastupdate> $Last </lastupdate>
         |  <ds><name> a </name><type> GAUGE </type></ds>
         |  <ds><name> b </name><type> GAUGE </type></ds>
         |  <rra>
         |    <cf> AVERAGE </cf>
         |    <pdp_per_row> 1 </pdp_per_row>
         |    <params><xff> 5.0000000000e-01 </xff></params>
         |    <database>
         |$fineRows
         |    </database>
         |  </rra>
         |  <rra>
         |    <cf> AVERAGE </cf>
         |    <pdp_per_row> 12 </pdp_per_row>
         |    <params><xff> 5.0000000000e-01 </xff></params>
         |    <database>
         |$hourRows
         |    </database>
         |  </rra>
         |  <rra>
         |    <cf> MAX </cf>
         |    <pdp_per_row> 1 </pdp_per_row>
         |    <params><xff> 0.0000000000e+00 </xff></params>
         |    <database>
         |$maxRows
         |    </database>
         |  </rra>
         |</rrd>""".stripMargin
    val f = Files.createTempFile("rrd-dump", ".xml")
    Files.writeString(f, xml)
    f.toString
  }

  test("parse: step, lastupdate, datasources, RRAs, NaN slots") {
    val d = RrdXmlSource.parse(fixture())
    assert(d.step == 300 && d.lastUpdate == Last)
    assert(d.dsNames == Seq("a", "b"))
    assert(d.rras.map(_.cf) == Seq("AVERAGE", "AVERAGE", "MAX"))
    assert(d.rras.map(_.pdpPerRow) == Seq(1, 12, 1))
    assert(d.rras.head.xff == 0.5f)
    assert(d.rras.head.rows.size == 24)
    assert(d.rras.head.rows(20)(0).isNaN && d.rras.head.rows(20)(1).isNaN)
    assert(d.rras.head.rows(3)(1) == 1003.0)
  }

  test("importDump: per-ds metrics, RRA-derived policy, migrated values") {
    val store = new MetricStore(
      spark, Files.createTempDirectory("rrd-import").toString, numBuckets = 4)
    val created = RrdXmlSource.importDump(
      store, fixture(), "speed", now = Last)
    assert(created == Seq("speed_a", "speed_b"))

    // policy mirrors the AVERAGE RRAs; xff from the first matching RRA
    val (policy, _) = store.info("speed_a").get
    assert(policy.levels.map(l => (l.secondsPerPoint, l.points)) ==
      Seq((300, 24), (3600, 3)))
    assert(policy.xff == 0.5f && policy.aggregation == AggregationMethod.Average)

    val l0 = store.levelData(0)
      .where(org.apache.spark.sql.functions.col("metric") === "speed_a")
      .collect().map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value"))
      .toMap
    // newest fine row dropped (reference rows.pop): slot 23 absent
    assert(!l0.contains(T300))
    // NaN slot skipped: slot 20 absent
    assert(!l0.contains(T300 - 3 * 300))
    // a surviving recent fine slot: slot 22 at T300-300
    assert(l0(T300 - 300) == 22.0)
    // ds b landed in its own metric with its own values
    val b0 = store.levelData(0)
      .where(org.apache.spark.sql.functions.col("metric") === "speed_b")
      .collect().map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value"))
      .toMap
    assert(b0(T300 - 300) == 1022.0)

    // hourly RRA rows older than the fine retention routed to level 1
    // directly: the oldest surviving hourly row is at T3600-7200 with
    // age > 7200 (fine retention) → archive 1 (reference update_many
    // routing); its value must be the RRA's, not a re-aggregation
    val l1 = store.levelData(1)
      .where(org.apache.spark.sql.functions.col("metric") === "speed_a")
      .collect().map(r => r.getAs[Long]("interval") -> r.getAs[Double]("value"))
      .toMap
    assert(l1.nonEmpty)
    val oldestHourly = T3600 - 2 * 3600
    if (Last - oldestHourly >= 7200) assert(l1(oldestHourly) == 500.0)
  }

  test("importDump: no matching consolidation function fails like the reference") {
    val store = new MetricStore(
      spark, Files.createTempDirectory("rrd-import2").toString, numBuckets = 4)
    val e = intercept[IllegalArgumentException] {
      RrdXmlSource.importDump(store, fixture(), "speed", now = Last,
        method = AggregationMethod.Last)
    }
    assert(e.getMessage.contains("consolidation function"))
    // and sum/absmax/absmin don't exist in RRD at all
    intercept[InvalidAggregationMethod] {
      RrdXmlSource.importDump(store, fixture(), "speed2", now = Last,
        method = AggregationMethod.Sum)
    }
  }
}
