package graft.store

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model._

/** Randomized update_many → levels property: the distributed store must
  * agree with a tiny in-memory simulator implementing the SURVEY.md §2.1
  * semantics directly (align → route by age → LWW → xff-gated cascade).
  * Seeded, so failures reproduce.
  */
class RoundTripPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val Now = 1706659200L

  /** Pure-Scala reference: per-level maps (metric, interval) ->
    * (value, known, vsum) — value per the §2.1 semantics, known/vsum the
    * level-0 contribution counts the counted cascade must maintain
    * (direct rows count as one raw point; cascaded rows sum children).
    */
  private def simulate(points: Seq[(String, Long, Double, Long)],
                       policy: RetentionPolicy,
                       now: Long): Seq[Map[(String, Long), (Double, Long, Double)]] = {
    val levels = policy.levels
    // route: finest level covering age; older than total retention dropped
    val routed = points.flatMap {
      case (m, ts, v, seq) =>
        policy.levelForAge(now - ts).map(l => (l, m, ts, v, seq))
    }
    // LWW per aligned slot at the routed level
    val direct: Seq[scala.collection.mutable.Map[(String, Long), (Double, Long, Double)]] =
      levels.map(_ => scala.collection.mutable.Map[(String, Long), (Double, Long, Double)]())
    routed.groupBy {
      case (l, m, ts, _, _) =>
        (l, m, ts - ts % levels(l).secondsPerPoint)
    }.foreach {
      case ((l, m, slot), grp) =>
        val v = grp.maxBy(_._5)._4
        direct(l)((m, slot)) = (v, 1L, v)
    }
    // cascade level by level from the merged state of the previous level
    val state = direct.map(_.clone())
    for (i <- 1 until levels.size) {
      val hi = levels(i - 1).secondsPerPoint
      val lo = levels(i).secondsPerPoint
      val slots = lo / hi
      // single-batch store: every level-(i-1) row traces to this batch,
      // so the touched-window set is all of level i-1 (no early exit
      // distinction on a fresh store)
      val touched = state(i - 1).keySet.map { case (m, iv) => (m, iv - iv % lo) }
      touched.foreach {
        case (m, w) =>
          val known = (0 until slots).flatMap { j =>
            state(i - 1).get((m, w + j * hi)).map(v => (w + j * hi, v))
          }.sortBy(_._1)
          if (known.nonEmpty &&
            known.size.toDouble / slots >= policy.xff.toDouble) {
            val vals = known.map(_._2._1)
            val v = AggregationMethod.aggregate(
              policy.aggregation, vals,
              Some((0 until slots).map(j => state(i - 1).get((m, w + j * hi)).map(_._1))))
            state(i)((m, w)) = (v, known.map(_._2._2).sum, known.map(_._2._3).sum)
          }
      }
    }
    state.map(_.toMap)
  }

  test("store agrees with the reference simulator on random batches (3 policies)") {
    val rnd = new scala.util.Random(42)
    val policies = Seq(
      RetentionPolicy(Seq(ArchiveInfo(60, 200), ArchiveInfo(300, 200)), xff = 0.5f),
      RetentionPolicy(Seq(ArchiveInfo(30, 100), ArchiveInfo(120, 100),
        ArchiveInfo(600, 60)), xff = 0.25f,
        aggregation = AggregationMethod.Max),
      RetentionPolicy(Seq(ArchiveInfo(10, 400), ArchiveInfo(60, 400)), xff = 0f,
        aggregation = AggregationMethod.Sum)
    )
    policies.zipWithIndex.foreach {
      case (policy, pi) =>
        val store = new MetricStore(
          spark, Files.createTempDirectory(s"ms-prop$pi").toString, numBuckets = 4)
        val metrics = Seq("m1", "m2")
        metrics.foreach(store.create(_, policy))
        val horizon = policy.maxRetention + policy.maxRetention / 4 // incl. too-old
        val points = (0 until 300).map { i =>
          (metrics(rnd.nextInt(2)),
            Now - (rnd.nextDouble() * horizon).toLong,
            math.floor(rnd.nextDouble() * 200) / 2 - 50, // 0.5-grid values, some negative
            i.toLong)
        }
        store.updateMany(points.toDF("metric", "ts", "value", "seq"), Now)

        val want = simulate(points, policy, Now)
        def levelState(st: MetricStore, i: Int) = st.levelData(i).collect()
          .map { r =>
            val counts =
              if (i == 0) (1L, r.getAs[Double]("value"))
              else (r.getAs[Long]("known"), r.getAs[Double]("vsum"))
            (r.getAs[String]("metric"), r.getAs[Long]("interval")) ->
              ((r.getAs[Double]("value"), counts._1, counts._2))
          }.toMap
        policy.levels.indices.foreach { i =>
          assert(levelState(store, i) == want(i), s"policy $pi level $i")
        }

        // incremental property: the SAME point set ingested as two
        // interleaved batches (overlapping windows, cross-batch slot
        // overwrites) must converge to the same state — seq is monotone
        // across batches, so global LWW == batch-ordered LWW, and the
        // touched-window cascade must repair every window batch 2 dirties
        val store2 = new MetricStore(
          spark, Files.createTempDirectory(s"ms-prop$pi-inc").toString, numBuckets = 4)
        metrics.foreach(store2.create(_, policy))
        // split on ARRIVAL order (seq), keeping it monotone across the
        // batches; timestamps stay randomly interleaved so batch 2 still
        // dirties windows batch 1 already rolled up
        val (b1, b2) = points.partition(_._4 < 150)
        store2.updateMany(b1.toDF("metric", "ts", "value", "seq"), Now)
        store2.updateMany(b2.toDF("metric", "ts", "value", "seq"), Now)
        policy.levels.indices.foreach { i =>
          assert(levelState(store2, i) == want(i), s"policy $pi level $i (incremental)")
        }
    }
  }
}
