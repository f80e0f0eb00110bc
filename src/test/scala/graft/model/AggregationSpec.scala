package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Port of the aggregation-kernel tests
  * (/root/reference/test_whisper.py:203-235) plus seeded random
  * property sweeps.
  */
class AggregationSpec extends AnyFunSuite {
  import AggregationMethod._

  private val v = Seq(1.0, 2.0, 3.0, 4.0)

  test("kernel semantics (test_whisper.py:203-235)") {
    assert(aggregate(Average, v) == 2.5)
    assert(aggregate(Sum, v) == 10.0)
    assert(aggregate(Last, v) == 4.0)
    assert(aggregate(Max, v) == 4.0)
    assert(aggregate(Min, v) == 1.0)
    // avg_zero over [1,2,3,4,None,None,None,None] → 1.25
    assert(aggregate(AvgZero, v, Some(v.map(Some(_)) ++ Seq.fill(4)(None))) == 1.25)
    // sign preservation (test_whisper.py:225-235)
    assert(aggregate(AbsMax, Seq(-3.0, -2.0, 1.0, 2.0)) == -3.0)
    assert(aggregate(AbsMax, Seq(-2.0, -1.0, 2.0, 3.0)) == 3.0)
    assert(aggregate(AbsMin, Seq(-3.0, -2.0, 1.0, 2.0)) == 1.0)
    assert(aggregate(AbsMin, Seq(-2.0, -1.0, 2.0, 3.0)) == -1.0)
  }

  test("avg_zero without neighborValues raises (whisper.py:565-566)") {
    val e = intercept[InvalidAggregationMethod](aggregate(AvgZero, v))
    assert(e.getMessage == "Using avg_zero without neighborValues")
  }

  test("name/code round trips; unknown names rejected") {
    all.foreach { m =>
      assert(fromName(m.name) == m)
      assert(fromCode(m.code) == m)
    }
    intercept[InvalidAggregationMethod](fromName("p95"))
  }

  test("property: absmax/absmin preserve an element of the input") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val xs = Seq.fill(1 + rnd.nextInt(20))(rnd.nextGaussian() * 100)
      assert(xs.contains(aggregate(AbsMax, xs)))
      assert(xs.contains(aggregate(AbsMin, xs)))
      assert(math.abs(aggregate(AbsMax, xs)) == xs.map(math.abs).max)
      assert(math.abs(aggregate(AbsMin, xs)) == xs.map(math.abs).min)
    }
  }

  test("property: uniform lists are fixed points of average/last/max/min") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val x = rnd.nextGaussian() * 10
      val xs = Seq.fill(1 + rnd.nextInt(30))(x)
      // n·x/n reassociates floating point — equal only to tolerance
      assert(math.abs(aggregate(Average, xs) - x) <= math.abs(x) * 1e-12)
      assert(aggregate(Last, xs) == x)
      assert(aggregate(Max, xs) == x)
      assert(aggregate(Min, xs) == x)
    }
  }
}
