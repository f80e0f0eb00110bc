package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DotProductSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("dot_product is bit-exact with the zip_with/aggregate form") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)((
      Array.fill(64)(rnd.nextGaussian()),
      Array.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
    val out = df.select(
      dot_product(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
        lit(0.0), (acc, v) => acc + v).as("composed"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("dot_product handles nulls and mismatched lengths") {
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(4.0, 5.0, 6.0))),
      (None, Some(Array(1.0))),
      (Some(Array(1.0, 2.0)), Some(Array(3.0)))
    ).toDF("a", "b")
    val out = df.select(dot_product(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 3.0) // min-length semantics
  }
}
