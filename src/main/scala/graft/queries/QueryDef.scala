package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable operator: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle run on the same parquet
  * tables. Column names/types must line up exactly — the driver sorts
  * columns by name and hash-compares values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String,
            fn: (SparkSession, String) => DataFrame,
            oracle: String): QueryDef =
    QueryDef(name, fn, Some(oracle))
}
