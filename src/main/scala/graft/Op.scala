package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator: a DataFrame query over an sf directory plus (when
  * SQL-expressible) the equivalent DuckDB SQL the driver hash-compares
  * against. Determinism rules (SURVEY §7.4): stable ORDER BY, decimal-cast
  * float aggregates, bigint-cast computed integers, aliases identical on both
  * sides.
  */
final case class Op(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Op {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Op =
    Op(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Op =
    Op(name, fn, None)
}
