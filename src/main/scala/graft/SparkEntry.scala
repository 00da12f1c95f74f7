package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY §2 (plus the
  * LLM-pipeline extension surface); `oracleSql` the DuckDB-equivalent SQL for
  * every SQL-expressible one. Registries live next to their implementations
  * (graft.exact.*, graft.ext.*, graft.rspn.*) and are concatenated here.
  */
object SparkEntry {

  private def allOps: Seq[Op] =
    exact.Relational.ops ++ exact.Extended.ops ++ exact.Composite.ops ++ exact.Ssb.ops ++
      plans.SpnPlanning.ops ++
      ext.Text.ops ++ ext.Dedup.ops ++
      ext.Similarity.ops ++ ext.Multimodal.ops ++ ext.Streaming.ops ++
      rspn.ModelQueries.ops ++ schema.SidecarOps.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    exact.Flagship.revenue(
      schema.Tables(spark, "/root/testdata/sf0.001", "lineitem"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
