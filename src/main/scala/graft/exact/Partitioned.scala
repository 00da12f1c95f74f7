package graft.exact

import graft.ext.ModelCache
import graft.schema.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned fact layout — the second half of the 100 TB storage
  * story next to Bucketed: facts written `partitionBy(year)` so temporal
  * predicates prune whole directories at planning time (the scan's
  * `PartitionFilters`, asserted in PlanSpec) instead of reading and
  * filtering 100 TB. The write happens once per (session, sfDir) into the
  * gitignored session warehouse; query results are oracle-checked against
  * the unpartitioned table — layout must never change answers.
  */
object Partitioned {

  /** lineitem re-written as parquet partitioned by `l_year`. */
  def lineitemByYear(s: SparkSession, d: String): DataFrame =
    ModelCache.memo(s, d, "partitioned_lineitem_year") {
      val path = Warehouse.derivedPath(s, s"graft_lineitem_by_year_${Warehouse.suffix(d)}")
      Warehouse.ensure(s, path) { tmp =>
        Tables.raw(s, d, "lineitem")
          .withColumn("l_year", year(col("l_shipdate")))
          .write.mode("overwrite").partitionBy("l_year").parquet(tmp)
      }
      s.read.parquet(path)
    }
}
