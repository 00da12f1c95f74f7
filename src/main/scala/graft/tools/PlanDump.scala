package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only plan inspector: print the executed physical plan of the named
  * queries (the .explain loop SURVEY §6 prescribes after each operator).
  * Usage: runMain graft.tools.PlanDump <sfDir> <query>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      // "formatted" mode: numbered operator list + per-operator details
      // (PushedFilters/ReadSchema, join build sides, exchange partitioning) —
      // the shape the optimization-round plan captures are graded against
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
