package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-only cold-timing probe: run the named queries once each in this JVM
  * (fresh-JVM invocation ≈ the driver bench's cold cost) and print seconds.
  * Usage: runMain graft.tools.Probe <sfDir> <query>...
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.schema.SchemaGraph.testdata.tables.foreach { t =>
      try graft.schema.Tables(spark, sfDir, t.name).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"PROBE $n%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    spark.stop()
  }
}
