package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time ensemble training in isolation (the heaviest Bench item).
  * Run with GRAFT_TRAIN_TIMING=1 to get the per-stage breakdown that Bench's
  * single JSON line hides. Not part of the driver contract.
  */
object TrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-train-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val t0 = System.nanoTime
    val st = graft.rspn.Ensemble.state(spark, sfDir)
    println(f"[probe] total ${(System.nanoTime - t0) / 1e9}%.2f s, spns=${st.spns.size}")
    spark.stop()
  }
}
