package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // date-derived layouts (Partitioned) must not depend on host tz
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the shared table cache (SURVEY §6: cache loaded tables across the
    // queries map) so per-query timings measure the operator, not whichever
    // query happens to touch a table first
    schema.SchemaGraph.testdata.tables.foreach { t =>
      try schema.Tables(spark, sfDir, t.name).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val errors = mutable.LinkedHashMap.empty[String, String]
    // run spn_train first: the once-per-session ensemble training then
    // lands on its natural key instead of whichever model-plane query the
    // map iteration happens to reach first (sql_estimate in BENCH_r03)
    val ordered = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => (if (name == "spn_train") 0 else 1, name) }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(160)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.to(mutable.LinkedHashMap)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    if (errors.nonEmpty) System.err.println(s"BENCH ERRORS: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
