package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture scaler for scale-sensitivity measurement: replicates selected
  * tables of a dataset directory N× with key-space offsets, producing a
  * larger SF whose distributions match the source (`BENCH_SCALING.md`'s
  * third scale point — sf0.1 → sf1 for the shuffle-/scan-bound queries
  * whose cost is SUPPOSED to track data size).
  *
  * Replication choices that keep the ops' own 100 TB cost stories honest:
  *  - `documents.text` is copied VERBATIM across replicas: benchmark/
  *    decontamination gram sets are bounded by design (they don't grow
  *    with the corpus), so the broadcast side of `decontaminate` must
  *    stay constant while the corpus side scales — perturbing text would
  *    grow the gram set 10× and measure a quadratic nobody ships.
  *  - orders/lineitem offset `*_orderkey` by the SAME base (max o_orderkey
  *    + 1) so FK integrity holds across replicas and the join fan-out per
  *    key is unchanged — the skew profile scales, the per-key multiplicity
  *    doesn't.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleUp <srcDir> <dstDir> <factor>")
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, factor)
    println(s"""{"scaled": "$src -> $dst", "factor": $factor}""")
    spark.stop()
  }

  /** The scaling itself, on a caller-owned session (specs use this). */
  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {

    def reps(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(factor).toDF("rep"))

    // max(key) over an empty table is NULL — fail with the table/column
    // name instead of an anonymous NPE from getLong
    def maxKey(df: DataFrame, table: String, keyCol: String): Long = {
      val row = df.agg(max(keyCol)).head
      require(!row.isNullAt(0),
        s"ScaleUp: source table '$table' is empty — cannot derive a key base from max($keyCol)")
      row.getLong(0)
    }

    def writeScaled(name: String, df: DataFrame): Unit =
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // FACTS replicate with key-space offsets; DIMENSIONS copy verbatim —
    // at a larger SF the fact side grows while dims stay bounded, so the
    // many-to-one FK edges (l_partkey→part, o_custkey→customer, …) keep
    // their shape with fan-out scaled by exactly `factor`.

    // documents + embeddings share the doc key space (doc_id = vec_id)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val docBase = math.max(
      maxKey(docs, "documents", "doc_id"),
      maxKey(emb, "embeddings", "vec_id")) + 1L
    writeScaled("documents",
      reps(docs).withColumn("doc_id", col("doc_id") + col("rep") * docBase).drop("rep"))
    writeScaled("embeddings",
      reps(emb).withColumn("vec_id", col("vec_id") + col("rep") * docBase).drop("rep"))

    // orders + lineitem: shared key base preserves FK integrity and
    // per-key join multiplicity across replicas
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val keyBase = maxKey(orders, "orders", "o_orderkey") + 1L
    writeScaled("orders",
      reps(orders).withColumn("o_orderkey", col("o_orderkey") + col("rep") * keyBase).drop("rep"))
    writeScaled("lineitem",
      reps(spark.read.parquet(s"$src/lineitem.parquet"))
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * keyBase).drop("rep"))

    // events: new users per replica (scale adds users, not per-user
    // density — session/window state per key stays bounded)
    val events = spark.read.parquet(s"$src/events.parquet")
    val evBase = maxKey(events, "events", "event_id") + 1L
    val userBase = maxKey(events, "events", "user_id") + 1L
    writeScaled("events",
      reps(events)
        .withColumn("event_id", col("event_id") + col("rep") * evBase)
        .withColumn("user_id", col("user_id") + col("rep") * userBase)
        .drop("rep"))

    // dims verbatim
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
  }
}
