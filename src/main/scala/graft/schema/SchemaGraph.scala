package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.concurrent.TrieMap

/** Schema-graph metadata over the catalog tables.
  *
  * Re-expression of the reference's schema registry
  * (ensemble_compilation/graph_representation.py::SchemaGraph / Table /
  * Relationship, public DataManagementLab/deepdb-public snapshot): tables plus
  * one-to-many PK–FK edges. Edges are metadata only — Spark joins realize
  * them; nothing is enforced at load time.
  */
final case class TableMeta(
    name: String,
    primaryKey: Seq[String],
    /** columns never used for modelling (ids/freetext); analog of
      * Table.irrelevant_attributes in the reference. */
    irrelevant: Seq[String] = Nil)

/** One-to-many edge: `many.fk == one.pk` (e.g. lineitem.l_orderkey →
  * orders.o_orderkey). `fanoutCol`/`nnCol` are the derived multiplier and
  * not-null indicator column names materialized by the outer-join sampler
  * (data_preparation/join_data_preparation.py in the reference).
  */
final case class Relationship(many: String, fk: String, one: String, pk: String) {
  def id: String = s"${many}.${fk}=${one}.${pk}"
  def fanoutCol: String = s"mul_${many}_${fk}"
  def nnCol: String = s"nn_${many}"
}

final case class SchemaGraph(tables: Seq[TableMeta], relationships: Seq[Relationship]) {
  def table(name: String): TableMeta = tables.find(_.name == name).get
  def rel(many: String, one: String): Relationship =
    relationships.find(r => r.many == many && r.one == one).get
}

object SchemaGraph {
  /** The driver-generated TPC-H-ish testdata schema (TESTDATA.md/FIXTURES.md). */
  val testdata: SchemaGraph = SchemaGraph(
    tables = Seq(
      TableMeta("region", Seq("r_regionkey")),
      TableMeta("nation", Seq("n_nationkey")),
      TableMeta("supplier", Seq("s_suppkey"), irrelevant = Seq("s_name")),
      TableMeta("customer", Seq("c_custkey"), irrelevant = Seq("c_name")),
      TableMeta("part", Seq("p_partkey"), irrelevant = Seq("p_name")),
      TableMeta("orders", Seq("o_orderkey")),
      TableMeta("lineitem", Seq("l_orderkey", "l_linenumber")),
      TableMeta("events", Seq("event_id"), irrelevant = Seq("props")),
      TableMeta("documents", Seq("doc_id"), irrelevant = Seq("text")),
      TableMeta("embeddings", Seq("vec_id"), irrelevant = Seq("embedding"))
    ),
    relationships = Seq(
      Relationship("nation", "n_regionkey", "region", "r_regionkey"),
      Relationship("supplier", "s_nationkey", "nation", "n_nationkey"),
      Relationship("customer", "c_nationkey", "nation", "n_nationkey"),
      Relationship("orders", "o_custkey", "customer", "c_custkey"),
      Relationship("lineitem", "l_orderkey", "orders", "o_orderkey"),
      Relationship("lineitem", "l_partkey", "part", "p_partkey"),
      Relationship("lineitem", "l_suppkey", "supplier", "s_suppkey")
    )
  )
}

/** Cached parquet table loader. One read per (session, sfDir, table); Bench
  * runs the whole query map in one session, so re-reading per query would be
  * the easiest way to blow the 2× gate (BASELINE.md). `.cache()` is applied
  * only below an on-disk size threshold: dim tables and the sf≤0.1 facts
  * comfortably fit executor memory, while a 100 TB fact table must stream
  * from parquet — pinning it would evict everything else and thrash. The
  * threshold is a runtime knob (graft.cacheMaxBytes /
  * SPARK_GRAFT_CACHE_MAX_BYTES, default 4 GiB of parquet ≈ 15–25 GiB
  * decompressed across executors); `raw` always bypasses both cache layers.
  */
object Tables {
  private val cache = TrieMap.empty[(SparkSession, String, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, name), {
      val df = raw(spark, sfDir, name)
      if (diskBytes(spark, s"$sfDir/$name.parquet") <= cacheMaxBytes) df.cache() else df
    })

  /** Unpersist and forget every cached table of one (context, directory):
    * multi-SF bench runs call this between suites so the previous SF's
    * cached tables stop occupying executor memory while the next SF runs
    * (a never-evicted entry would bias exactly the cross-SF wall ratios
    * the scaling artifact reports). Matched by SPARK CONTEXT, not session:
    * cloned sessions (the ensemble's training session, `newSession()` gate
    * ops) share one CacheManager, so their cached reads of this directory
    * substitute into EVERY session's plans — dropping only the caller's
    * own entries would leave those pinned forever.
    */
  def dropDir(spark: SparkSession, sfDir: String): Unit =
    cache.keys.filter(k =>
        k._1.sparkContext == spark.sparkContext && k._2 == sfDir).foreach { k =>
      cache.remove(k).foreach { df =>
        try df.unpersist(blocking = true)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }

  private def cacheMaxBytes: Long =
    sys.props.get("graft.cacheMaxBytes")
      .orElse(sys.env.get("SPARK_GRAFT_CACHE_MAX_BYTES"))
      .map(_.trim.toLong).getOrElse(4L << 30)

  /** On-disk footprint of a parquet file or directory-of-parts, resolved
    * through the Hadoop filesystem of the path (so hdfs:// and s3a:// report
    * true sizes — java.io.File would return 0 for them and cache exactly the
    * huge tables this threshold exists to stream). Unknown size fails
    * CLOSED (Long.MaxValue → no cache): streaming is always correct,
    * pinning an unknown-size table is not.
    */
  private def diskBytes(spark: SparkSession, path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case scala.util.control.NonFatal(_) => Long.MaxValue }

  def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) in some fixture
      // generations and TIMESTAMP(MICROS) in others, so normalize from
      // whatever the file actually holds. NANOS is unreadable by Spark's
      // vectorized reader, so the legacy conf surfaces it as a raw long and
      // the floor-divide rebuilds micros — integer `div` (not `/`) keeps the
      // arithmetic in long: ns values ≈ 1.7e18 would lose precision through
      // a double. MICROS reads as a timestamp directly (NTZ under the
      // default inference) and only needs the cast to the session-UTC
      // TimestampType every downstream op expects.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      // only the encodings actually observed are accepted; anything else
      // (string, INT96-as-something-new, …) fails LOUDLY here rather than
      // fail-open through a cast that yields nulls and silently poisons
      // every downstream watermark/window op
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))
        case org.apache.spark.sql.types.TimestampType =>
          org.apache.spark.sql.functions.col("ts")
        case org.apache.spark.sql.types.TimestampNTZType =>
          org.apache.spark.sql.functions.col("ts").cast("timestamp")
        case other =>
          throw new IllegalStateException(
            s"events.ts: unexpected parquet type $other (expected NANOS-as-long, TIMESTAMP, or TIMESTAMP_NTZ)")
      }
      raw.withColumn("ts", ts)
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
