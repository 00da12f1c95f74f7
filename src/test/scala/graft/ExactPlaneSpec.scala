package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all specs. */
object TestSpark {
  // Window/timestamp group keys render via java.sql.Timestamp.toString
  // (JVM default tz); the committed truth CSVs are UTC-rendered, so pin
  // the JVM default before any Timestamp is stringified on any host.
  java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    // conf-gated (inert until spark.graft.spn.* confs are set), and carried
    // into every newSession() — ExtensionSpec/SpnStatsSpec opt in there
    .withExtensions(new plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val fixtureRoot: String = "/root/testdata"
  val sf: String = s"$fixtureRoot/sf0.001"
  // the mid-size fixture, for properties that hold vacuously at sf0.001
  val sfMid: String = s"$fixtureRoot/sf0.01"
}

class ExactPlaneSpec extends AnyFunSuite with BeforeAndAfterAll {
  import TestSpark._

  override def afterAll(): Unit = () // keep the session for other suites

  test("flagship entry returns a positive revenue row") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 1)
    assert(rows(0).getDouble(0) > 0)
  }

  test("every declared query runs and oracle keys are a subset") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("window_fanout sums to lineitem size, join_full_outer_fanout covers all orders") {
    import org.apache.spark.sql.functions._
    val li = schema.Tables(spark, sf, "lineitem").count()
    val fanouts = SparkEntry.queries("join_full_outer_fanout")(spark, sf)
    assert(fanouts.agg(sum("fanout")).collect()(0).getLong(0) == li)
    val orders = schema.Tables(spark, sf, "orders").count()
    assert(fanouts.count() >= orders)
  }

  test("Tables caches below the size threshold and streams above it") {
    import org.apache.spark.storage.StorageLevel
    // fresh (sfDir, table) keys unused by other suites so the memoized
    // entry reflects this test's threshold — PlanSpec runs the TPC-H ops
    // against sf0.01, so only the sf0.1 dims are safe regardless of suite
    // execution order (both tables are ≤25 rows at any SF)
    val dir = s"$fixtureRoot/sf0.1"
    sys.props("graft.cacheMaxBytes") = "0" // everything is "too big"
    try {
      val big = schema.Tables(spark, dir, "region")
      assert(big.storageLevel == StorageLevel.NONE, "0-byte threshold must not cache")
    } finally sys.props.remove("graft.cacheMaxBytes")
    val small = schema.Tables(spark, dir, "nation") // default 4 GiB threshold
    assert(small.storageLevel.useMemory, "small table must be cached by default")
  }

  test("bucketed join is shuffle-free on both join sides") {
    import org.apache.spark.sql.functions.col
    val orig = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a sort-merge join so the assertion exercises bucketing, not a
    // small-side broadcast (at real scale neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (o, l) = exact.Bucketed.orderKeyTables(spark, sf)
      val bucketed = o.join(l, col("o_orderkey") === col("l_orderkey"))
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      val raw = schema.Tables.raw(spark, sf, "orders")
        .join(schema.Tables.raw(spark, sf, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      val rawPlan = raw.queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange"), "control: the unbucketed join should shuffle")

      // bucketing must never change answers
      assert(bucketed.count() == raw.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", orig)
  }

  test("sketch aggregates land within their error bounds of exact values") {
    import org.apache.spark.sql.functions._
    val li = schema.Tables(spark, sf, "lineitem")
    val exactParts = li.select(countDistinct(col("l_partkey"))).head().getLong(0).toDouble
    val exactP50 = li.selectExpr("percentile(l_extendedprice, 0.5)").head().getDouble(0)
    val row = SparkEntry.queries("agg_sketches")(spark, sf).head()
    val apxParts = row.getAs[Long]("apx_parts").toDouble
    val apxP50 = row.getAs[Double]("apx_p50")
    // HLL++ at rsd=0.01 — allow 5% absolute slack at this small SF
    assert(math.abs(apxParts - exactParts) / exactParts <= 0.05,
      s"approx distinct $apxParts vs exact $exactParts")
    // approx_percentile with accuracy 10000 over ~6k rows is near-exact
    assert(math.abs(apxP50 - exactP50) / exactP50 <= 0.02,
      s"approx p50 $apxP50 vs exact $exactP50")
  }

  test("semi + anti partition customer") {
    val semi = SparkEntry.queries("join_semi")(spark, sf).count()
    val anti = SparkEntry.queries("join_anti")(spark, sf).count()
    val all = schema.Tables(spark, sf, "customer").count()
    assert(anti <= all - semi) // semi uses a price filter, anti does not
  }

  test("compaction collapses the fragmented layout and preserves content") {
    val compacted = exact.Composite.compacted(spark, sf)
    val docs = schema.Tables(spark, sf, "documents")
    assert(compacted.count() == docs.count(), "compaction must not drop or duplicate rows")
    val fragFiles = exact.Composite.parquetFileCount(spark, exact.Composite.fragPath(spark, sf))
    val compFiles = exact.Composite.parquetFileCount(spark, exact.Composite.compactPath(spark, sf))
    assert(fragFiles >= 32, s"fragmented layout should have many files, got $fragFiles")
    assert(compFiles <= 4, s"compacted layout should have few files, got $compFiles")
  }

  test("Warehouse.ensure: two concurrent ensurers run the write exactly once") {
    import java.util.concurrent.atomic.AtomicInteger
    val path = exact.Warehouse.derivedPath(spark, "graft_race_test")
    // the warehouse dir persists across test runs — start from a clean slate
    // or ensure() correctly (but unhelpfully for this test) skips the write
    val destFs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    destFs.delete(new org.apache.hadoop.fs.Path(path), true)
    val writes = new AtomicInteger(0)
    def ensureOnce(): Unit = exact.Warehouse.ensure(spark, path) { tmp =>
      writes.incrementAndGet()
      Thread.sleep(50) // widen the race window the old check-then-write had
      spark.range(10).toDF("id").write.mode("overwrite").parquet(tmp)
    }
    val threads = (1 to 2).map(_ => new Thread(() => ensureOnce()))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(writes.get() == 1, "the losing session must see the winner's layout, not double-write")
    assert(spark.read.parquet(path).count() == 10)
  }

  test("Warehouse.ensure: a partial layout without _SUCCESS is replaced atomically") {
    val path = exact.Warehouse.derivedPath(spark, "graft_partial_test")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a dead writer: data present, no _SUCCESS marker
    spark.range(3).toDF("id").write.mode("overwrite").parquet(path)
    fs.delete(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), false)
    exact.Warehouse.ensure(spark, path) { tmp =>
      spark.range(7).toDF("id").write.mode("overwrite").parquet(tmp)
    }
    assert(spark.read.parquet(path).count() == 7, "partial leftover must be superseded")
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")))
  }
}
