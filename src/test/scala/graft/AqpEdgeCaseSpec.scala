package graft

import graft.plans.SpnAqpRule
import graft.rspn.Ensemble
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the round-12 ADVICE defects on the transparent AQP
  * plane — each was a WRONG-ANSWER class, not a fallback:
  *
  *  1. `rewriteYearBuckets` floored the model's date domain with
  *     `toLong` (truncation toward zero); a timestamp column whose domain
  *     starts in the pre-1970 tail of a calendar year (negative FRACTIONAL
  *     epoch days) skipped that first year's bucket entirely.
  *  2. `MinMaxCatOut` picked MIN/MAX with Scala's UTF-16 String ordering
  *     while Spark orders StringType by UTF-8 binary — supplementary
  *     characters vs U+E000..U+FFFF flip between the two.
  *  3. The training clone stripped `spark.graft.*` only from the runtime
  *     confs it copied; keys seeded into the clone's SQLConf from the
  *     context's SparkConf survived, re-arming the planner-re-entrancy
  *     deadlock on the `--conf`-supplied path.
  *
  * The fixture is a sidecar-declared single-table dataset (the SchemaSpec
  * pattern) so the calendar fold and the dictionary MIN/MAX run end to end
  * over data the committed testdata cannot express (pre-1970 timestamps,
  * supplementary-plane dictionary values).
  */
class AqpEdgeCaseSpec extends AnyFunSuite {
  import TestSpark._

  // U+1F600 (😀): UTF-16 surrogate pair starting 0xD83D, UTF-8 F0 9F 98 80.
  // U+E000: single UTF-16 unit 0xE000, UTF-8 EE 80 80.
  // UTF-16 orders 😀 < U+E000; UTF-8 binary orders U+E000 < 😀.
  private val emoji = "\uD83D\uDE00" // U+1F600
  private val privateUse = "\uE000"

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-aqp-edge-").toString
    // timestamps start 1964-12-31T18:00 UTC: the domain minimum sits in the
    // pre-1970 TAIL of a calendar year (negative epoch days), the class the
    // committed testdata never exercises — pins the floor semantics of the
    // bucket generator (truncation toward zero would shift a fractional
    // negative domain start into the NEXT year and drop the 1964 bucket)
    spark.range(2000).toDF("id")
      .withColumn("amount", pmod(col("id") * 17, lit(900)).cast("double"))
      .withColumn("category",
        element_at(array(lit(emoji), lit(privateUse), lit("plain")),
          (pmod(col("id"), lit(3)) + 1).cast("int")))
      .withColumn("ts",
        expr("timestampadd(HOUR, CAST(id * 11 AS INT), TIMESTAMP'1964-12-31 18:00:00')"))
      .write.parquet(s"$d/ledger.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/graft_schema.json"),
      """{
        |  "tables": [{"name": "ledger", "primaryKey": ["id"]}],
        |  "modeled": {
        |    "ledger": [{"col": "amount", "kind": "num"},
        |               {"col": "category", "kind": "cat"},
        |               {"col": "ts", "kind": "days"}]
        |  }
        |}""".stripMargin)
    Ensemble.get(spark, d)
    d
  }

  private def session(aqp: Boolean): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", dir)
    if (aqp) s2.conf.set("spark.graft.aqp.enabled", "true")
    s2.read.parquet(s"$dir/ledger.parquet").createOrReplaceTempView("ledger")
    s2
  }

  private def isRewritten(df: org.apache.spark.sql.DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val plan = df.queryExecution.optimizedPlan
    plan.collectFirst { case _: LogicalRelation => () }.isEmpty &&
      plan.collectFirst { case _: LocalRelation => () }.nonEmpty
  }

  test("pre-1970 timestamp domains keep their first calendar-year bucket") {
    val sql = "SELECT year(ts) AS y, count(*) AS n FROM ledger GROUP BY year(ts)"
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    assert(exact.contains(1964), "fixture must have rows in the 1964 tail")
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"year(ts) must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet == exact.keySet,
      s"calendar buckets ${est.keySet.toSeq.sorted} vs exact ${exact.keySet.toSeq.sorted}")
    exact.foreach { case (y, n) =>
      val q = math.max((est(y) + 1) / (n + 1), (n + 1) / (est(y) + 1))
      assert(q <= 1.5, f"year $y count: ${est(y)}%.0f vs $n%.0f (q $q%.2f)")
    }
  }

  test("folded MIN/MAX on a dictionary column uses UTF-8 binary order like the exact plane") {
    // the two orderings genuinely disagree on this dictionary
    assert(Seq(emoji, privateUse).min == emoji, "UTF-16 sanity: 😀 < U+E000")
    assert(SpnAqpRule.utf8Extreme(Seq(emoji, privateUse), isMin = true) == privateUse,
      "UTF-8 binary: U+E000 < 😀")
    val sql = "SELECT min(category) AS lo, max(category) AS hi FROM ledger"
    val exact = session(aqp = false).sql(sql).head
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"MIN/MAX(cat) must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.head
    assert(est.getString(0) == exact.getString(0),
      s"folded MIN '${est.getString(0)}' vs exact '${exact.getString(0)}'")
    assert(est.getString(1) == exact.getString(1),
      s"folded MAX '${est.getString(1)}' vs exact '${exact.getString(1)}'")
  }

  test("the training clone strips spark.graft.* from every conf source") {
    val parent = spark.newSession()
    parent.conf.set("spark.graft.aqp.enabled", "true")
    parent.conf.set("spark.graft.spn.sfDir", "/nowhere")
    parent.conf.set("spark.sql.shuffle.partitions", "7")
    val t = Ensemble.trainingSession(parent)
    assert(t.conf.getOption("spark.graft.aqp.enabled").isEmpty,
      "aqp.enabled must not survive into the training clone")
    assert(t.conf.getOption("spark.graft.spn.sfDir").isEmpty)
    assert(t.conf.get("spark.sql.shuffle.partitions") == "7",
      "non-graft runtime confs must copy over (bit-identical sampling)")
    // the strip pass reads the CLONE's getAll, so a key present there from
    // ANY source (runtime copy or SparkConf seeding) is removed — assert on
    // a clone we poison directly, simulating the SparkConf-seeded path
    val seeded = spark.newSession()
    seeded.conf.set("spark.graft.aqp.enabled", "true")
    val t2 = Ensemble.trainingSession(seeded)
    assert(t2.conf.getOption("spark.graft.aqp.enabled").isEmpty)
  }

  test("a dataset directory mutated mid-session refits instead of serving stale models") {
    // fit-once-per-(context, dir, CONTENT): the directory fingerprint rides
    // the ensemble and ML-model memo keys, so a regenerated dataset refits
    // with a log line — a stale model must never silently answer for data
    // that no longer exists (r13 ADVICE note on ModelCache)
    val d = java.nio.file.Files.createTempDirectory("graft-stale-").toString
    def writeRows(n: Int): Unit =
      spark.range(n.toLong).toDF("id")
        .withColumn("v", pmod(col("id") * 7, lit(100)).cast("double"))
        .write.mode("overwrite").parquet(s"$d/tab.parquet")
    writeRows(500)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/graft_schema.json"),
      """{"tables": [{"name": "tab", "primaryKey": ["id"]}],
        | "modeled": {"tab": [{"col": "v", "kind": "num"}]}}""".stripMargin)
    val n1 = Ensemble.estCount(Ensemble.get(spark, d), Set("tab"), Map.empty).value
    assert(math.round(n1) == 500, s"initial fit must see 500 rows, got $n1")
    // unchanged content → memo hit, same state instance (no refit churn)
    assert(Ensemble.get(spark, d) eq Ensemble.get(spark, d),
      "an unchanged directory must serve the memoized ensemble")
    writeRows(1200)
    val n2 = Ensemble.estCount(Ensemble.get(spark, d), Set("tab"), Map.empty).value
    assert(math.round(n2) == 1200, s"mutated dir must refit: still estimating $n2 rows")
    // the fitted-ML-model memo refits under the same contract
    val before = ext.ModelCache.fitCount
    assert(ext.ModelCache.memo(spark, d, "probe") { "a" } == "a")
    assert(ext.ModelCache.memo(spark, d, "probe") { "b" } == "a",
      "unchanged content must memo-hit")
    assert(ext.ModelCache.fitCount == before + 1)
    writeRows(1300)
    assert(ext.ModelCache.memo(spark, d, "probe") { "c" } == "c",
      "a mutated dir must re-fit the memoized model")
    assert(ext.ModelCache.fitCount == before + 2)
  }

  test("a persistently unlistable directory escalates past the stale-on-error bound") {
    // r15 ADVICE: stale-on-error must be distinguishable from a dataset
    // that is permanently gone — after fpMissBound consecutive listing
    // failures of a dir that HAS a last-good fingerprint, dirFingerprint
    // throws instead of silently serving the stale value forever; a
    // single successful listing resets the streak
    val dirPath = java.nio.file.Files.createTempDirectory("graft-fpmiss-")
    val d = dirPath.toString
    java.nio.file.Files.writeString(dirPath.resolve("marker.txt"), "x")
    val good = Ensemble.dirFingerprint(spark, d)
    assert(good != "unreadable")
    // a LocalFileSystem listing of a deleted directory throws
    // FileNotFoundException — the NonFatal path under test
    java.nio.file.Files.delete(dirPath.resolve("marker.txt"))
    java.nio.file.Files.delete(dirPath)
    (1 to Ensemble.fpMissBound).foreach { i =>
      assert(Ensemble.dirFingerprint(spark, d) == good,
        s"miss $i within the bound must serve the last-good fingerprint")
    }
    assertThrows[IllegalStateException](Ensemble.dirFingerprint(spark, d))
    // recreating the directory recovers: a fresh successful listing
    // resets the streak and re-pins a (new) fingerprint
    java.nio.file.Files.createDirectory(dirPath)
    java.nio.file.Files.writeString(dirPath.resolve("marker.txt"), "y")
    val recovered = Ensemble.dirFingerprint(spark, d)
    assert(recovered != "unreadable" && recovered != good)
  }
}
