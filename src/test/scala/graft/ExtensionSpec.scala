package graft

import graft.plans.{GraftExtensions, SpnBroadcastRule, SpnCardinality}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The learned-cardinality optimizer rule (plans/SpnCardinality.scala):
  * Catalyst integration on an ISOLATED `newSession` (its SessionState —
  * conf, experimental rules — is fresh, so nothing here can perturb the
  * shared session's plans mid-suite), estimator math against true counts,
  * and the conservative refusals that make a learned hint safe.
  */
class ExtensionSpec extends AnyFunSuite {
  import TestSpark._

  // plan-shape tests read sf0.01 with PLAIN (non-caching) reads; every
  // model-backed test runs at sf0.001 — `Ensemble.get` trains through the
  // caching `Tables` reader, and PlanSpec's scan-shape assertions depend on
  // the sf0.01 fixture staying out of the shared CacheManager until its own
  // later-declared tests run (AccuracySpec already trains sf0.001, so the
  // ensemble here is a memo hit and nothing new is cached)
  private val rawSf = sfMid
  private val modelSf = sf

  /** Fresh session with the rule installed and size-based broadcasting
    * disabled: any BroadcastHashJoin in these plans exists because the
    * LEARNED estimate placed the hint, not because of file sizes.
    */
  private def sessionWith(rule: SpnBroadcastRule) = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.experimental.extraOptimizations = Seq(rule)
    s2
  }

  private def demoJoin(s2: org.apache.spark.sql.SparkSession, dir: String = rawSf) = {
    val li = s2.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val ord = s2.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_totalprice") < 2000 && col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
  }

  test("a small learned estimate turns the filtered side into a broadcast join") {
    val rule = SpnBroadcastRule((tables, atomsByTable) => {
      assert(tables == Set("orders"))
      // both real filter conjuncts must reach the estimator as atoms
      val atoms = atomsByTable("orders")
      val cols = atoms.collect { case SpnCardinality.Cmp(c, _, _) => c }.toSet
      assert(cols == Set("o_totalprice", "o_orderstatus"), s"atoms: $atoms")
      Some(50.0)
    }, 10L * 1024 * 1024)
    val plan = demoJoin(sessionWith(rule)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"learned estimate must place a broadcast hint:\n$plan")
  }

  test("a same-column eq-disjunction compiles to ONE InSet atom in the shared compiler") {
    // (a='x' OR a='y') is a IN ('x','y'): atomsOf folds it, so the
    // broadcast/stats planes estimate instead of bailing on the Or conjunct
    val rule = SpnBroadcastRule((tables, atomsByTable) => {
      assert(tables == Set("orders"))
      val atoms = atomsByTable("orders")
      val ins = atoms.collect {
        case SpnCardinality.InSet(c, vs) => (c, vs.map(String.valueOf(_)).toSet)
      }
      assert(ins == Seq(("o_orderpriority", Set("1-URGENT", "2-HIGH"))), s"atoms: $atoms")
      Some(50.0)
    }, 10L * 1024 * 1024)
    val s2 = sessionWith(rule)
    val li = s2.read.parquet(s"$rawSf/lineitem.parquet").select("l_orderkey", "l_extendedprice")
    val ord = s2.read.parquet(s"$rawSf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH")
      .select("o_orderkey", "o_orderpriority")
    val plan = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the eq-OR InSet estimate must place a broadcast hint:\n$plan")
  }

  test("a single-column range disjunction compiles to ONE AnyOf atom in the shared compiler") {
    // (a < x OR a > y) lowers to one multi-interval AnyOf atom (round 13),
    // so the broadcast/stats planes estimate instead of bailing on the Or
    val rule = SpnBroadcastRule((tables, atomsByTable) => {
      assert(tables == Set("orders"))
      val atoms = atomsByTable("orders")
      val anyOfs = atoms.collect { case a: SpnCardinality.AnyOf => a }
      assert(anyOfs.exists(a => a.column == "o_totalprice" && a.alts.length == 2),
        s"expected a 2-alternative AnyOf on o_totalprice, got: $atoms")
      Some(50.0)
    }, 10L * 1024 * 1024)
    val s2 = sessionWith(rule)
    val li = s2.read.parquet(s"$rawSf/lineitem.parquet").select("l_orderkey", "l_extendedprice")
    val ord = s2.read.parquet(s"$rawSf/orders.parquet")
      .filter(col("o_totalprice") < 1000 || col("o_totalprice") > 400000)
      .select("o_orderkey", "o_orderpriority")
    val plan = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the range-union AnyOf estimate must place a broadcast hint:\n$plan")
  }

  test("a PK-FK joined side is estimated through the join-cardinality path") {
    var joinAsked = false
    val rule = SpnBroadcastRule((tables, _) => {
      if (tables == Set("orders", "customer")) { joinAsked = true; Some(100.0) }
      else Some(1e9) // single-table sides: too big, only the join estimate helps
    }, 10L * 1024 * 1024)
    val s2 = sessionWith(rule)
    val li = s2.read.parquet(s"$rawSf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val cust = s2.read.parquet(s"$rawSf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = s2.read.parquet(s"$rawSf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val plan = li.join(
        ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(joinAsked, "the joined side never reached the join-cardinality estimator")
    assert(plan.contains("BroadcastHashJoin"),
      s"the small joined side must broadcast on the learned join estimate:\n$plan")
  }

  test("join estimator: learned join cardinality tracks the true filtered join count") {
    val spns = rspn.Ensemble.get(spark, modelSf)
    val ord = spark.read.parquet(s"$modelSf/orders.parquet")
    val cust = spark.read.parquet(s"$modelSf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
    val truth = ord.join(cust, col("o_custkey") === col("c_custkey")).count()
    val est = SpnCardinality.estimateJoin(spns, Set("orders", "customer"),
      Map("customer" -> Seq(SpnCardinality.Cmp("c_mktsegment", "eq", "BUILDING"))))
    assert(est.isDefined, "no join estimate")
    val qErr = math.max((est.get + 1) / (truth + 1), (truth + 1) / (est.get + 1))
    assert(qErr <= 4.0, s"join estimate ${est.get} vs true $truth (q-error $qErr)")
  }

  test("a large estimate, an inestimable side, and a too-small threshold all refuse") {
    Seq[(SpnCardinality.CardEstimator, Long)](
      ((_, _) => Some(1e9), 10L * 1024 * 1024), // model says big
      ((_, _) => None, 10L * 1024 * 1024),      // model can't answer
      ((_, _) => Some(50.0), 1024L)             // 50 rows × headroom > 1 KiB budget
    ).foreach { case (est, thr) =>
      val plan = demoJoin(sessionWith(SpnBroadcastRule(est, thr)))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"rule must stay conservative:\n$plan")
    }
  }

  test("the dataset gate: estimates apply only to the directory the model was trained on") {
    // a model is calibrated to one dataset's row counts — a same-named
    // table read from a DIFFERENT directory (a larger SF in practice) must
    // not inherit its estimate
    val mismatch = SpnBroadcastRule((_, _) => Some(50.0), 10L * 1024 * 1024,
      datasetDir = Some("/some/other/dataset"))
    val p1 = demoJoin(sessionWith(mismatch)).queryExecution.executedPlan.toString
    assert(!p1.contains("BroadcastHashJoin"),
      s"an estimate from another dataset's model must be refused:\n$p1")
    val matching = SpnBroadcastRule((_, _) => Some(50.0), 10L * 1024 * 1024,
      datasetDir = Some(rawSf))
    val p2 = demoJoin(sessionWith(matching)).queryExecution.executedPlan.toString
    assert(p2.contains("BroadcastHashJoin"),
      s"the matching dataset must still broadcast:\n$p2")
  }

  test("a predicate on an unmodeled column blocks the estimate (conservative)") {
    // l_orderkey is not a modeled column: a selective predicate the model
    // cannot see makes every atom set untrustworthy for this side
    var asked = 0
    val rule = SpnBroadcastRule((_, _) => { asked += 1; Some(1.0) }, 10L * 1024 * 1024)
    val s2 = sessionWith(rule)
    val li = s2.read.parquet(s"$rawSf/lineitem.parquet").select("l_orderkey", "l_extendedprice")
    val ord = s2.read.parquet(s"$rawSf/orders.parquet")
      .filter(col("o_custkey") % 97 === 0) // arithmetic shape → not an atom
      .select("o_orderkey", "o_orderpriority")
    val plan = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), s"unestimable side must not broadcast:\n$plan")
    assert(asked == 0, "estimator must not be consulted for a side it can't parse")
  }

  test("estimator: learned counts track true filtered cardinalities") {
    val spns = rspn.Ensemble.get(spark, modelSf)
    val ord = spark.read.parquet(s"$modelSf/orders.parquet")
    val cases: Seq[(Seq[SpnCardinality.Atom], Long)] = Seq(
      (Seq(SpnCardinality.Cmp("o_totalprice", "lt", Double.box(2000.0)),
        SpnCardinality.Cmp("o_orderstatus", "eq", "F")),
        ord.filter(col("o_totalprice") < 2000 && col("o_orderstatus") === "F").count()),
      (Seq(SpnCardinality.Cmp("o_totalprice", "ge", Double.box(400000.0))),
        ord.filter(col("o_totalprice") >= 400000).count()),
      (Seq(SpnCardinality.InSet("o_orderpriority", Seq("1-URGENT", "2-HIGH"))),
        ord.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()))
    cases.foreach { case (atoms, truth) =>
      val est = SpnCardinality.estimate(spns, "orders", atoms)
      assert(est.isDefined, s"no estimate for $atoms")
      val qErr = math.max((est.get + 1) / (truth + 1), (truth + 1) / (est.get + 1))
      assert(qErr <= 4.0, s"estimate ${est.get} vs true $truth (q-error $qErr) for $atoms")
    }
  }

  test("estimator: a value outside the dictionary estimates zero rows") {
    val spns = rspn.Ensemble.get(spark, modelSf)
    val est = SpnCardinality.estimate(spns, "orders",
      Seq(SpnCardinality.Cmp("o_orderstatus", "eq", "NO_SUCH_STATUS")))
    assert(est.contains(0.0), s"unknown dictionary value must estimate 0, got $est")
  }

  test("date predicates cross the timestamp-micros / epoch-days encoding correctly") {
    val spns = rspn.Ensemble.get(spark, modelSf)
    val li = spark.read.parquet(s"$modelSf/lineitem.parquet")
    val cutMicros = java.time.LocalDate.parse("1996-01-01").toEpochDay * 86400L * 1000000L
    val est = SpnCardinality.estimate(spns, "lineitem",
      Seq(SpnCardinality.Cmp("l_shipdate", "lt", Long.box(cutMicros))))
    val truth = li.filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")).count()
    assert(est.isDefined)
    val qErr = math.max((est.get + 1) / (truth + 1), (truth + 1) / (est.get + 1))
    assert(qErr <= 2.0, s"date estimate ${est.get} vs true $truth (q-error $qErr)")
  }

  test("the conf-driven extension rule is inert without the sfDir conf") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.experimental.extraOptimizations = Seq(SpnBroadcastRule.fromSession(s2))
    val plan = demoJoin(s2).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), "rule must be inert until opted in")
  }

  test("the conf-driven extension rule broadcasts once opted in via conf") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.graft.spn.sfDir", modelSf)
    s2.experimental.extraOptimizations = Seq(SpnBroadcastRule.fromSession(s2))
    val plan = demoJoin(s2, modelSf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"opted-in session must broadcast the 0.1%-selective side:\n$plan")
  }

  test("GraftExtensions registers the rule without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
