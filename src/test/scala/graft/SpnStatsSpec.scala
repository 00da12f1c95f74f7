package graft

import graft.plans.SpnCardinality
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Learned statistics INJECTION (plans/SpnStats.scala) + the `spn_count`
  * SQL function (plans/SpnFunctions.scala). These go beyond the broadcast
  * hint rule: the model's cardinalities are written into what the scans
  * report via `plan.stats`, so Spark's own cost-based machinery — build-side
  * selection and `CostBasedJoinReorder` — acts on them with no further
  * integration. Each test runs on an isolated `newSession` (the extensions
  * were registered at builder time in TestSpark, so child sessions carry
  * them; the confs opting in are per-session).
  *
  * Plan-shape tests read a private COPY of the sf0.001 fixture: the shared
  * suite session caches the canonical paths (Tables), and a cached scan
  * resolves to an InMemoryRelation whose materialized stats already carry
  * exact row counts — both the injection target and the static-stats
  * control need genuine uncached parquet scans to mean anything.
  */
class SpnStatsSpec extends AnyFunSuite {
  import TestSpark._

  private val planTables = Seq("lineitem", "orders", "customer", "part", "supplier", "documents")

  /** Fixture copy + one-time ensemble training, after which the training
    * reads are unpersisted so this directory's scans stay LogicalRelations.
    * (Ensemble.get memoizes per SparkContext, so the per-test sessions hit
    * the model trained here without re-reading — or re-caching — anything.)
    */
  private lazy val tmpSf: String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-spnstats-")
    planTables.foreach { t =>
      Files.copy(Paths.get(s"$sf/$t.parquet"), dir.resolve(s"$t.parquet"))
    }
    val d = dir.toString
    rspn.Ensemble.get(spark, d)
    planTables.foreach(t => schema.Tables(spark, d, t).unpersist(blocking = true))
    d
  }

  /** Fresh opted-in (or control) session. The hint rule is neutralized via
    * a zero broadcast budget so every effect observed here comes from the
    * injected STATISTICS, not from a hint.
    */
  private def session(statsInjection: Boolean, confs: (String, String)*): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", tmpSf)
    s2.conf.set("spark.graft.spn.broadcastBytes", "0")
    if (statsInjection) s2.conf.set("spark.graft.spn.statsInjection", "true")
    confs.foreach { case (k, v) => s2.conf.set(k, v) }
    s2
  }

  private def filteredOrdersJoin(s2: SparkSession) = {
    val li = s2.read.parquet(s"$tmpSf/lineitem.parquet")
      .select("l_orderkey", "l_extendedprice")
    val ord = s2.read.parquet(s"$tmpSf/orders.parquet")
      .filter(col("o_totalprice") < 2000 && col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
  }

  test("injected stats flip the build side: learned size broadcasts where file size refuses") {
    // orders.parquet at sf0.001 is ~36 KB on disk; the 8 KB auto-broadcast
    // threshold refuses it on static stats. The learned post-filter
    // estimate (a handful of rows) is far below 8 KB — with injection the
    // planner broadcasts the filtered side ON ITS OWN, no hint involved.
    val thr = "spark.sql.autoBroadcastJoinThreshold" -> "8192"
    val statik = filteredOrdersJoin(session(statsInjection = false, thr))
      .queryExecution.executedPlan.toString
    assert(!statik.contains("BroadcastHashJoin"),
      s"control: static file size must exceed the 8 KB budget:\n$statik")
    val learned = filteredOrdersJoin(session(statsInjection = true, thr))
      .queryExecution.executedPlan.toString
    assert(learned.contains("BroadcastHashJoin"),
      s"injected learned size must bring the filtered side under budget:\n$learned")
  }

  /** Base tables scanned under a plan fragment, in tree order. */
  private def scansOf(plan: LogicalPlan): Seq[String] = plan.collect {
    case rel: LogicalRelation =>
      rel.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.head.getName.stripSuffix(".parquet")
      }
  }

  private def threeWay(s2: SparkSession) = {
    val li = s2.read.parquet(s"$tmpSf/lineitem.parquet").select("l_orderkey", "l_quantity")
    val ord = s2.read.parquet(s"$tmpSf/orders.parquet")
      .filter(col("o_totalprice") < 2000)
      .select("o_orderkey", "o_custkey")
    val cust = s2.read.parquet(s"$tmpSf/customer.parquet").select("c_custkey", "c_acctbal")
    // written order: (lineitem ⨝ orders) ⨝ customer — the WORST order when
    // the orders filter keeps a handful of rows (join the two big tables
    // first), and the order static stats are stuck with (raw parquet scans
    // have no rowCount ⇒ CostBasedJoinReorder disqualifies the plan)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy().agg(sum("l_quantity"))
  }

  test("under CBO, injected row counts let CostBasedJoinReorder move the filtered dim first") {
    val cbo = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val control = threeWay(session(statsInjection = false, cbo: _*))
      .queryExecution.optimizedPlan
    val controlDeepest = control.collect { case j: Join => j }.last
    assert(scansOf(controlDeepest).contains("lineitem"),
      s"control: without row counts the written order (lineitem joins first) must survive:\n$control")

    val learned = threeWay(session(statsInjection = true, cbo: _*))
      .queryExecution.optimizedPlan
    val learnedDeepest = learned.collect { case j: Join => j }.last
    val deepTables = scansOf(learnedDeepest).toSet
    assert(deepTables == Set("orders", "customer"),
      s"learned stats must reorder to join the tiny filtered orders with customer first, " +
        s"got deepest join over $deepTables:\n$learned")
  }

  /** Both-sides-filtered join tree: (lineitem_1995 ⋈ orders_1995) ⋈
    * customer_acctbal. The scan-stats-only formula collapses the deepest
    * join to ~|O_f| (the ndv cap makes the divisor the smaller filtered
    * side), while the ensemble's own join estimate is ~|L_f|·|O_f|/|O| —
    * a 1.6×+ gap this fixture exhibits without any engineered skew.
    */
  private def filteredTriple(s2: SparkSession) = {
    val li = s2.read.parquet(s"$tmpSf/lineitem.parquet")
      .filter(col("l_shipdate") >= "1995-01-01" && col("l_shipdate") < "1996-01-01")
      .select("l_orderkey", "l_quantity")
    val ord = s2.read.parquet(s"$tmpSf/orders.parquet")
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1996-01-01")
      .select("o_orderkey", "o_custkey")
    val cust = s2.read.parquet(s"$tmpSf/customer.parquet")
      .filter(col("c_acctbal") > 1000).select("c_custkey", "c_acctbal")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy().agg(sum("l_quantity"))
  }

  private def modelJoinEst(tables: Set[String]): Double = {
    val spns = rspn.Ensemble.get(spark, tmpSf)
    def day(s: String): Double = java.time.LocalDate.parse(s).toEpochDay.toDouble
    val preds = Map(
      ("lineitem", "l_shipdate") ->
        (rspn.NumRange(day("1995-01-01"), day("1996-01-01"), hiIncl = false): rspn.ColRange),
      ("orders", "o_orderdate") ->
        rspn.NumRange(day("1995-01-01"), day("1996-01-01"), hiIncl = false),
      ("customer", "c_acctbal") ->
        rspn.NumRange(1000.0, Double.PositiveInfinity, loIncl = false))
      .filter { case ((t, _), _) => tables(t) }
    rspn.Ensemble.estCount(spns, tables, preds).value
  }

  /** `plan.stats` reads SQLConf.get from the CALLING thread — reading a
    * CBO-visitor statistic requires the cbo-enabled session to be active,
    * or the size-only visitor answers (and poisons the node's stats cache).
    */
  private def joinCard(s2: SparkSession, plan: LogicalPlan, deepest: Boolean): Option[Double] = {
    val prev = SparkSession.getActiveSession
    SparkSession.setActiveSession(s2)
    try {
      val joins = plan.collect { case j: Join => j }
      (if (deepest) joins.last else joins.head).stats.rowCount.map(_.toDouble)
    } finally prev.foreach(SparkSession.setActiveSession)
  }

  test("join-subtree stats: the Join reports the ensemble's estimate, not |L||R|/max(ndv)") {
    val cbo = "spark.sql.cbo.enabled" -> "true"
    // learned: the top join's reported cardinality IS the model's 3-table
    // estimate (the calibrated key ndvs make JoinEstimation reproduce it)
    val s2 = session(statsInjection = true, cbo)
    val learned = filteredTriple(s2).queryExecution.optimizedPlan
    val got = joinCard(s2, learned, deepest = false)
      .getOrElse(fail(s"top join carries no rowCount:\n$learned"))
    val want = modelJoinEst(Set("lineitem", "orders", "customer"))
    val q3 = math.max((got + 1) / (want + 1), (want + 1) / (got + 1))
    info(f"3-table: plan $got%.0f vs model $want%.1f (q $q3%.3f)")
    assert(q3 <= 1.1, f"top join card $got%.0f must track the model estimate $want%.1f")
    // ... and the nested (lineitem ⋈ orders) join likewise
    val gotLO = joinCard(s2, learned, deepest = true).get
    val wantLO = modelJoinEst(Set("lineitem", "orders"))
    assert(math.max((gotLO + 1) / (wantLO + 1), (wantLO + 1) / (gotLO + 1)) <= 1.1,
      f"deep join card $gotLO%.0f must track the model estimate $wantLO%.1f")

    // control (scan stats only): the same plan's cardinality comes from the
    // capped-ndv formula, which overshoots the model number by ≥ 1.3× here
    val s3 = session(statsInjection = true, cbo, "spark.graft.spn.joinStats" -> "false")
    val ctrl = filteredTriple(s3).queryExecution.optimizedPlan
    val ctrlLO = joinCard(s3, ctrl, deepest = true).get
    info(f"control deep join: $ctrlLO%.0f (formula) vs $wantLO%.1f (model)")
    assert(ctrlLO / wantLO >= 1.3,
      f"expected the ndv formula to overshoot the model here, got $ctrlLO%.0f vs $wantLO%.1f")
  }

  test("CBO join reorder flips only under the join-aware numbers") {
    val cbo = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // scan-stats control: formula card(L_f⋈O_f) ≈ |O_f| beats
    // card(O_f⋈C_f) ≈ |O_f|·|C_f|/|C| — the reorderer puts orders-customer
    // deepest
    val ctrl = filteredTriple(session(statsInjection = true,
      cbo :+ ("spark.graft.spn.joinStats" -> "false"): _*))
      .queryExecution.optimizedPlan
    val ctrlDeep = scansOf(ctrl.collect { case j: Join => j }.last).toSet
    assert(ctrlDeep == Set("orders", "customer"),
      s"control: capped-ndv numbers must favor orders⋈customer deepest, got $ctrlDeep:\n$ctrl")
    // join-aware: the model's card(L_f⋈O_f) ≈ |L_f|·|O_f|/|O| is the
    // smaller intermediate — the reorderer keeps lineitem⋈orders deepest
    val learned = filteredTriple(session(statsInjection = true, cbo: _*))
      .queryExecution.optimizedPlan
    val learnedDeep = scansOf(learned.collect { case j: Join => j }.last).toSet
    assert(learnedDeep == Set("lineitem", "orders"),
      s"join-aware numbers must keep lineitem⋈orders deepest, got $learnedDeep:\n$learned")
  }

  test("injected scan statistics carry the learned row counts and key ndvs") {
    val s2 = session(statsInjection = true, "spark.sql.cbo.enabled" -> "true")
    val df = s2.read.parquet(s"$tmpSf/orders.parquet").filter(col("o_totalprice") < 2000)
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case r: LogicalRelation if r.catalogTable.isDefined => r
    }
    assert(rel.isDefined, "filtered orders scan was not annotated")
    val stats = rel.get.catalogTable.get.stats.get
    val truth = df.count().toDouble
    val est = stats.rowCount.get.toDouble
    val qErr = math.max((est + 1) / (truth + 1), (truth + 1) / (est + 1))
    assert(qErr <= 4.0, s"annotated rowCount $est vs true $truth (q-error $qErr)")
    // o_orderkey is the PK: its ndv must exist and be capped by the
    // filtered row count, not the full table's
    val ndv = stats.colStats.get("o_orderkey").flatMap(_.distinctCount)
    assert(ndv.isDefined, s"PK ndv missing from ${stats.colStats.keySet}")
    assert(ndv.get.toDouble <= est + 1, s"ndv ${ndv.get} must be capped by filtered rows $est")
  }

  test("stats injection leaves foreign datasets and genuine catalog tables alone") {
    val s2 = session(statsInjection = true)
    // same-named table from a DIFFERENT directory than the trained dataset
    val other = s2.read.parquet(s"$sfMid/orders.parquet").filter(col("o_totalprice") < 2000)
    val annotated = other.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation if r.catalogTable.isDefined => r
    }
    assert(annotated.isEmpty, "a model must never annotate a directory it was not trained on")
  }

  test("spn_count in SQL matches the Scala estimator surface") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", sf)
    val spns = rspn.Ensemble.get(spark, sf)

    val viaSql = s2.sql(
      """SELECT spn_count('orders', "o_totalprice < 2000 AND o_orderstatus = 'F'") AS est""")
      .head().getDouble(0)
    val viaApi = SpnCardinality.estimate(spns, "orders", Seq(
      SpnCardinality.Cmp("o_totalprice", "lt", Double.box(2000.0)),
      SpnCardinality.Cmp("o_orderstatus", "eq", "F"))).get
    assert(math.abs(viaSql - viaApi) <= 1e-6 * math.max(1.0, viaApi),
      s"sql=$viaSql api=$viaApi")

    // bare table form = calibrated table cardinality
    val full = s2.sql("SELECT spn_count('customer') AS est").head().getDouble(0)
    assert(full == spns("customer").scaleRows)

    // join form goes through the join-cardinality path
    val joinSql = s2.sql(
      """SELECT spn_count('orders,customer', "c_mktsegment = 'BUILDING'") AS est""")
      .head().getDouble(0)
    val joinApi = SpnCardinality.estimateJoin(spns, Set("orders", "customer"),
      Map("customer" -> Seq(SpnCardinality.Cmp("c_mktsegment", "eq", "BUILDING")))).get
    assert(math.abs(joinSql - joinApi) <= 1e-6 * math.max(1.0, joinApi))

    // the folded literal composes with surrounding SQL arithmetic
    val ratio = s2.sql(
      """SELECT spn_count('orders', 'o_totalprice < 2000') / spn_count('orders') AS sel""")
      .head().getDouble(0)
    assert(ratio > 0.0 && ratio < 0.5, s"selectivity out of range: $ratio")

    // BETWEEN / IN desugar through Spark's own parser
    val between = s2.sql(
      "SELECT spn_count('lineitem', 'l_quantity BETWEEN 10 AND 20') AS est").head().getDouble(0)
    assert(between > 0.0)

    // spn_sum / spn_avg reach the AQP surfaces (estSum / estAvg)
    val qtyLt25 = Map(("lineitem", "l_quantity") ->
      (rspn.NumRange(Double.NegativeInfinity, 25.0, hiIncl = false): rspn.ColRange))
    val sumSql = s2.sql(
      "SELECT spn_sum('lineitem', 'l_extendedprice', 'l_quantity < 25') AS est")
      .head().getDouble(0)
    val sumApi = rspn.Ensemble.estSum(spns, Set("lineitem"),
      ("lineitem", "l_extendedprice"), qtyLt25).value
    assert(math.abs(sumSql - sumApi) <= 1e-6 * math.max(1.0, math.abs(sumApi)),
      s"spn_sum sql=$sumSql api=$sumApi")
    val avgSql = s2.sql("SELECT spn_avg('lineitem', 'l_extendedprice') AS est")
      .head().getDouble(0)
    val avgApi = rspn.Ensemble.estAvg(spns, Set("lineitem"),
      ("lineitem", "l_extendedprice"), Map.empty).value
    assert(math.abs(avgSql - avgApi) <= 1e-6 * math.max(1.0, math.abs(avgApi)),
      s"spn_avg sql=$avgSql api=$avgApi")
  }

  test("spn_groupby is a table source: model-answered GROUP BY composes with plain SQL") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", sf)
    val spns = rspn.Ensemble.get(spark, sf)
    val viaSql = s2.sql(
      "SELECT l_returnflag, est FROM spn_groupby('lineitem', 'l_returnflag', 'l_quantity < 10') " +
        "ORDER BY l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaApi = rspn.Ensemble.estGroupByCountMulti(spns, Set("lineitem"),
      Seq(("lineitem", "l_returnflag")),
      Map(("lineitem", "l_quantity") ->
        rspn.NumRange(Double.NegativeInfinity, 10.0, hiIncl = false)))
      .map { case (gs, v) => (gs.head, v) }.sortBy(_._1)
    assert(viaSql == viaApi, s"sql=$viaSql api=$viaApi")
    // composes: SQL aggregates over the model's rows
    val total = s2.sql(
      "SELECT SUM(est) FROM spn_groupby('lineitem', 'l_returnflag', 'l_quantity < 10')")
      .head().getDouble(0)
    assert(math.abs(total - viaApi.map(_._2).sum) < 1e-6)
  }

  test("spn_groupby_sum/avg expose the grouped aggregate estimators in SQL") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", sf)
    val spns = rspn.Ensemble.get(spark, sf)
    val preds = Map(("lineitem", "l_quantity") ->
      rspn.NumRange(Double.NegativeInfinity, 25.0, hiIncl = false))
    val sumSql = s2.sql(
      "SELECT l_returnflag, est FROM spn_groupby_sum('lineitem', 'l_returnflag', " +
        "'l_extendedprice', 'l_quantity < 25') ORDER BY l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val sumApi = rspn.Ensemble.estGroupByAgg(spns, Set("lineitem"),
      Seq(("lineitem", "l_returnflag")), Map(("lineitem", "l_extendedprice") -> 1), preds)
      .map { case (gs, e) => (gs.head, e.value) }.sortBy(_._1)
    assert(sumSql == sumApi, s"sum sql=$sumSql api=$sumApi")
    val avgSql = s2.sql(
      "SELECT l_returnflag, est, ci95_lo, ci95_hi FROM spn_groupby_avg('lineitem', " +
        "'l_returnflag', 'l_extendedprice', 'l_quantity < 25') ORDER BY l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    val avgApi = rspn.Ensemble.estGroupByAvg(spns, Set("lineitem"),
      Seq(("lineitem", "l_returnflag")), ("lineitem", "l_extendedprice"), preds)
      .map { case (gs, e) => (gs.head, e.value, e.ci95Lo, e.ci95Hi) }.sortBy(_._1)
    assert(avgSql == avgApi, s"avg sql=$avgSql api=$avgApi")
    avgSql.foreach { case (_, v, lo, hi) => assert(lo <= v && v <= hi) }
    // loud failure without the aggregate column
    val err = intercept[Exception](
      s2.sql("SELECT * FROM spn_groupby_sum('lineitem', 'l_returnflag')").collect())
    assert(err.getMessage.contains("agg_column"))
  }

  test("spn_rollup/spn_cube materialize model grouping sets with SQL NULL markers") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", sf)
    val spns = rspn.Ensemble.get(spark, sf)
    val viaSql = s2.sql(
      "SELECT l_returnflag, l_linestatus, est FROM " +
        "spn_rollup('lineitem', 'l_returnflag,l_linestatus', 'l_quantity < 30') " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getDouble(2))).toSeq
    val viaApi = rspn.Ensemble.estRollup(spns, Set("lineitem"),
      Seq(("lineitem", "l_returnflag"), ("lineitem", "l_linestatus")),
      Map(("lineitem", "l_quantity") ->
        rspn.NumRange(Double.NegativeInfinity, 30.0, hiIncl = false)))
      .map { case (gs, e) => (gs(0), gs(1), e.value) }
      .sortBy(t => (t._1.getOrElse(""), t._2.getOrElse("")))
    assert(viaSql.toSet == viaApi.toSet, s"sql=$viaSql api=$viaApi")
    // the grand total row exists and composes: SQL filters the ALL row
    val grand = s2.sql(
      "SELECT est FROM spn_rollup('lineitem', 'l_returnflag,l_linestatus', " +
        "'l_quantity < 30') WHERE l_returnflag IS NULL AND l_linestatus IS NULL")
      .head().getDouble(0)
    assert(grand == viaApi.find(t => t._1.isEmpty && t._2.isEmpty).get._3)
    // cube carries strictly more sets than rollup (the partial subsets)
    val nCube = s2.sql(
      "SELECT count(*) FROM spn_cube('lineitem', 'l_returnflag,l_linestatus')")
      .head().getLong(0)
    val nRoll = s2.sql(
      "SELECT count(*) FROM spn_rollup('lineitem', 'l_returnflag,l_linestatus')")
      .head().getLong(0)
    assert(nCube > nRoll, s"cube $nCube must exceed rollup $nRoll")
  }

  test("spn_models lists the trained ensemble with consistent metadata") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", sf)
    val spns = rspn.Ensemble.get(spark, sf)
    val rows = s2.sql("SELECT * FROM spn_models() ORDER BY name").collect()
    assert(rows.map(_.getString(0)).toSeq == spns.values.map(_.name).toSeq.sorted)
    rows.foreach { r =>
      val m = spns.values.find(_.name == r.getString(0)).get
      assert(r.getString(1) == m.tables.toSeq.sorted.mkString(","))
      assert(r.getInt(2) == m.cols.length)
      assert(r.getLong(3) == math.round(m.scaleRows))
      assert(r.getLong(4) == m.sampleRows)
      assert(r.getLong(5) >= 1 && r.getInt(6) >= 1, "tree shape must be positive")
    }
    // composes with plain SQL: which single-table models back lineitem?
    val n = s2.sql(
      "SELECT count(*) FROM spn_models() WHERE tables = 'lineitem'").head().getLong(0)
    assert(n >= 1, "at least one lineitem-only SPN must be listed")
  }

  test("spn_*_ci_lo/hi expose the estimator's confidence interval at the SQL surface") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", sf)
    val spns = rspn.Ensemble.get(spark, sf)
    val qtyLt25 = Map(("lineitem", "l_quantity") ->
      (rspn.NumRange(Double.NegativeInfinity, 25.0, hiIncl = false): rspn.ColRange))
    def sqlTriple(base: String, args: String): (Double, Double, Double) = {
      val r = s2.sql(
        s"SELECT $base($args) AS v, ${base}_ci_lo($args) AS lo, ${base}_ci_hi($args) AS hi")
        .head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))

    // count: SQL CI == Scala-API CI (lo clamped at 0 like the point value)
    val (cv, clo, chi) = sqlTriple("spn_count", "'lineitem', 'l_quantity < 25'")
    val ce = rspn.Ensemble.estCount(spns, Set("lineitem"), qtyLt25)
    assert(close(cv, math.max(ce.value, 0.0)) && close(clo, math.max(ce.ci95Lo, 0.0)) &&
      close(chi, math.max(ce.ci95Hi, 0.0)), s"count ($cv,$clo,$chi) vs $ce")
    assert(clo <= cv && cv <= chi, "interval must bracket the point estimate")

    // sum and avg: same single inference pass as the point function
    val (sv, slo, shi) = sqlTriple("spn_sum", "'lineitem', 'l_extendedprice', 'l_quantity < 25'")
    val se = rspn.Ensemble.estSum(spns, Set("lineitem"), ("lineitem", "l_extendedprice"), qtyLt25)
    assert(close(sv, se.value) && close(slo, se.ci95Lo) && close(shi, se.ci95Hi),
      s"sum ($sv,$slo,$shi) vs $se")
    val (av, alo, ahi) = sqlTriple("spn_avg", "'lineitem', 'l_extendedprice'")
    val ae = rspn.Ensemble.estAvg(spns, Set("lineitem"), ("lineitem", "l_extendedprice"), Map.empty)
    assert(close(av, ae.value) && close(alo, ae.ci95Lo) && close(ahi, ae.ci95Hi),
      s"avg ($av,$alo,$ahi) vs $ae")
    assert(slo <= sv && sv <= shi && alo <= av && av <= ahi)

    // CI bounds compose with surrounding SQL like any literal
    val width = s2.sql(
      "SELECT spn_count_ci_hi('lineitem', 'l_quantity < 25') - " +
        "spn_count_ci_lo('lineitem', 'l_quantity < 25') AS w").head().getDouble(0)
    assert(close(width, math.max(ce.ci95Hi, 0.0) - math.max(ce.ci95Lo, 0.0)))
  }

  test("spn_count fails loudly on unanswerable input") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", sf)
    def msgOf(sql: String): String =
      intercept[Exception](s2.sql(sql).collect()).getMessage
    // unmodeled column
    assert(msgOf("SELECT spn_count('orders', \"o_clerk = 'x'\")").contains("not a modeled column"))
    // unsupported predicate shape
    assert(msgOf("SELECT spn_count('orders', 'o_totalprice % 97 = 0')")
      .contains("unsupported predicate shape"))
    // non-literal argument
    assert(msgOf("SELECT spn_count(o_orderpriority) FROM parquet.`" + sf + "/orders.parquet`")
      .contains("string literal"))
    // missing conf
    val s3 = spark.newSession()
    assert(intercept[Exception](s3.sql("SELECT spn_count('orders')").collect())
      .getMessage.contains("spark.graft.spn.sfDir"))
  }
}
