package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

/** Transparent AQP (plans/SpnAqp.scala): with `spark.graft.aqp.enabled`
  * on, a plain unannotated SQL aggregate over modeled tables folds to its
  * model answer (a LocalRelation — ZERO scans); anything outside the
  * answerable class runs exactly, unchanged. Accuracy gates ride on the
  * same ensemble the workload gates already pin (median q-error ≈ 1.002),
  * so the bounds here are loose enough to never flake and tight enough to
  * catch a broken rewrite (a column mix-up is orders of magnitude off).
  *
  * Like SpnStatsSpec, plan-shape assertions need genuine uncached parquet
  * scans, so the fixture is copied to a private temp dir.
  */
class SpnAqpSpec extends AnyFunSuite {
  import TestSpark._

  private val planTables =
    Seq("lineitem", "orders", "customer", "part", "supplier", "documents", "events")

  private lazy val tmpSf: String = {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-aqp-")
    planTables.foreach { t =>
      Files.copy(Paths.get(s"$sf/$t.parquet"), dir.resolve(s"$t.parquet"))
    }
    val d = dir.toString
    rspn.Ensemble.get(spark, d)
    planTables.foreach(t => schema.Tables(spark, d, t).unpersist(blocking = true))
    d
  }

  private def session(aqp: Boolean): SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", tmpSf)
    if (aqp) s2.conf.set("spark.graft.aqp.enabled", "true")
    planTables.foreach(t =>
      s2.read.parquet(s"$tmpSf/$t.parquet").createOrReplaceTempView(t))
    s2
  }

  private def isRewritten(df: DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    plan.collectFirst { case _: LogicalRelation => () }.isEmpty &&
      plan.collectFirst { case _: LocalRelation => () }.nonEmpty
  }

  private def qerr(est: Double, exact: Double): Double =
    math.max(est / exact, exact / est)

  test("scalar COUNT(*) answers from the model with zero scans") {
    val sql = "SELECT count(*) AS n FROM lineitem WHERE l_quantity < 24"
    val exact = session(aqp = false).sql(sql)
    assert(!isRewritten(exact), "flag off must scan")
    val approx = session(aqp = true).sql(sql)
    assert(isRewritten(approx), s"flag on must fold to a LocalRelation:\n${approx.queryExecution.optimizedPlan}")
    val (e, a) = (exact.head.getLong(0).toDouble, approx.head.getLong(0).toDouble)
    assert(qerr(a, e) <= 1.5, s"count q-error: est $a vs exact $e")
  }

  test("scalar SUM and AVG fold together, each within bounds") {
    val sql = """SELECT sum(l_extendedprice) AS s, avg(l_extendedprice) AS a
                 FROM lineitem WHERE l_quantity < 24""".stripMargin
    val exact = session(aqp = false).sql(sql).head
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df))
    val est = df.head
    assert(qerr(est.getDouble(0), exact.getDouble(0)) <= 1.5,
      s"sum: ${est.getDouble(0)} vs ${exact.getDouble(0)}")
    assert(qerr(est.getDouble(1), exact.getDouble(1)) <= 1.2,
      s"avg: ${est.getDouble(1)} vs ${exact.getDouble(1)}")
  }

  test("GROUP BY folds to per-group model estimates, same group keys") {
    val sql = """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q
                 FROM lineitem WHERE l_quantity < 24
                 GROUP BY l_returnflag""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getString(0) -> (r.getLong(1).toDouble, r.getDouble(2))).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df))
    val est = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1).toDouble, r.getDouble(2))).toMap
    assert(est.keySet == exact.keySet, s"group keys ${est.keySet} vs ${exact.keySet}")
    exact.foreach { case (k, (en, eq)) =>
      assert(qerr(est(k)._1, en) <= 1.5, s"group $k count: ${est(k)._1} vs $en")
      assert(qerr(est(k)._2, eq) <= 1.5, s"group $k sum: ${est(k)._2} vs $eq")
    }
  }

  test("FK join COUNT answers through the join model; ORDER BY survives the fold") {
    val sql = """SELECT count(*) AS n FROM lineitem
                 JOIN orders ON l_orderkey = o_orderkey
                 WHERE o_totalprice < 2000""".stripMargin
    val exact = session(aqp = false).sql(sql).head.getLong(0).toDouble
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df))
    assert(qerr(df.head.getLong(0).toDouble, exact) <= 2.0)
    // an enclosing sort over a folded grouped aggregate still resolves
    // (output exprIds are preserved by the rewrite)
    val sorted = session(aqp = true).sql(
      """SELECT o_orderpriority, count(*) AS n FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         WHERE o_totalprice < 10000
         GROUP BY o_orderpriority ORDER BY n DESC""".stripMargin)
    assert(isRewritten(sorted))
    val ns = sorted.collect().map(_.getLong(1))
    assert(ns.nonEmpty && ns.sameElements(ns.sorted.reverse))
  }

  test("HAVING composes over the folded aggregate (the filter runs on model rows)") {
    // the rewrite preserves the Aggregate's output exprIds, so a HAVING
    // clause — a Filter ABOVE the aggregate — evaluates over the
    // LocalRelation of model answers with no special handling
    val sql = """SELECT l_returnflag, count(*) AS n FROM lineitem
                 GROUP BY l_returnflag HAVING count(*) > 100""".stripMargin
    val exact = session(aqp = false).sql(sql).collect().map(_.getString(0)).toSet
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df))
    val est = df.collect().map(_.getString(0)).toSet
    assert(est == exact, s"HAVING-surviving groups $est != exact $exact")
  }

  test("the revenue shape folds: sum(price * (1 - disc)) distributes to estSum - estSumProduct") {
    // the reference's PLUS/MINUS aggregation class — the TPC-H/SSB revenue
    // expression — recognized by distributing the product over the sum
    val sql = """SELECT sum(l_extendedprice * (1 - l_discount)) AS revenue,
                        count(l_quantity) AS n_qty
                 FROM lineitem WHERE l_quantity < 24""".stripMargin
    val exact = session(aqp = false).sql(sql).head
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"revenue shape must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.head
    assert(qerr(est.getDouble(0), exact.getDouble(0)) <= 1.5,
      s"revenue: ${est.getDouble(0)} vs ${exact.getDouble(0)}")
    assert(qerr(est.getLong(1).toDouble, exact.getLong(1).toDouble) <= 1.5)
    // grouped: the same linear form per group
    val gSql = """SELECT l_returnflag, sum(l_extendedprice * (1 - l_discount)) AS revenue
                  FROM lineitem GROUP BY l_returnflag""".stripMargin
    val gExact = session(aqp = false).sql(gSql).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gDf = session(aqp = true).sql(gSql)
    assert(isRewritten(gDf))
    val gEst = gDf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gEst.keySet == gExact.keySet)
    gExact.foreach { case (k, v) =>
      assert(qerr(gEst(k), v) <= 1.5, s"group $k revenue: ${gEst(k)} vs $v")
    }
    // AVG of the same linear form (round 11): Σ coef·estSum(term) divided
    // by the NotNull-gated count — scalar, grouped, and through an OR
    val avgCases = Seq(
      """SELECT avg(l_extendedprice * (1 - l_discount)) AS a
         FROM lineitem WHERE l_quantity < 24""".stripMargin -> None,
      """SELECT l_returnflag, avg(l_extendedprice * (1 - l_discount)) AS a
         FROM lineitem GROUP BY l_returnflag""".stripMargin -> Some(0),
      """SELECT avg(l_extendedprice * (1 - l_discount)) AS a
         FROM lineitem WHERE l_quantity < 5 OR l_quantity > 45""".stripMargin -> None)
    avgCases.foreach { case (sql2, groupCol) =>
      val ex2 = session(aqp = false).sql(sql2).collect()
      val df2 = session(aqp = true).sql(sql2)
      assert(isRewritten(df2), s"avg(linear form) must fold for [$sql2]:\n${df2.queryExecution.optimizedPlan}")
      val es2 = df2.collect()
      groupCol match {
        case None =>
          assert(qerr(es2.head.getDouble(0), ex2.head.getDouble(0)) <= 1.3,
            s"avg-expr: ${es2.head.getDouble(0)} vs ${ex2.head.getDouble(0)} for [$sql2]")
        case Some(g) =>
          val exM = ex2.map(r => r.getString(g) -> r.getDouble(1)).toMap
          val esM = es2.map(r => r.getString(g) -> r.getDouble(1)).toMap
          assert(esM.keySet == exM.keySet)
          exM.foreach { case (k, v) =>
            assert(qerr(esM(k), v) <= 1.3, s"avg-expr group $k: ${esM(k)} vs $v")
          }
      }
    }
    // E[x²] (a repeated column in one product term) is outside the class
    val sq = session(aqp = true).sql(
      "SELECT sum(l_quantity * l_quantity) AS s FROM lineitem")
    assert(!isRewritten(sq), "second moments must fall back to exact")
    val sqAvg = session(aqp = true).sql(
      "SELECT avg(l_quantity * l_quantity) AS a FROM lineitem")
    assert(!isRewritten(sqAvg), "avg of a second moment must fall back too")
  }

  test("arithmetic over whole aggregates folds; division falls back") {
    // the reference's PLUS/MINUS class at the AGGREGATE level:
    // SUM(a) - SUM(a*b) and scaled counts, scalar and per group
    val sql = """SELECT sum(l_extendedprice) - sum(l_extendedprice * l_discount) AS rev,
                        count(*) * 2 AS n2
                 FROM lineitem WHERE l_quantity < 24""".stripMargin
    val exact = session(aqp = false).sql(sql).head
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"agg arithmetic must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.head
    assert(qerr(est.getDouble(0), exact.getDouble(0)) <= 1.5,
      s"rev: ${est.getDouble(0)} vs ${exact.getDouble(0)}")
    assert(qerr(est.getLong(1).toDouble, exact.getLong(1).toDouble) <= 1.5)
    // per group
    val gSql = """SELECT l_returnflag, sum(l_quantity) - count(*) AS excess
                  FROM lineitem WHERE l_quantity < 24 GROUP BY l_returnflag""".stripMargin
    val gExact = session(aqp = false).sql(gSql).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gDf = session(aqp = true).sql(gSql)
    assert(isRewritten(gDf))
    val gEst = gDf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gEst.keySet == gExact.keySet)
    gExact.foreach { case (k, v) =>
      assert(qerr(gEst(k), v) <= 1.5, s"group $k excess: ${gEst(k)} vs $v")
    }
    // division by a nonzero LITERAL is a scale factor — no /0 divergence —
    // so it folds both per row (sum(x/100)) and over the whole aggregate
    // (count(*)/2); division by an AGGREGATE keeps the fallback below
    val divLit = """SELECT sum(l_extendedprice / 100) AS s100,
                           count(*) / 2 AS half
                    FROM lineitem WHERE l_quantity < 24""".stripMargin
    val dlExact = session(aqp = false).sql(divLit).head
    val dlDf = session(aqp = true).sql(divLit)
    assert(isRewritten(dlDf), s"literal division must fold:\n${dlDf.queryExecution.optimizedPlan}")
    assert(qerr(dlDf.head.getDouble(0), dlExact.getDouble(0)) <= 1.5,
      s"sum(x/100): ${dlDf.head.getDouble(0)} vs ${dlExact.getDouble(0)}")
    assert(qerr(dlDf.head.getDouble(1), dlExact.getDouble(1)) <= 1.5,
      s"count(*)/2: ${dlDf.head.getDouble(1)} vs ${dlExact.getDouble(1)}")
    // division's /0 semantics diverge (SQL null vs folded Inf) — fall back
    val div = session(aqp = true).sql(
      "SELECT sum(l_extendedprice) / count(*) AS m FROM lineitem")
    assert(!isRewritten(div), "aggregate division must fall back to exact")
  }

  test("date predicates fold through the days-kind model columns") {
    val sql = """SELECT count(*) AS n FROM orders
                 WHERE o_orderdate < DATE'1998-06-01' AND o_totalprice < 150000""".stripMargin
    val exact = session(aqp = false).sql(sql).head.getLong(0).toDouble
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df),
      s"date atoms must be answerable:\n${df.queryExecution.optimizedPlan}")
    val est = df.head.getLong(0).toDouble
    assert(qerr(est, exact) <= 1.5, s"date fold: est $est vs exact $exact")
  }

  test("a disjunctive predicate answers through inclusion-exclusion") {
    val sql = """SELECT count(*) AS n, sum(l_extendedprice) AS s FROM lineitem
                 WHERE l_quantity < 5 OR l_quantity > 45""".stripMargin
    val exact = session(aqp = false).sql(sql).head
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"OR must fold via estCountOr:\n${df.queryExecution.optimizedPlan}")
    val est = df.head
    assert(qerr(est.getLong(0).toDouble, exact.getLong(0).toDouble) <= 1.5)
    assert(qerr(est.getDouble(1), exact.getDouble(1)) <= 1.5)
    // OR combined with a plain conjunct: the base atom merges into BOTH branches
    val sql2 = """SELECT count(*) AS n FROM lineitem
                  WHERE l_returnflag = 'A' AND (l_quantity < 5 OR l_quantity > 45)""".stripMargin
    val e2 = session(aqp = false).sql(sql2).head.getLong(0).toDouble
    val d2 = session(aqp = true).sql(sql2)
    assert(isRewritten(d2))
    assert(qerr(d2.head.getLong(0).toDouble, e2) <= 1.5)
    // OR under GROUP BY (round 9): per-group inclusion-exclusion over the
    // union of both branches' group universes
    val gSql = """SELECT l_returnflag, count(*) AS n FROM lineitem
                  WHERE l_quantity < 5 OR l_quantity > 45 GROUP BY l_returnflag""".stripMargin
    val gExact = session(aqp = false).sql(gSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val grouped = session(aqp = true).sql(gSql)
    assert(isRewritten(grouped), s"OR + GROUP BY must fold:\n${grouped.queryExecution.optimizedPlan}")
    val gEst = grouped.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(gEst.keySet == gExact.keySet, s"group keys ${gEst.keySet} vs ${gExact.keySet}")
    gExact.foreach { case (k, v) =>
      assert(qerr(gEst(k), v) <= 1.5, s"group $k OR count: ${gEst(k)} vs $v")
    }
    // THREE independent ORs fold through the 27-term signed expansion
    val threeSql = """SELECT count(*) AS n FROM lineitem
         WHERE (l_quantity < 5 OR l_quantity > 45)
           AND (l_discount < 0.02 OR l_discount > 0.08)
           AND (l_returnflag = 'A' OR l_returnflag = 'R')""".stripMargin
    val e3 = session(aqp = false).sql(threeSql).head.getLong(0).toDouble
    val threeOrs = session(aqp = true).sql(threeSql)
    assert(isRewritten(threeOrs), s"three ORs must fold:\n${threeOrs.queryExecution.optimizedPlan}")
    assert(qerr(threeOrs.head.getLong(0).toDouble, e3) <= 1.5,
      s"three-OR count: ${threeOrs.head.getLong(0)} vs $e3")
    // a same-column eq-disjunction is NOT an OR group — it folds to an
    // IN (one InSet atom), so it coexists with three true range ORs
    val eqOrSql = """SELECT count(*) AS n FROM lineitem
         WHERE (l_returnflag = 'A' OR l_returnflag = 'R')
           AND (l_quantity < 5 OR l_quantity > 45)
           AND (l_discount < 0.02 OR l_discount > 0.08)
           AND (l_tax < 0.02 OR l_tax > 0.06)""".stripMargin
    val eqOrExact = session(aqp = false).sql(eqOrSql).head.getLong(0).toDouble
    val eqOr = session(aqp = true).sql(eqOrSql)
    assert(isRewritten(eqOr),
      s"eq-OR must collapse to IN and free the slot:\n${eqOr.queryExecution.optimizedPlan}")
    assert(qerr(math.max(eqOr.head.getLong(0).toDouble, 1.0), math.max(eqOrExact, 1.0)) <= 2.0,
      s"eq-OR + three ranges: ${eqOr.head.getLong(0)} vs $eqOrExact")
    // a REPEATED literal in the eq-disjunction must not double its mass:
    // BooleanSimplification only folds syntactically adjacent duplicates,
    // so (A ∨ R ∨ A) reaches the compiler carrying the dup — the InSet
    // codes dedupe before the NominalSet sums leaf probabilities
    val dupSql = """SELECT count(*) AS n FROM lineitem
         WHERE (l_returnflag = 'A' OR l_returnflag = 'R' OR l_returnflag = 'A')
           AND l_quantity < 30""".stripMargin
    val dupExact = session(aqp = false).sql(dupSql).head.getLong(0).toDouble
    val dup = session(aqp = true).sql(dupSql)
    assert(isRewritten(dup), s"dup eq-OR must fold:\n${dup.queryExecution.optimizedPlan}")
    assert(qerr(dup.head.getLong(0).toDouble, dupExact) <= 1.5,
      s"repeated-literal eq-OR: ${dup.head.getLong(0)} vs $dupExact (a 2x 'A' mass would blow this)")
    // FOUR single-column range ORs are (round 13) four plain multi-interval
    // atoms — zero disjunction slots, exact range-union semantics — so the
    // query now FOLDS where it used to exhaust the expansion cap
    val fourSql = """SELECT count(*) AS n FROM lineitem
         WHERE (l_quantity < 5 OR l_quantity > 45)
           AND (l_discount < 0.02 OR l_discount > 0.08)
           AND (l_extendedprice < 10000 OR l_extendedprice > 50000)
           AND (l_tax < 0.01 OR l_tax > 0.07)""".stripMargin
    val fourExact = session(aqp = false).sql(fourSql).head.getLong(0).toDouble
    val fourOrs = session(aqp = true).sql(fourSql)
    assert(isRewritten(fourOrs),
      s"four SINGLE-column ORs are plain range unions and must fold:\n${fourOrs.queryExecution.optimizedPlan}")
    assert(qerr(math.max(fourOrs.head.getLong(0).toDouble, 1.0), math.max(fourExact, 1.0)) <= 2.0,
      s"four single-column ORs: ${fourOrs.head.getLong(0)} vs $fourExact")
    // four MULTI-column disjunctions still exceed the signed expansion's
    // accuracy cap (81 terms compound per-term error): fallback
    val fourMixed = session(aqp = true).sql(
      """SELECT count(*) AS n FROM lineitem
         WHERE (l_quantity < 5 OR l_discount > 0.08)
           AND (l_discount < 0.02 OR l_tax > 0.07)
           AND (l_extendedprice < 10000 OR l_quantity > 45)
           AND (l_tax < 0.01 OR l_extendedprice > 50000)""".stripMargin)
    assert(!isRewritten(fourMixed), "four multi-column ORs must fall back to exact")
  }

  test("two independent disjunctions fold through the signed product expansion") {
    // (a OR b) AND (c OR d): 9 conjunctive terms with signs (+,+,-)×(+,+,-)
    val cases = Seq(
      """SELECT count(*) AS n, sum(l_extendedprice) AS s FROM lineitem
         WHERE (l_quantity < 5 OR l_quantity > 45)
           AND (l_discount < 0.02 OR l_discount > 0.08)""".stripMargin,
      // branches over a cat column cross a numeric pair, plus a base conjunct
      """SELECT count(*) AS n, avg(l_quantity) AS a FROM lineitem
         WHERE l_tax < 0.05 AND (l_returnflag = 'A' OR l_returnflag = 'R')
           AND (l_quantity < 20 OR l_quantity > 40)""".stripMargin)
    cases.foreach { sql =>
      val exact = session(aqp = false).sql(sql).head
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df), s"two ORs must fold:\n${df.queryExecution.optimizedPlan}")
      val est = df.head
      assert(qerr(est.getLong(0).toDouble, exact.getLong(0).toDouble) <= 1.5,
        s"two-OR count for [$sql]: ${est.getLong(0)} vs ${exact.getLong(0)}")
      assert(qerr(est.getDouble(1), exact.getDouble(1)) <= 1.5,
        s"two-OR agg for [$sql]: ${est.getDouble(1)} vs ${exact.getDouble(1)}")
    }
    // overlapping branches: the A∧B correction term carries real mass
    // (quantity<30 ∧ quantity>10 is a third of the table), so a sign slip
    // would blow the bound by construction
    val overlap = """SELECT count(*) AS n FROM lineitem
                     WHERE (l_quantity < 30 OR l_discount < 0.05)
                       AND (l_quantity > 10 OR l_discount > 0.02)""".stripMargin
    val e = session(aqp = false).sql(overlap).head.getLong(0).toDouble
    val d = session(aqp = true).sql(overlap)
    assert(isRewritten(d), s"overlapping two-OR must fold:\n${d.queryExecution.optimizedPlan}")
    assert(qerr(d.head.getLong(0).toDouble, e) <= 1.5,
      s"overlap two-OR: ${d.head.getLong(0)} vs $e")
    // grouped two-OR: each of the 9 signed terms enumerates per group and
    // the combination runs over the union of the terms' universes
    val g2Sql = """SELECT l_returnflag, count(*) AS n, sum(l_extendedprice) AS s
                   FROM lineitem
                   WHERE (l_quantity < 5 OR l_quantity > 45)
                     AND (l_discount < 0.02 OR l_discount > 0.08)
                   GROUP BY l_returnflag""".stripMargin
    val g2Exact = session(aqp = false).sql(g2Sql).collect()
      .map(r => r.getString(0) -> (r.getLong(1).toDouble, r.getDouble(2))).toMap
    val grouped2 = session(aqp = true).sql(g2Sql)
    assert(isRewritten(grouped2),
      s"grouped two-OR must fold:\n${grouped2.queryExecution.optimizedPlan}")
    val g2Est = grouped2.collect()
      .map(r => r.getString(0) -> (r.getLong(1).toDouble, r.getDouble(2))).toMap
    assert(g2Est.keySet == g2Exact.keySet,
      s"grouped two-OR keys ${g2Est.keySet} vs ${g2Exact.keySet}")
    g2Exact.foreach { case (k, (en, es)) =>
      assert(qerr(g2Est(k)._1, en) <= 1.5, s"group $k two-OR count: ${g2Est(k)._1} vs $en")
      assert(qerr(g2Est(k)._2, es) <= 1.5, s"group $k two-OR sum: ${g2Est(k)._2} vs $es")
    }
    // grouped THREE-OR: 27 signed terms per enumeration, union universe
    val g3Sql = """SELECT l_returnflag, count(*) AS n FROM lineitem
                   WHERE (l_quantity < 10 OR l_quantity > 40)
                     AND (l_discount < 0.03 OR l_discount > 0.07)
                     AND (l_tax < 0.02 OR l_tax > 0.06)
                   GROUP BY l_returnflag""".stripMargin
    val g3Exact = session(aqp = false).sql(g3Sql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val grouped3 = session(aqp = true).sql(g3Sql)
    assert(isRewritten(grouped3),
      s"grouped three-OR must fold:\n${grouped3.queryExecution.optimizedPlan}")
    val g3Est = grouped3.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(g3Est.keySet == g3Exact.keySet,
      s"grouped three-OR keys ${g3Est.keySet} vs ${g3Exact.keySet}")
    g3Exact.foreach { case (k, v) =>
      assert(qerr(g3Est(k), v) <= 1.5, s"group $k three-OR count: ${g3Est(k)} vs $v")
    }
  }

  test("grouping sets with num-modeled key columns fold via per-set value pins") {
    // r15 kind dispatch inside ROLLUP/CUBE: a numeric grouping column's
    // per-set keys come from its realized-value support (the histogram
    // fold's tuples per set); grouped-out columns stay the SQL NULL marker
    val sql = """SELECT l_returnflag, l_quantity, count(*) AS n
                 FROM lineitem WHERE l_quantity < 8
                 GROUP BY ROLLUP(l_returnflag, l_quantity)""".stripMargin
    def keyed(df: org.apache.spark.sql.DataFrame): Map[(String, String), Double] =
      df.collect().map { r =>
        (if (r.isNullAt(0)) "␀" else r.getString(0),
          if (r.isNullAt(1)) "␀" else r.getDouble(1).toString) -> r.getLong(2).toDouble
      }.toMap
    val exact = keyed(session(aqp = false).sql(sql))
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"numeric ROLLUP must fold:\n${df.queryExecution.optimizedPlan}")
    val est = keyed(df)
    // fine (flag, qty) cells are ~40 rows each at sf0.001 — the sparse
    // boundary convention; subtotal/total rows must match keysets exactly
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"num-rollup phantom row $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"num-rollup dropped row $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"num-rollup row $k: ${est(k)} vs ${exact(k)}")
    }
    // the numeric-only CUBE: sets (qty) and () — value pins plus the
    // grand total, gated SUM folding to the same per-set convention
    val cubeSql = """SELECT l_quantity, count(*) AS n, sum(l_extendedprice) AS s
                     FROM lineitem WHERE l_quantity < 8
                     GROUP BY CUBE(l_quantity)""".stripMargin
    val cubeExact = session(aqp = false).sql(cubeSql).collect()
      .map(r => (if (r.isNullAt(0)) "␀" else r.getDouble(0).toString) -> r.getLong(1).toDouble).toMap
    val cubeDf = session(aqp = true).sql(cubeSql)
    assert(isRewritten(cubeDf), s"numeric CUBE must fold:\n${cubeDf.queryExecution.optimizedPlan}")
    val cubeEst = cubeDf.collect()
      .map(r => (if (r.isNullAt(0)) "␀" else r.getDouble(0).toString) -> r.getLong(1).toDouble).toMap
    assert(cubeEst.keySet == cubeExact.keySet,
      s"numeric CUBE keys ${cubeEst.keySet} vs ${cubeExact.keySet}")
    cubeExact.foreach { case (k, v) =>
      assert(qerr(cubeEst(k), v) <= 2.0 || math.abs(cubeEst(k) - v) <= 10.0,
        s"numeric CUBE row $k: ${cubeEst(k)} vs $v")
    }
    // a near-continuous numeric grouping column still falls back (support
    // past the per-set 400-tuple cap)
    val capped = session(aqp = true).sql(
      """SELECT l_extendedprice, count(*) AS n FROM lineitem
         GROUP BY ROLLUP(l_extendedprice)""".stripMargin)
    assert(!isRewritten(capped), "near-continuous numeric ROLLUP must fall back")
  }

  test("GROUP BY ROLLUP and CUBE fold per grouping set, SQL null convention") {
    val rollup = """SELECT l_returnflag, l_linestatus, count(*) AS n,
                           sum(l_quantity) AS q
                    FROM lineitem WHERE l_quantity < 30
                    GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin
    def keyed(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Double, Double)] =
      df.collect().map { r =>
        (if (r.isNullAt(0)) "␀" else r.getString(0),
          if (r.isNullAt(1)) "␀" else r.getString(1)) ->
          (r.getLong(2).toDouble, r.getDouble(3))
      }.toMap
    val exact = keyed(session(aqp = false).sql(rollup))
    val df = session(aqp = true).sql(rollup)
    assert(isRewritten(df), s"ROLLUP must fold:\n${df.queryExecution.optimizedPlan}")
    val est = keyed(df)
    assert(est.keySet == exact.keySet,
      s"rollup group keys ${est.keySet} vs exact ${exact.keySet}")
    exact.foreach { case (k, (en, eq)) =>
      assert(qerr(est(k)._1, en) <= 1.5, s"rollup $k count: ${est(k)._1} vs $en")
      assert(qerr(est(k)._2, eq) <= 1.5, s"rollup $k sum: ${est(k)._2} vs $eq")
    }
    // the fold must agree with the model plane's own TVF surface on the
    // total row (both route through the same estimators)
    val cube = """SELECT l_returnflag, l_linestatus, count(*) AS n
                  FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin
    val cubeExact = session(aqp = false).sql(cube).count()
    val cubeDf = session(aqp = true).sql(cube)
    assert(isRewritten(cubeDf), "CUBE must fold")
    assert(cubeDf.count() == cubeExact, "CUBE must emit every grouping-set row")
    // GROUPING(col) / grouping_id() are per-set constants: the fold
    // substitutes each Expand projection's grouping-id literal, so the
    // bitmask layout is Spark's own by construction — values must MATCH
    // the exact plane's exactly
    val gidSql = """SELECT l_returnflag, GROUPING(l_returnflag) AS g,
                           grouping_id() AS gid, count(*) AS n
                    FROM lineitem GROUP BY ROLLUP(l_returnflag)""".stripMargin
    val gidExact = session(aqp = false).sql(gidSql).collect()
      .map(r => (if (r.isNullAt(0)) "␀" else r.getString(0)) ->
        (r.getByte(1), r.getLong(2))).toMap
    val gidDf = session(aqp = true).sql(gidSql)
    assert(isRewritten(gidDf),
      s"GROUPING()/grouping_id() must fold:\n${gidDf.queryExecution.optimizedPlan}")
    val gidEst = gidDf.collect()
      .map(r => (if (r.isNullAt(0)) "␀" else r.getString(0)) ->
        (r.getByte(1), r.getLong(2))).toMap
    assert(gidEst == gidExact,
      s"grouping-id bitmasks must match exact: $gidEst vs $gidExact")
    // HAVING over GROUPING composes. The optimizer pushes the gid-only
    // condition BELOW the Aggregate (Filter between Aggregate and Expand);
    // the rewrite evaluates it per grouping set and folds the survivors
    val havingG = session(aqp = true).sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         GROUP BY ROLLUP(l_returnflag) HAVING GROUPING(l_returnflag) = 0""".stripMargin)
    assert(isRewritten(havingG),
      s"HAVING GROUPING must fold:\n${havingG.queryExecution.optimizedPlan}")
    assert(havingG.collect().forall(!_.isNullAt(0)),
      "HAVING GROUPING()=0 must drop the total row")
    // raw grouping_id() in the HAVING: same pushed-down shape, and the
    // surviving row set must MATCH the exact plane's (set selection is by
    // Spark's own per-projection gid literal, so it cannot drift)
    val havingGid = """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
                       GROUP BY ROLLUP(l_returnflag, l_linestatus)
                       HAVING grouping_id() = 0""".stripMargin
    val gidHavingExact = session(aqp = false).sql(havingGid).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val gidHavingDf = session(aqp = true).sql(havingGid)
    assert(isRewritten(gidHavingDf),
      s"HAVING grouping_id() must fold:\n${gidHavingDf.queryExecution.optimizedPlan}")
    assert(gidHavingDf.collect().map(r => (r.getString(0), r.getString(1))).toSet
      == gidHavingExact, "HAVING grouping_id()=0 must keep exactly the finest sets")
    // a HAVING that ALSO filters on a data aggregate splits: the aggregate
    // half stays ABOVE the fold (filters the LocalRelation rows), the
    // gid-only half folds — the composition must still rewrite
    val mixed = session(aqp = true).sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         GROUP BY ROLLUP(l_returnflag)
         HAVING GROUPING(l_returnflag) = 0 AND count(*) > 0""".stripMargin)
    assert(isRewritten(mixed),
      s"mixed HAVING (gid + aggregate) must fold:\n${mixed.queryExecution.optimizedPlan}")
    assert(mixed.collect().forall(!_.isNullAt(0)))
    // HAVING over a grouping ATTRIBUTE: the atom joins the estimation of
    // every set grouping by it; the sets that NULL it (here the () total)
    // are dropped — SQL filters all of that projection's rows out
    val havingAttr = """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
                        GROUP BY ROLLUP(l_returnflag, l_linestatus)
                        HAVING l_returnflag = 'A'""".stripMargin
    val haExact = session(aqp = false).sql(havingAttr).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) "␀" else r.getString(1)) ->
        r.getLong(2).toDouble).toMap
    val haDf = session(aqp = true).sql(havingAttr)
    assert(isRewritten(haDf),
      s"HAVING over a grouping attr must fold:\n${haDf.queryExecution.optimizedPlan}")
    val haEst = haDf.collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) "␀" else r.getString(1)) ->
        r.getLong(2).toDouble).toMap
    assert(haEst.keySet == haExact.keySet,
      s"attr-HAVING keys ${haEst.keySet} vs exact ${haExact.keySet}")
    haExact.foreach { case (k, v) =>
      assert(qerr(haEst(k), v) <= 1.5, s"attr-HAVING $k: ${haEst(k)} vs $v")
    }
    // attr + gid conjuncts together: only the finest set's 'A' rows survive
    val haBoth = session(aqp = true).sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
         GROUP BY ROLLUP(l_returnflag, l_linestatus)
         HAVING l_returnflag = 'A' AND GROUPING(l_linestatus) = 0""".stripMargin)
    assert(isRewritten(haBoth), "attr + gid HAVING must fold")
    val bothRows = haBoth.collect()
    assert(bothRows.nonEmpty &&
      bothRows.forall(r => r.getString(0) == "A" && !r.isNullAt(1)))
    // a HAVING over a DATA column's aggregate input can't fold per set
    val haData = session(aqp = true).sql(
      """SELECT l_returnflag, count(*) AS n, stddev(l_quantity) AS sq FROM lineitem
         GROUP BY ROLLUP(l_returnflag) HAVING stddev(l_quantity) > 0""".stripMargin)
    assert(!isRewritten(haData), "STDDEV keeps the grouping-sets query exact")
    // disjunctive predicates compose with grouping sets: every set routes
    // through the same OR machinery the flat GROUP BY uses (round 11's
    // shared scalarVals/groupRows dispatch)
    val orCases = Seq(
      """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
         WHERE l_quantity < 5 OR l_quantity > 45
         GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         WHERE (l_quantity < 5 OR l_quantity > 45)
           AND (l_discount < 0.02 OR l_discount > 0.08)
         GROUP BY ROLLUP(l_returnflag)""".stripMargin)
    orCases.foreach { sql =>
      def keyedN(df: org.apache.spark.sql.DataFrame): Map[Seq[String], Double] =
        df.collect().map { r =>
          (0 until r.length - 1).map(i =>
            if (r.isNullAt(i)) "␀" else r.getString(i)) -> r.getLong(r.length - 1).toDouble
        }.toMap
      val exactM = keyedN(session(aqp = false).sql(sql))
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df),
        s"ROLLUP + OR must fold for [$sql]:\n${df.queryExecution.optimizedPlan}")
      val estM = keyedN(df)
      assert(estM.keySet == exactM.keySet,
        s"ROLLUP+OR keys for [$sql]: ${estM.keySet} vs ${exactM.keySet}")
      exactM.foreach { case (k, v) =>
        assert(qerr(math.max(estM(k), 1.0), math.max(v, 1.0)) <= 1.5,
          s"ROLLUP+OR $k for [$sql]: ${estM(k)} vs $v")
      }
    }
  }

  test("the answerable-class matrix folds: filters × aggregates × groupings") {
    // cross-product regression net: every filter shape must compose with
    // every aggregate shape under every grouping shape — the individual
    // specs pin each path, THIS pins their interactions (two-OR × avg-expr
    // × ROLLUP exercises code no single-feature test reaches). Filters are
    // chosen selective-but-not-tiny so no slice is empty and q-error
    // bounds stay meaningful.
    val filters = Seq(
      "" -> "none",
      "WHERE l_quantity < 30" -> "conj",
      "WHERE l_returnflag LIKE '%A%' AND l_quantity < 30" -> "like",
      "WHERE l_returnflag != 'N'" -> "neq",
      "WHERE l_quantity < 10 OR l_quantity > 40" -> "or1",
      """WHERE (l_quantity < 10 OR l_quantity > 40)
           AND (l_discount < 0.03 OR l_discount > 0.07)""" -> "or2",
      "WHERE l_quantity != 24" -> "numneq",
      "WHERE l_quantity NOT IN (5, 10, 15)" -> "numnotin",
      "WHERE l_quantity < 10 OR l_quantity BETWEEN 40 AND 45" -> "rangeunion",
      """WHERE (l_quantity < 10 OR l_quantity > 40)
           AND (l_discount < 0.03 OR l_discount > 0.07)
           AND (l_tax < 0.02 OR l_tax > 0.06)""" -> "or3",
      // r18: one 3-branch mixed-column disjunction (7 signed IE terms)
      "WHERE l_quantity < 8 OR l_discount > 0.08 OR l_tax < 0.01" -> "orb3",
      // r18: disjunction of CONJUNCTIONS — the TPC-H Q19 predicate shape
      """WHERE l_quantity < 10 AND l_returnflag = 'A'
           OR l_quantity > 40 AND l_linestatus = 'F'
           OR l_discount > 0.08 AND l_tax < 0.03""" -> "orconj")
    val aggs = Seq(
      "count(*)" -> "cnt",
      "count(l_extendedprice)" -> "cntcol",
      "count(DISTINCT l_linestatus)" -> "cntd",
      "sum(l_extendedprice)" -> "sum",
      "sum(l_extendedprice * (1 - l_discount))" -> "sumexpr",
      "avg(l_extendedprice)" -> "avg",
      "avg(l_extendedprice * (1 - l_discount))" -> "avgexpr",
      "sum(l_quantity) - count(*)" -> "arith",
      "count(*) FILTER (WHERE l_linestatus = 'F')" -> "cntf")
    val groupings = Seq(
      "" -> "scalar",
      "GROUP BY l_returnflag" -> "grouped",
      "GROUP BY ROLLUP(l_returnflag)" -> "rollup")
    var checked = 0
    for {
      (fSql, fTag) <- filters
      (aSql, aTag) <- aggs
      (gSql, gTag) <- groupings
    } {
      val sel = if (gTag == "scalar") s"$aSql AS v" else s"l_returnflag, $aSql AS v"
      val sql = s"SELECT $sel FROM lineitem $fSql $gSql"
      val tag = s"$fTag×$aTag×$gTag"
      def keyed(rows: Array[org.apache.spark.sql.Row]): Map[String, Double] =
        rows.map { r =>
          val k = if (gTag == "scalar") "" else if (r.isNullAt(0)) "␀" else r.getString(0)
          val iv = if (gTag == "scalar") 0 else 1
          k -> (r.get(iv) match {
            case n: Number => n.doubleValue()
            case other     => fail(s"[$tag] non-numeric cell $other")
          })
        }.toMap
      val exact = keyed(session(aqp = false).sql(sql).collect())
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df),
        s"[$tag] must fold:\n${df.queryExecution.optimizedPlan}")
      val est = keyed(df.collect())
      assert(est.keySet == exact.keySet,
        s"[$tag] keys ${est.keySet} vs ${exact.keySet}")
      exact.foreach { case (k, v) =>
        // arith can legitimately cross zero — compare by absolute error
        // scaled to the exact magnitude there; everything else by q-error
        val ok =
          if (aTag == "arith") math.abs(est(k) - v) <= 0.5 * math.max(math.abs(v), 1000.0)
          else qerr(math.max(est(k), 1e-9), math.max(v, 1e-9)) <= 2.0
        assert(ok, s"[$tag] group '$k': est ${est(k)} vs exact $v")
      }
      checked += 1
    }
    info(s"$checked matrix cells folded within bounds")
    assert(checked == filters.length * aggs.length * groupings.length)
  }

  test("n-branch disjunctions fold up to the signed-term-product cap (r18)") {
    // Π_g (2^{k_g}−1) ≤ 27: a 4-branch group (15 terms) and a 3×2 layout
    // (21) fold; a 5-branch group (31), two 3-branch groups (49) and four
    // 2-branch groups (81) fall back to exact — the generalized r17 cap.
    val folds = Seq(
      // 4 branches, 15 terms
      """SELECT count(*) AS n FROM lineitem
         WHERE l_quantity < 3 OR l_discount > 0.09 OR l_returnflag = 'R' OR l_tax < 0.01""",
      // 3-branch × 2-branch, 21 terms, grouped
      """SELECT l_returnflag, count(*) AS n, avg(l_extendedprice) AS a FROM lineitem
         WHERE (l_quantity < 10 OR l_discount > 0.07 OR l_tax < 0.02)
           AND (l_linestatus = 'F' OR l_tax > 0.05)
         GROUP BY l_returnflag""")
    folds.foreach { sql =>
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df), s"must fold [$sql]:\n${df.queryExecution.optimizedPlan}")
      val est = df.collect()
      val exact = session(aqp = false).sql(sql).collect()
      assert(est.length == exact.length, s"rows for [$sql]")
      // first-position count parity (scalar) / per-key count parity (grouped)
      val estN = est.map(r => (if (r.schema.head.name == "n") "" else r.getString(0)) ->
        r.getLong(r.fieldIndex("n")).toDouble).toMap
      val exactN = exact.map(r => (if (r.schema.head.name == "n") "" else r.getString(0)) ->
        r.getLong(r.fieldIndex("n")).toDouble).toMap
      exactN.foreach { case (k, v) =>
        assert(qerr(math.max(estN(k), 1.0), math.max(v, 1.0)) <= 1.5,
          s"[$sql] key '$k': ${estN(k)} vs $v")
      }
    }
    val fallbacks = Seq(
      """SELECT count(*) AS n FROM lineitem
         WHERE l_quantity < 3 OR l_discount > 0.09 OR l_returnflag = 'R'
            OR l_tax < 0.01 OR l_extendedprice > 90000""",
      """SELECT count(*) AS n FROM lineitem
         WHERE (l_quantity < 10 OR l_discount > 0.07 OR l_returnflag = 'R')
           AND (l_linestatus = 'F' OR l_tax > 0.05 OR l_extendedprice > 80000)""",
      """SELECT count(*) AS n FROM lineitem
         WHERE (l_quantity < 10 OR l_tax > 0.07)
           AND (l_returnflag = 'A' OR l_linestatus = 'O')
           AND (l_discount < 0.02 OR l_tax > 0.06)
           AND (l_extendedprice < 2000 OR l_quantity > 45)""")
    fallbacks.foreach { sql =>
      val df = session(aqp = true).sql(sql)
      assert(!isRewritten(df), s"past the cap must stay exact [$sql]")
      // and the exact answer flows through untouched
      assert(df.head.getLong(0) == session(aqp = false).sql(sql).head.getLong(0))
    }
  }

  test("SUM/AVG over an (estimated) empty selection fold to SQL's NULL, not 0.0") {
    // l_quantity is 1..50 in the fixture: the model's count estimate for
    // an impossible range rounds to zero, and SQL's empty SUM/AVG is NULL
    val sql = """SELECT count(*) AS n, sum(l_extendedprice) AS s,
                        avg(l_extendedprice) AS a
                 FROM lineitem WHERE l_quantity < -5""".stripMargin
    val exact = session(aqp = false).sql(sql).head
    assert(exact.getLong(0) == 0L && exact.isNullAt(1) && exact.isNullAt(2),
      "fixture sanity: the slice must be empty")
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"empty slice must still fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.head
    assert(est.getLong(0) == 0L, s"count over empty slice: ${est.getLong(0)}")
    assert(est.isNullAt(1), "SUM over an empty selection must be NULL")
    assert(est.isNullAt(2), "AVG over an empty selection must be NULL")
  }

  test("NULL-bearing columns fold with SQL's skip-NULL semantics") {
    // a sidecar-declared table where a THIRD of the measure column is NULL:
    // SUM skips those rows, AVG divides by the non-null count, COUNT(col)
    // counts non-nulls — a fold that forgot the NotNull gating would
    // overcount AVG's denominator by 1.5x (qerr 1.5, well outside the gate)
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft-aqp-nulls-").toString
    spark.range(3000).toDF("visit_id")
      .withColumn("amount",
        when(pmod(col("visit_id"), lit(3)) === 0, lit(null).cast("double"))
          .otherwise(pmod(col("visit_id") * 17, lit(100)).cast("double")))
      .withColumn("seg",
        element_at(array(lit("a"), lit("b")), (pmod(col("visit_id"), lit(2)) + 1).cast("int")))
      .write.parquet(s"$d/visits.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/graft_schema.json"),
      """{"tables": [{"name": "visits", "primaryKey": ["visit_id"]}],
        | "modeled": {"visits": [{"col": "amount", "kind": "num"},
        |                        {"col": "seg", "kind": "cat"}]}}""".stripMargin)
    rspn.Ensemble.get(spark, d)
    schema.Tables(spark, d, "visits").unpersist(blocking = true)
    def sess(aqp: Boolean): SparkSession = {
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      if (aqp) s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/visits.parquet").createOrReplaceTempView("visits")
      s2
    }
    val sql = """SELECT count(*) AS n, count(amount) AS nc,
                        sum(amount) AS s, avg(amount) AS a
                 FROM visits WHERE seg = 'a'""".stripMargin
    val exact = sess(aqp = false).sql(sql).head
    val df = sess(aqp = true).sql(sql)
    assert(isRewritten(df), s"null fixture must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.head
    assert(qerr(est.getLong(0).toDouble, exact.getLong(0).toDouble) <= 1.2, "count(*)")
    assert(qerr(est.getLong(1).toDouble, exact.getLong(1).toDouble) <= 1.2,
      s"count(amount) est ${est.getLong(1)} vs exact ${exact.getLong(1)} — non-null gating lost")
    assert(qerr(est.getDouble(2), exact.getDouble(2)) <= 1.2,
      s"sum est ${est.getDouble(2)} vs exact ${exact.getDouble(2)}")
    assert(qerr(est.getDouble(3), exact.getDouble(3)) <= 1.2,
      s"avg est ${est.getDouble(3)} vs exact ${exact.getDouble(3)} — denominator counted NULLs")
  }

  test("a group whose aggregate column is all-NULL folds to per-group NULL, not 0.0") {
    // seg 'c' rows carry ONLY NULL amounts: exact SQL emits the group with
    // SUM/AVG = NULL; the fold must apply the same count-gated NULL the
    // scalar path uses — per group, on BOTH the conjunctive and the OR path
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft-aqp-nullgrp-").toString
    spark.range(3000).toDF("visit_id")
      .withColumn("seg",
        element_at(array(lit("a"), lit("b"), lit("c")),
          (pmod(col("visit_id"), lit(3)) + 1).cast("int")))
      .withColumn("amount",
        when(col("seg") === "c", lit(null).cast("double"))
          .otherwise(pmod(col("visit_id") * 17, lit(100)).cast("double")))
      .withColumn("x", pmod(col("visit_id"), lit(100)).cast("double"))
      .withColumn("flag",
        when(pmod(col("visit_id"), lit(5)) === 0, lit(null).cast("string"))
          .otherwise(element_at(array(lit("u"), lit("v")),
            (pmod(col("visit_id"), lit(2)) + 1).cast("int"))))
      .write.parquet(s"$d/visits.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/graft_schema.json"),
      """{"tables": [{"name": "visits", "primaryKey": ["visit_id"]}],
        | "modeled": {"visits": [{"col": "amount", "kind": "num"},
        |                        {"col": "x", "kind": "num"},
        |                        {"col": "seg", "kind": "cat"},
        |                        {"col": "flag", "kind": "cat"}]}}""".stripMargin)
    rspn.Ensemble.get(spark, d)
    schema.Tables(spark, d, "visits").unpersist(blocking = true)
    def sess(aqp: Boolean): SparkSession = {
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      if (aqp) s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/visits.parquet").createOrReplaceTempView("visits")
      s2
    }
    def checkNullGroup(sql: String): Unit = {
      val exact = sess(aqp = false).sql(sql).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(exact.contains("c") && exact("c").isNullAt(2) && exact("c").isNullAt(3),
        s"fixture sanity: exact plane must emit seg c with NULL sum/avg for [$sql]")
      val df = sess(aqp = true).sql(sql)
      assert(isRewritten(df), s"must fold:\n${df.queryExecution.optimizedPlan}")
      val est = df.collect().map(r => r.getString(0) -> r).toMap
      assert(est.keySet == exact.keySet, s"group keys ${est.keySet} vs ${exact.keySet}")
      assert(est("c").isNullAt(2), s"seg c SUM must fold to NULL for [$sql]")
      assert(est("c").isNullAt(3), s"seg c AVG must fold to NULL for [$sql]")
      Seq("a", "b").foreach { k =>
        assert(!est(k).isNullAt(2) &&
          qerr(est(k).getDouble(2), exact(k).getDouble(2)) <= 1.3, s"seg $k sum for [$sql]")
      }
    }
    // conjunctive grouped path
    checkNullGroup(
      """SELECT seg, count(*) AS n, sum(amount) AS s, avg(amount) AS a
         FROM visits GROUP BY seg""".stripMargin)
    // single-OR grouped path (per-group inclusion-exclusion)
    checkNullGroup(
      """SELECT seg, count(*) AS n, sum(amount) AS s, avg(amount) AS a
         FROM visits WHERE x < 20 OR x > 80 GROUP BY seg""".stripMargin)
    // COUNT over a DICTIONARY (cat) column: gates on 1−pNull of the
    // categorical leaf — a fifth of `flag` is NULL, so an ungated fold
    // would overcount by 1.25x (outside the 1.2 gate by construction)
    val catSql = "SELECT count(*) AS n, count(flag) AS nf FROM visits"
    val catExact = sess(aqp = false).sql(catSql).head
    val catDf = sess(aqp = true).sql(catSql)
    assert(isRewritten(catDf),
      s"count(cat) must fold:\n${catDf.queryExecution.optimizedPlan}")
    val catEst = catDf.head
    assert(catExact.getLong(1) < catExact.getLong(0), "fixture sanity: flag has NULLs")
    assert(qerr(catEst.getLong(1).toDouble, catExact.getLong(1).toDouble) <= 1.2,
      s"count(flag): est ${catEst.getLong(1)} vs exact ${catExact.getLong(1)}")
  }

  test("the transparent plane agrees with the SQL-text estimator on the AQP workload") {
    // two independent routes to the model — the Catalyst rewrite and the
    // SqlParser/SqlEstimate text plane — must produce the same numbers for
    // the same committed benchmark queries, or one of them has drifted
    val qs = QErrorEval.readWorkload("workloads/testdata_aqp_20.sql")
    val ens = rspn.Ensemble.get(spark, tmpSf)
    val s2 = session(aqp = true)
    var folded = 0
    qs.foreach { case (no, sql0) =>
      val sql = sql0.stripSuffix(";")
      val df = s2.sql(sql)
      if (isRewritten(df)) {
        folded += 1
        val viaText = rspn.SqlEstimate.estimate(ens, sql) match {
          case rspn.SqlEstimate.Scalar(e) => e.value
          case other                      => fail(s"q$no unexpected shape $other")
        }
        val viaRule = df.head.getDouble(0)
        assert(math.abs(viaRule - viaText) <= math.max(1e-6 * math.abs(viaText), 1e-6),
          s"q$no planes disagree: rule $viaRule vs text $viaText for [$sql]")
      }
    }
    info(s"$folded/${qs.length} workload queries folded through the rule")
    assert(folded >= 15, s"only $folded/${qs.length} AQP workload queries folded")
  }

  test("the round-11 shapes agree across planes: rule fold == text estimate, per query") {
    // negations, LIKE closure, COUNT(DISTINCT): two independent routes to
    // the model (Catalyst rewrite vs SqlParser/SqlEstimate) must produce
    // identical numbers for every query in the committed r11 workload —
    // and every one must actually FOLD (a fallback here means the rule
    // plane lost a shape the text plane kept)
    val qs = QErrorEval.readWorkload("workloads/testdata_aqp_r11.sql")
    val ens = rspn.Ensemble.get(spark, tmpSf)
    val s2 = session(aqp = true)
    qs.foreach { case (no, sql0) =>
      val sql = sql0.stripSuffix(";")
      val df = s2.sql(sql)
      assert(isRewritten(df),
        s"r11 workload q$no must fold:\n${df.queryExecution.optimizedPlan}")
      val viaText = rspn.SqlEstimate.estimate(ens, sql) match {
        case rspn.SqlEstimate.Scalar(e) => e.value
        case other                      => fail(s"q$no unexpected shape $other")
      }
      val viaRule = df.head.get(0) match {
        case n: Number => n.doubleValue()
        case other     => fail(s"q$no non-numeric fold $other")
      }
      // counts round to BIGINT on the rule plane; compare at that grain
      assert(math.abs(viaRule - viaText) <= math.max(1e-6 * math.abs(viaText), 0.5),
        s"q$no planes disagree: rule $viaRule vs text $viaText for [$sql]")
    }
  }

  test("LIKE on a modeled cat column folds by dictionary closure") {
    // round 10: StartsWith/EndsWith/Contains/Like atoms compile to the
    // dictionary-code NominalSet exactly as the SQL-text plane does — the
    // pattern's member set is EXACT (the dict is the complete domain), so
    // the only error left is the model's selectivity error
    val cases = Seq(
      // LikeSimplification → StartsWith
      "SELECT count(*) AS n FROM orders WHERE o_orderpriority LIKE '1%'",
      // → Contains
      "SELECT count(*) AS n FROM orders WHERE o_orderpriority LIKE '%URGENT%'",
      // → EndsWith
      "SELECT count(*) AS n FROM lineitem WHERE l_returnflag LIKE '%A'",
      // multi-wildcard: survives as a raw Like expression
      "SELECT count(*) AS n FROM orders WHERE o_orderpriority LIKE '%-%G%'",
      // combined with a numeric range, under a join
      """SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority LIKE '1%' AND l_quantity < 24""".stripMargin)
    cases.foreach { sql =>
      val exact = session(aqp = false).sql(sql).head.getLong(0).toDouble
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df), s"LIKE must fold for [$sql]:\n${df.queryExecution.optimizedPlan}")
      val est = df.head.getLong(0).toDouble
      assert(qerr(math.max(est, 1.0), math.max(exact, 1.0)) <= 1.5,
        s"LIKE fold q-error for [$sql]: est $est vs exact $exact")
    }
  }

  test("renamed columns in derived tables resolve to their source and fold") {
    // views/CTEs rename constantly: the rewrite tracks each alias back to
    // its (table, scan column), so filters, grouping, aggregates and the
    // FK-join check all see the modeled column behind the new name
    val sql = """SELECT flag, count(*) AS n, sum(q) AS s, avg(price) AS a
                 FROM (SELECT l_returnflag AS flag, l_quantity AS q,
                              l_extendedprice AS price FROM lineitem) t
                 WHERE q < 24 GROUP BY flag""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getString(0) -> (r.getLong(1).toDouble, r.getDouble(2))).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df),
      s"renamed derived table must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1).toDouble, r.getDouble(2))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, (en, es)) =>
      assert(qerr(est(k)._1, en) <= 1.5, s"renamed group $k count: ${est(k)._1} vs $en")
      assert(qerr(est(k)._2, es) <= 1.5, s"renamed group $k sum: ${est(k)._2} vs $es")
    }
    // renamed FK keys still satisfy the declared-edge check through a join
    val joinSql = """SELECT count(*) AS n FROM
                      (SELECT l_orderkey AS lk, l_quantity AS q FROM lineitem) l
                      JOIN (SELECT o_orderkey AS ok, o_totalprice FROM orders) o
                        ON lk = ok
                     WHERE o_totalprice < 2000""".stripMargin
    val jExact = session(aqp = false).sql(joinSql).head.getLong(0).toDouble
    val jDf = session(aqp = true).sql(joinSql)
    assert(isRewritten(jDf),
      s"renamed FK join must fold:\n${jDf.queryExecution.optimizedPlan}")
    assert(qerr(jDf.head.getLong(0).toDouble, jExact) <= 2.0)
    // a COMPUTED alias is not a rename — still falls back
    val computed = session(aqp = true).sql(
      """SELECT count(*) AS n FROM
          (SELECT l_quantity * 2 AS q2 FROM lineitem) t WHERE q2 < 48""".stripMargin)
    assert(!isRewritten(computed), "computed-column aliases must fall back to exact")
    // ROLLUP over a renamed column: classifySlots resolves the grouping
    // slot through the alias to the modeled source
    val rolledSql = """SELECT flag, count(*) AS n FROM
                        (SELECT l_returnflag AS flag FROM lineitem) t
                       GROUP BY ROLLUP(flag)""".stripMargin
    val rExact = session(aqp = false).sql(rolledSql).collect()
      .map(r => (if (r.isNullAt(0)) "␀" else r.getString(0)) -> r.getLong(1).toDouble).toMap
    val rDf = session(aqp = true).sql(rolledSql)
    assert(isRewritten(rDf),
      s"ROLLUP over a rename must fold:\n${rDf.queryExecution.optimizedPlan}")
    val rEst = rDf.collect()
      .map(r => (if (r.isNullAt(0)) "␀" else r.getString(0)) -> r.getLong(1).toDouble).toMap
    assert(rEst.keySet == rExact.keySet)
    rExact.foreach { case (k, v) => assert(qerr(rEst(k), v) <= 1.5, s"rolled rename $k") }
    // a negated atom INSIDE an OR branch: the branch compiler routes the
    // complement through the same dictionary closure
    val negOrSql = """SELECT count(*) AS n FROM lineitem
                      WHERE l_returnflag != 'N' OR l_quantity < 3""".stripMargin
    val noExact = session(aqp = false).sql(negOrSql).head.getLong(0).toDouble
    val noDf = session(aqp = true).sql(negOrSql)
    assert(isRewritten(noDf),
      s"negation inside OR must fold:\n${noDf.queryExecution.optimizedPlan}")
    assert(qerr(noDf.head.getLong(0).toDouble, noExact) <= 1.5)
  }

  test("negated predicates on dictionary columns fold by complement; numeric != by disjoint ranges") {
    // != / NOT IN / NOT LIKE close over the dictionary COMPLEMENT — no
    // NULL mass, matching SQL's unknown-on-NULL semantics
    val cases = Seq(
      "SELECT count(*) AS n FROM lineitem WHERE l_returnflag != 'A'",
      "SELECT count(*) AS n FROM lineitem WHERE l_returnflag NOT IN ('A', 'R')",
      "SELECT count(*) AS n FROM orders WHERE o_orderpriority NOT LIKE '1%'",
      // combined with a range and under GROUP BY
      """SELECT l_linestatus, count(*) AS n FROM lineitem
         WHERE l_returnflag != 'N' AND l_quantity < 24
         GROUP BY l_linestatus""".stripMargin)
    cases.foreach { sql =>
      val exact = session(aqp = false).sql(sql).collect()
        .map(r => (0 until r.length - 1).map(r.get(_).toString) -> r.getLong(r.length - 1).toDouble).toMap
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df),
        s"negated cat predicate must fold for [$sql]:\n${df.queryExecution.optimizedPlan}")
      val est = df.collect()
        .map(r => (0 until r.length - 1).map(r.get(_).toString) -> r.getLong(r.length - 1).toDouble).toMap
      assert(est.keySet == exact.keySet, s"keys for [$sql]: ${est.keySet} vs ${exact.keySet}")
      exact.foreach { case (k, v) =>
        assert(qerr(math.max(est(k), 1.0), math.max(v, 1.0)) <= 1.5,
          s"complement fold for [$sql] key $k: ${est(k)} vs $v")
      }
    }
    // numeric != compiles to the multi-interval complement (-∞,v)∪(v,∞) —
    // ONE plain atom (reference ranges.py::NumericRange parity), exact and
    // costing no disjunction slot — scalar, grouped, and composed with a
    // dictionary complement
    val neCases = Seq(
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity != 24",
      """SELECT l_linestatus, count(*) AS n FROM lineitem
         WHERE l_quantity != 24 AND l_returnflag != 'A'
         GROUP BY l_linestatus""".stripMargin)
    neCases.foreach { sql =>
      val exact = session(aqp = false).sql(sql).collect()
        .map(r => (0 until r.length - 1).map(r.get(_).toString) -> r.getLong(r.length - 1).toDouble).toMap
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df),
        s"numeric != must fold via disjoint ranges for [$sql]:\n${df.queryExecution.optimizedPlan}")
      val est = df.collect()
        .map(r => (0 until r.length - 1).map(r.get(_).toString) -> r.getLong(r.length - 1).toDouble).toMap
      assert(est.keySet == exact.keySet, s"keys for [$sql]: ${est.keySet} vs ${exact.keySet}")
      exact.foreach { case (k, v) =>
        assert(qerr(est(k), v) <= 1.5, s"numeric != fold for [$sql] key $k: ${est(k)} vs $v")
      }
    }
  }

  test("COUNT(DISTINCT cat) folds by dictionary-support enumeration, exact on every path") {
    // the dictionary is the column's complete domain, so the distinct set
    // under a predicate is the nonzero-mass enumeration — the SQL-text
    // plane's CountDistinct convention in the Catalyst rule. The fixture
    // slices keep every member's mass far from the pruning threshold, so
    // the fold should match exact EXACTLY here
    val cases = Seq(
      // conjunctive scalar
      "SELECT count(DISTINCT l_returnflag) AS n FROM lineitem WHERE l_quantity < 24",
      // grouped
      """SELECT l_returnflag, count(DISTINCT l_linestatus) AS n
         FROM lineitem GROUP BY l_returnflag""".stripMargin,
      // single OR (support sets union across branches)
      """SELECT count(DISTINCT l_linestatus) AS n FROM lineitem
         WHERE l_quantity < 5 OR l_quantity > 45""".stripMargin,
      // two ORs (union over the 4 positive branch combos)
      """SELECT count(DISTINCT l_returnflag) AS n FROM lineitem
         WHERE (l_quantity < 5 OR l_quantity > 45)
           AND (l_discount < 0.02 OR l_discount > 0.08)""".stripMargin,
      // grouping sets: per-set distinct via the same enumeration
      """SELECT l_returnflag, count(DISTINCT l_linestatus) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag)""".stripMargin,
      // through a declared FK join: the enumeration runs over the join model
      """SELECT count(DISTINCT o_orderpriority) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_quantity < 10""".stripMargin)
    cases.foreach { sql =>
      val exact = session(aqp = false).sql(sql).collect()
        .map(r => (0 until r.length - 1).map(i =>
          if (r.isNullAt(i)) "␀" else r.get(i).toString) -> r.getLong(r.length - 1)).toMap
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df),
        s"count(DISTINCT cat) must fold for [$sql]:\n${df.queryExecution.optimizedPlan}")
      val est = df.collect()
        .map(r => (0 until r.length - 1).map(i =>
          if (r.isNullAt(i)) "␀" else r.get(i).toString) -> r.getLong(r.length - 1)).toMap
      assert(est == exact, s"distinct sets must match exact for [$sql]: $est vs $exact")
    }
    // approx_count_distinct asked for an approximation — the support
    // enumeration answers it (typically exactly, beating HLL)
    val approxSql =
      "SELECT approx_count_distinct(l_returnflag) AS n FROM lineitem WHERE l_quantity < 24"
    val approxDf = session(aqp = true).sql(approxSql)
    assert(isRewritten(approxDf),
      s"approx_count_distinct(cat) must fold:\n${approxDf.queryExecution.optimizedPlan}")
    assert(approxDf.head.getLong(0) ==
      session(aqp = false).sql(
        "SELECT count(DISTINCT l_returnflag) AS n FROM lineitem WHERE l_quantity < 24")
        .head.getLong(0),
      "approx distinct must equal the support enumeration")
    // numeric distinct folds via the bounded realized support (see the
    // realized-domain test); a NEAR-CONTINUOUS column exceeds the cap —
    // its sampled support is neither cheap nor a faithful distinct count
    val numDistinct = session(aqp = true).sql(
      "SELECT count(DISTINCT l_extendedprice) AS n FROM lineitem")
    assert(!isRewritten(numDistinct),
      "count(DISTINCT near-continuous) must fall back past the support cap")
  }

  test("MIN/MAX on dictionary columns fold by support-enumeration extremes") {
    // the surviving dictionary support under the predicates IS the value
    // set, so MIN/MAX is its lexicographic extreme — exact whenever the
    // model's nonzero-mass support matches the realized one. Scalar,
    // grouped, under a disjunction, and per grouping set.
    val cases = Seq(
      """SELECT min(l_returnflag) AS mn, max(l_returnflag) AS mx
         FROM lineitem WHERE l_quantity < 30""".stripMargin,
      """SELECT l_linestatus, min(l_returnflag) AS mn, max(l_returnflag) AS mx
         FROM lineitem WHERE l_quantity < 30 GROUP BY l_linestatus""".stripMargin,
      """SELECT min(l_returnflag) AS mn, max(l_returnflag) AS mx
         FROM lineitem WHERE l_quantity < 5 OR l_quantity > 45""".stripMargin,
      """SELECT l_linestatus, min(l_returnflag) AS mn
         FROM lineitem GROUP BY ROLLUP(l_linestatus)""".stripMargin)
    cases.foreach { sql =>
      val exact = session(aqp = false).sql(sql).collect()
        .map(_.toSeq.map(v => if (v == null) "␀" else v.toString)).toSet
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df),
        s"dictionary MIN/MAX must fold for [$sql]:\n${df.queryExecution.optimizedPlan}")
      val est = df.collect()
        .map(_.toSeq.map(v => if (v == null) "␀" else v.toString)).toSet
      assert(est == exact, s"MIN/MAX rows for [$sql]: $est vs $exact")
    }
    // a MIN leaf is a string — it cannot ride aggregate arithmetic
    val arith = session(aqp = true).sql(
      "SELECT min(l_returnflag) || 'x' AS v FROM lineitem")
    assert(!isRewritten(arith), "MIN inside an expression must fall back")
    // empty selection: SQL's MIN over no rows is NULL on both planes
    val empty = session(aqp = true).sql(
      "SELECT min(l_returnflag) AS mn FROM lineitem WHERE l_quantity < -5")
    assert(isRewritten(empty), "empty-slice MIN must still fold")
    assert(empty.head.isNullAt(0), "MIN over an empty selection must be NULL")
  }

  test("numeric MIN/MAX and COUNT(DISTINCT num) fold via realized-value support") {
    // NumericLeaf stores the sorted realized values of the training slice,
    // so the extreme under a predicate is the first/last in-range value
    // with mass, and a bounded support enumerates like the dictionary path.
    // At sf0.001 the sample IS the full table, so same-column-predicate
    // shapes are exact; cross-column shapes carry cluster-independence
    // noise and get distance slack.
    //
    // 1. scalar, same-column predicate: exact on the realized domain
    val sql1 = """SELECT min(l_quantity) AS mn, max(l_quantity) AS mx,
                         count(DISTINCT l_quantity) AS nd
                  FROM lineitem WHERE l_quantity BETWEEN 10 AND 30""".stripMargin
    val ex1 = session(aqp = false).sql(sql1).head
    val df1 = session(aqp = true).sql(sql1)
    assert(isRewritten(df1), s"numeric MIN/MAX must fold:\n${df1.queryExecution.optimizedPlan}")
    val es1 = df1.head
    assert(es1.getDouble(0) == ex1.getDouble(0) && es1.getDouble(1) == ex1.getDouble(1),
      s"min/max: (${es1.getDouble(0)}, ${es1.getDouble(1)}) vs (${ex1.getDouble(0)}, ${ex1.getDouble(1)})")
    assert(math.abs(es1.getLong(2) - ex1.getLong(2)) <= 2,
      s"distinct: ${es1.getLong(2)} vs ${ex1.getLong(2)}")
    // 2. DATE extremes at day granularity: cast(ts AS date) equals the
    // model's own epoch-day encoding in the UTC session
    val sql2 = """SELECT min(cast(o_orderdate AS date)) AS mn,
                         max(cast(o_orderdate AS date)) AS mx FROM orders""".stripMargin
    val ex2 = session(aqp = false).sql(sql2).head
    val df2 = session(aqp = true).sql(sql2)
    assert(isRewritten(df2), s"date MIN/MAX must fold:\n${df2.queryExecution.optimizedPlan}")
    assert(df2.head.getDate(0).toString == ex2.getDate(0).toString &&
      df2.head.getDate(1).toString == ex2.getDate(1).toString,
      s"date extremes: ${df2.head.getDate(0)}/${df2.head.getDate(1)} vs ${ex2.getDate(0)}/${ex2.getDate(1)}")
    // 3. grouped: per-dictionary-group support
    val sql3 = """SELECT l_returnflag, min(l_quantity) AS mn, max(l_quantity) AS mx,
                         count(DISTINCT l_quantity) AS nd
                  FROM lineitem GROUP BY l_returnflag""".stripMargin
    val ex3 = session(aqp = false).sql(sql3).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val df3 = session(aqp = true).sql(sql3)
    assert(isRewritten(df3), s"grouped numeric MIN/MAX must fold:\n${df3.queryExecution.optimizedPlan}")
    val es3 = df3.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(es3.keySet == ex3.keySet, s"groups ${es3.keySet} vs ${ex3.keySet}")
    ex3.foreach { case (k, (mn, mx, nd)) =>
      assert(math.abs(es3(k)._1 - mn) <= 2 && math.abs(es3(k)._2 - mx) <= 2,
        s"group $k min/max: ${es3(k)} vs ($mn, $mx)")
      assert(math.abs(es3(k)._3 - nd) <= 3, s"group $k distinct: ${es3(k)._3} vs $nd")
    }
    // grouped DATE extreme: global-support noise is bounded by the per-
    // group date density (~9-day mean gap per priority at sf0.001)
    val sql3b = """SELECT o_orderpriority, max(cast(o_orderdate AS date)) AS mx
                   FROM orders GROUP BY o_orderpriority""".stripMargin
    val ex3b = session(aqp = false).sql(sql3b).collect()
      .map(r => r.getString(0) -> r.getDate(1).toLocalDate.toEpochDay).toMap
    val df3b = session(aqp = true).sql(sql3b)
    assert(isRewritten(df3b), s"grouped date MAX must fold:\n${df3b.queryExecution.optimizedPlan}")
    df3b.collect().foreach { r =>
      val est = r.getDate(1).toLocalDate.toEpochDay
      assert(math.abs(est - ex3b(r.getString(0))) <= 60,
        s"group ${r.getString(0)} max date: $est vs ${ex3b(r.getString(0))}")
    }
    // 4. disjunctions: branch supports union exactly (single OR, scalar +
    // grouped, and the multi-OR positive-combo union)
    val sql4 = """SELECT min(l_quantity) AS mn, max(l_quantity) AS mx
                  FROM lineitem WHERE l_quantity < 5 OR l_quantity > 45""".stripMargin
    val ex4 = session(aqp = false).sql(sql4).head
    val df4 = session(aqp = true).sql(sql4)
    assert(isRewritten(df4), s"OR MIN/MAX must fold:\n${df4.queryExecution.optimizedPlan}")
    assert(df4.head.getDouble(0) == ex4.getDouble(0) && df4.head.getDouble(1) == ex4.getDouble(1),
      s"OR min/max: ${df4.head.getDouble(0)}/${df4.head.getDouble(1)} vs ${ex4.getDouble(0)}/${ex4.getDouble(1)}")
    val sql4g = """SELECT l_returnflag, max(l_quantity) AS mx, count(DISTINCT l_quantity) AS nd
                   FROM lineitem WHERE l_quantity < 5 OR l_quantity > 45
                   GROUP BY l_returnflag""".stripMargin
    val ex4g = session(aqp = false).sql(sql4g).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val df4g = session(aqp = true).sql(sql4g)
    assert(isRewritten(df4g), s"grouped OR MIN/MAX must fold:\n${df4g.queryExecution.optimizedPlan}")
    df4g.collect().foreach { r =>
      val (mx, nd) = ex4g(r.getString(0))
      assert(math.abs(r.getDouble(1) - mx) <= 2, s"OR group max: ${r.getDouble(1)} vs $mx")
      assert(math.abs(r.getLong(2) - nd) <= 2, s"OR group distinct: ${r.getLong(2)} vs $nd")
    }
    val sql5 = """SELECT min(l_quantity) AS mn, count(DISTINCT l_quantity) AS nd
                  FROM lineitem
                  WHERE (l_quantity < 5 OR l_quantity > 45)
                    AND (l_discount < 0.03 OR l_discount > 0.07)""".stripMargin
    val ex5 = session(aqp = false).sql(sql5).head
    val df5 = session(aqp = true).sql(sql5)
    assert(isRewritten(df5), s"multi-OR numeric MIN must fold:\n${df5.queryExecution.optimizedPlan}")
    assert(math.abs(df5.head.getDouble(0) - ex5.getDouble(0)) <= 2,
      s"multi-OR min: ${df5.head.getDouble(0)} vs ${ex5.getDouble(0)}")
    assert(math.abs(df5.head.getLong(1) - ex5.getLong(1)) <= 2,
      s"multi-OR distinct: ${df5.head.getLong(1)} vs ${ex5.getLong(1)}")
    val sql5g = """SELECT l_returnflag, max(l_quantity) AS mx FROM lineitem
                   WHERE (l_quantity < 5 OR l_quantity > 45)
                     AND (l_discount < 0.03 OR l_discount > 0.07)
                   GROUP BY l_returnflag""".stripMargin
    val ex5g = session(aqp = false).sql(sql5g).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val df5g = session(aqp = true).sql(sql5g)
    assert(isRewritten(df5g), s"multi-OR grouped MAX must fold:\n${df5g.queryExecution.optimizedPlan}")
    df5g.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - ex5g(r.getString(0))) <= 2,
        s"multi-OR group max: ${r.getDouble(1)} vs ${ex5g(r.getString(0))}")
    }
    // 5. FILTER clause composes (atom-parameterized recursion)
    val sql6 = """SELECT min(l_quantity) FILTER (WHERE l_quantity > 20) AS mn
                  FROM lineitem""".stripMargin
    val ex6 = session(aqp = false).sql(sql6).head.getDouble(0)
    val df6 = session(aqp = true).sql(sql6)
    assert(isRewritten(df6), s"FILTERed numeric MIN must fold:\n${df6.queryExecution.optimizedPlan}")
    assert(df6.head.getDouble(0) == ex6, s"FILTERed min: ${df6.head.getDouble(0)} vs $ex6")
    // 6. fallbacks stay pinned: numeric MIN/MAX inside arithmetic (a domain
    // POINT, not an additive measure), and a BARE days-modeled timestamp
    // (day-granular values cannot carry intra-day precision)
    val arith = session(aqp = true).sql(
      "SELECT min(l_quantity) + 1 AS v FROM lineitem")
    assert(!isRewritten(arith), "numeric MIN inside arithmetic must fall back")
    val bareTs = session(aqp = true).sql(
      "SELECT max(o_orderdate) AS mx FROM orders")
    assert(!isRewritten(bareTs), "bare timestamp MAX must fall back")
    // 7. empty selection folds to SQL's NULL
    val empty = session(aqp = true).sql(
      "SELECT min(l_quantity) AS mn FROM lineitem WHERE l_quantity < -5")
    assert(isRewritten(empty), "empty-slice numeric MIN must still fold")
    assert(empty.head.isNullAt(0), "numeric MIN over an empty selection must be NULL")
  }

  test("FILTER (WHERE ...) aggregates fold with per-aggregate predicate merge") {
    // the clause's conjuncts merge into that ONE aggregate's estimation
    // predicates — the conditional-count / pivot idiom answers zero-scan
    val sql = """SELECT count(*) AS n,
                        count(*) FILTER (WHERE l_returnflag = 'A') AS na,
                        sum(l_extendedprice) FILTER (WHERE l_quantity < 10) AS s,
                        avg(l_extendedprice) FILTER (WHERE l_discount < 0.05) AS a
                 FROM lineitem WHERE l_quantity < 30""".stripMargin
    val exact = session(aqp = false).sql(sql).head
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"FILTER aggregates must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.head
    (0 until 4).foreach { i =>
      val (e, v) = (exact.get(i) match { case n: Number => n.doubleValue() },
        est.get(i) match { case n: Number => n.doubleValue() })
      assert(qerr(v, e) <= 1.5, s"FILTER col $i: $v vs $e")
    }
    // grouped: the row universe is the BASE predicate's — a group the
    // filter empties still emits with COUNT 0 and SUM NULL
    val gSql = """SELECT l_linestatus,
                         count(*) FILTER (WHERE l_returnflag = 'A') AS na,
                         sum(l_extendedprice) FILTER (WHERE l_quantity < -5) AS s
                  FROM lineitem GROUP BY l_linestatus""".stripMargin
    val gExact = session(aqp = false).sql(gSql).collect()
      .map(r => r.getString(0) -> ((r.getLong(1).toDouble, r.isNullAt(2)))).toMap
    val gDf = session(aqp = true).sql(gSql)
    assert(isRewritten(gDf), s"grouped FILTER must fold:\n${gDf.queryExecution.optimizedPlan}")
    val gEst = gDf.collect()
      .map(r => r.getString(0) -> ((r.getLong(1).toDouble, r.isNullAt(2)))).toMap
    assert(gEst.keySet == gExact.keySet, s"keys ${gEst.keySet} vs ${gExact.keySet}")
    gExact.foreach { case (k, (en, eNull)) =>
      assert(qerr(math.max(gEst(k)._1, 1.0), math.max(en, 1.0)) <= 1.5,
        s"group $k filtered count: ${gEst(k)._1} vs $en")
      assert(gEst(k)._2 == eNull, s"group $k filter-emptied SUM null: ${gEst(k)._2} vs $eNull")
    }
    // FILTER leaves ride aggregate arithmetic (net-count shape)
    val arith = """SELECT count(*) FILTER (WHERE l_returnflag = 'A')
                        - count(*) FILTER (WHERE l_returnflag = 'R') AS net
                   FROM lineitem WHERE l_quantity < 30""".stripMargin
    val aExact = session(aqp = false).sql(arith).head.getLong(0).toDouble
    val aDf = session(aqp = true).sql(arith)
    assert(isRewritten(aDf), s"FILTER arithmetic must fold:\n${aDf.queryExecution.optimizedPlan}")
    assert(math.abs(aDf.head.getLong(0).toDouble - aExact) <=
      0.5 * math.max(math.abs(aExact), 1000.0),
      s"net filtered count: ${aDf.head.getLong(0)} vs $aExact")
    // FILTER composes with grouping sets (per-set estimation routes
    // through the same conjunctive dispatchers)
    val ruSql = """SELECT l_linestatus,
                          count(*) FILTER (WHERE l_returnflag = 'A') AS na
                   FROM lineitem WHERE l_quantity < 30
                   GROUP BY ROLLUP(l_linestatus)""".stripMargin
    val ruExact = session(aqp = false).sql(ruSql).collect()
      .map(r => (if (r.isNullAt(0)) "␀" else r.getString(0)) -> r.getLong(1).toDouble).toMap
    val ruDf = session(aqp = true).sql(ruSql)
    assert(isRewritten(ruDf), s"FILTER under ROLLUP must fold:\n${ruDf.queryExecution.optimizedPlan}")
    val ruEst = ruDf.collect()
      .map(r => (if (r.isNullAt(0)) "␀" else r.getString(0)) -> r.getLong(1).toDouble).toMap
    assert(ruEst.keySet == ruExact.keySet, s"rollup keys ${ruEst.keySet} vs ${ruExact.keySet}")
    ruExact.foreach { case (k, v) =>
      assert(qerr(math.max(ruEst(k), 1.0), math.max(v, 1.0)) <= 1.5,
        s"rollup set $k filtered count: ${ruEst(k)} vs $v")
    }
    // FILTER composes with disjunctive outer predicates: the clause's
    // atoms distribute into the branch sets (single-OR) and into every
    // signed expansion term (two-OR)
    val orCases = Seq(
      """SELECT count(*) AS n, count(*) FILTER (WHERE l_returnflag = 'A') AS na
         FROM lineitem WHERE l_quantity < 5 OR l_quantity > 45""".stripMargin,
      """SELECT count(*) AS n, count(*) FILTER (WHERE l_returnflag = 'A') AS na
         FROM lineitem WHERE (l_quantity < 5 OR l_quantity > 45)
           AND (l_discount < 0.02 OR l_discount > 0.08)""".stripMargin)
    orCases.foreach { s =>
      val ex = session(aqp = false).sql(s).head
      val d = session(aqp = true).sql(s)
      assert(isRewritten(d), s"FILTER under OR must fold for [$s]:\n${d.queryExecution.optimizedPlan}")
      val e = d.head
      assert(qerr(e.getLong(0).toDouble, ex.getLong(0).toDouble) <= 1.5,
        s"OR+FILTER base count: ${e.getLong(0)} vs ${ex.getLong(0)}")
      assert(qerr(math.max(e.getLong(1).toDouble, 1.0), math.max(ex.getLong(1).toDouble, 1.0)) <= 1.5,
        s"OR+FILTER filtered count: ${e.getLong(1)} vs ${ex.getLong(1)}")
    }
    // a same-column eq-disjunction INSIDE the clause folds as an IN atom
    val inOr = """SELECT count(*) AS n,
                         count(*) FILTER (WHERE l_returnflag = 'A' OR l_returnflag = 'R') AS nar
                  FROM lineitem WHERE l_quantity < 30""".stripMargin
    val inOrExact = session(aqp = false).sql(inOr).head
    val inOrDf = session(aqp = true).sql(inOr)
    assert(isRewritten(inOrDf),
      s"eq-OR inside FILTER must fold:\n${inOrDf.queryExecution.optimizedPlan}")
    assert(qerr(inOrDf.head.getLong(1).toDouble, inOrExact.getLong(1).toDouble) <= 1.5,
      s"FILTER(eq-OR) count: ${inOrDf.head.getLong(1)} vs ${inOrExact.getLong(1)}")
    // an un-understood FILTER condition (multi-column arithmetic — not a
    // single-attribute atom) falls back
    val opaque = session(aqp = true).sql(
      "SELECT count(*) FILTER (WHERE l_quantity + l_tax > 5) AS n FROM lineitem")
    assert(!isRewritten(opaque), "un-understood FILTER condition must fall back")
  }

  test("CASE WHEN inside aggregates folds as the FILTER clause in disguise") {
    // else-less CASE yields NULL on failing rows, which SUM/AVG/COUNT
    // skip — identical semantics to FILTER (WHERE p), and the fold must
    // produce the IDENTICAL estimate (same FilteredOut machinery)
    val caseSql = """SELECT sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice END) AS s,
                            count(CASE WHEN l_quantity < 10 THEN 1 END) AS n,
                            avg(CASE WHEN l_discount < 0.05 THEN l_extendedprice END) AS a
                     FROM lineitem WHERE l_quantity < 30""".stripMargin
    val filterSql = """SELECT sum(l_extendedprice) FILTER (WHERE l_returnflag = 'A') AS s,
                              count(*) FILTER (WHERE l_quantity < 10) AS n,
                              avg(l_extendedprice) FILTER (WHERE l_discount < 0.05) AS a
                       FROM lineitem WHERE l_quantity < 30""".stripMargin
    val caseDf = session(aqp = true).sql(caseSql)
    assert(isRewritten(caseDf), s"CASE aggregates must fold:\n${caseDf.queryExecution.optimizedPlan}")
    val (cr, fr) = (caseDf.head, session(aqp = true).sql(filterSql).head)
    (0 until 3).foreach { i =>
      assert(cr.get(i) == fr.get(i), s"CASE vs FILTER col $i: ${cr.get(i)} vs ${fr.get(i)}")
    }
    // ...and within bounds of the exact answers
    val exact = session(aqp = false).sql(caseSql).head
    assert(qerr(cr.getDouble(0), exact.getDouble(0)) <= 1.5,
      s"conditional sum: ${cr.getDouble(0)} vs ${exact.getDouble(0)}")
    assert(qerr(cr.getLong(1).toDouble, exact.getLong(1).toDouble) <= 1.5)
    assert(qerr(cr.getDouble(2), exact.getDouble(2)) <= 1.5)
    // grouped conditional aggregates fold too
    val gSql = """SELECT l_linestatus,
                         sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qa
                  FROM lineitem GROUP BY l_linestatus""".stripMargin
    val gExact = session(aqp = false).sql(gSql).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gDf = session(aqp = true).sql(gSql)
    assert(isRewritten(gDf), s"grouped CASE must fold:\n${gDf.queryExecution.optimizedPlan}")
    val gEst = gDf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gEst.keySet == gExact.keySet)
    gExact.foreach { case (k, v) =>
      assert(qerr(gEst(k), v) <= 1.5, s"group $k conditional sum: ${gEst(k)} vs $v")
    }
    // count_if(p): ReplaceExpressions lowers it to COUNT(If(p, .., NULL))
    // — the If arm of the same recognizer
    val ciSql = "SELECT count_if(l_quantity < 10) AS n FROM lineitem"
    val ciExact = session(aqp = false).sql(ciSql).head.getLong(0).toDouble
    val ciDf = session(aqp = true).sql(ciSql)
    assert(isRewritten(ciDf), s"count_if must fold:\n${ciDf.queryExecution.optimizedPlan}")
    assert(qerr(ciDf.head.getLong(0).toDouble, ciExact) <= 1.5,
      s"count_if: ${ciDf.head.getLong(0)} vs $ciExact")
    // ELSE 0 sums zeros (a p-emptied group yields 0, not NULL) — that is
    // NOT the FILTER convention, so it falls back rather than diverge
    val elseZero = session(aqp = true).sql(
      """SELECT sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice ELSE 0 END) AS s
         FROM lineitem""".stripMargin)
    assert(!isRewritten(elseZero), "CASE ... ELSE 0 must fall back to exact")
  }

  test("escaped LIKE wildcards fold as literals; invalid escapes fall back") {
    // dictionary values containing a literal '%': LIKE '10\%' must close
    // over ONLY "10%" — an escape-blind regex would expand the escaped
    // wildcard and pick the wrong member set (silently wrong fold, the
    // exact opposite of the rule's conservative-fallback contract)
    import org.apache.spark.sql.functions._
    val d = java.nio.file.Files.createTempDirectory("graft-aqp-esc-").toString
    spark.range(300).toDF("item_id")
      .withColumn("tag",
        element_at(array(lit("10%"), lit("10x"), lit("100")),
          (pmod(col("item_id"), lit(3)) + 1).cast("int")))
      .write.parquet(s"$d/items.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/graft_schema.json"),
      """{"tables": [{"name": "items", "primaryKey": ["item_id"]}],
        | "modeled": {"items": [{"col": "tag", "kind": "cat"}]}}""".stripMargin)
    rspn.Ensemble.get(spark, d)
    schema.Tables(spark, d, "items").unpersist(blocking = true)
    def sess(aqp: Boolean): SparkSession = {
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      if (aqp) s2.conf.set("spark.graft.aqp.enabled", "true")
      s2.read.parquet(s"$d/items.parquet").createOrReplaceTempView("items")
      s2
    }
    // SQL-literal '\\%' reaches Like as the pattern 10\% (escaped percent)
    val sql = "SELECT count(*) AS n FROM items WHERE tag LIKE '10\\\\%'"
    val exact = sess(aqp = false).sql(sql).head.getLong(0)
    assert(exact == 100L, s"fixture sanity: literal-percent rows, got $exact")
    val df = sess(aqp = true).sql(sql)
    assert(isRewritten(df), s"escaped LIKE must fold:\n${df.queryExecution.optimizedPlan}")
    assert(qerr(df.head.getLong(0).toDouble, exact.toDouble) <= 1.2,
      s"escaped-LIKE closure: est ${df.head.getLong(0)} vs exact $exact")
    // '\\\\' (escaped escape) is valid and matches nothing here; still folds
    val esc2 = sess(aqp = true).sql(
      "SELECT count(*) AS n FROM items WHERE tag LIKE '10\\\\\\\\%'")
    assert(isRewritten(esc2), "escaped-escape pattern must fold")
    assert(esc2.head.getLong(0) == 0L)
    // an escape before an ordinary char is a pattern Spark itself throws
    // on at eval — the fold must refuse it (never invent an answer)
    val bad = sess(aqp = true).sql("SELECT count(*) AS n FROM items WHERE tag LIKE '1\\\\0%'")
    assert(!isRewritten(bad), "invalid escape placement must fall back to exact")
  }

  test("a cached BARE modeled scan folds through the cache; re-reads stay exact-correct") {
    // the single most common dashboard idiom: cache the fact table, then
    // fire plain aggregates at it. StrictScan proves the cached plan is the
    // unfiltered scan and the rewrite answers from the model — zero jobs
    // against the cache, zero scans
    val s2 = session(aqp = true)
    val cached = s2.read.parquet(s"$tmpSf/lineitem.parquet").cache()
    try {
      cached.count() // materialize so the IMR is genuinely in use
      cached.createOrReplaceTempView("lineitem") // shadow the plain view
      val sql = """SELECT l_returnflag, count(*) AS n, avg(l_extendedprice) AS a
                   FROM lineitem WHERE l_quantity < 24 GROUP BY l_returnflag""".stripMargin
      val df = s2.sql(sql)
      assert(isRewritten(df),
        s"cached bare scan must fold:\n${df.queryExecution.optimizedPlan}")
      val exact = session(aqp = false).sql(sql).collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
      val est = df.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
      assert(est.keySet == exact.keySet)
      exact.foreach { case (k, v) =>
        assert(qerr(est(k), v) <= 1.5, s"cached-fold group $k: ${est(k)} vs $v")
      }
    } finally cached.unpersist(blocking = true)
  }

  test("a cached bare scan folds under canChangeCachedPlanOutputPartitioning (AQE-wrapped cache)") {
    // with this conf the cached physical plan's root is an
    // AdaptiveSparkPlanExec — a LEAF node whose inner scan a plain
    // collect never sees; StrictScan must resolve through its inputPlan
    // or the fold silently misses for every session running the conf
    val s2 = session(aqp = true)
    s2.conf.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    val cached = s2.read.parquet(s"$tmpSf/lineitem.parquet").cache()
    try {
      cached.count()
      cached.createOrReplaceTempView("lineitem")
      val sql = "SELECT count(*) AS n FROM lineitem WHERE l_quantity < 24"
      val df = s2.sql(sql)
      assert(isRewritten(df),
        s"AQE-wrapped cached bare scan must fold:\n${df.queryExecution.optimizedPlan}")
      val exact = session(aqp = false).sql(sql).head.getLong(0).toDouble
      assert(qerr(df.head.getLong(0).toDouble, exact) <= 1.5)
      // a FILTERED cache under the same conf folds too: the baked filter
      // sits inside the AQE wrapper's input plan, where the walk finds it
      val filtered = s2.read.parquet(s"$tmpSf/lineitem.parquet")
        .filter(col("l_quantity") < 5).cache()
      try {
        filtered.createOrReplaceTempView("lineitem_aqe_filtered")
        val viaCache = s2.sql("SELECT count(*) AS n FROM lineitem_aqe_filtered")
        assert(isRewritten(viaCache),
          s"AQE-wrapped cached FILTERED view must fold:\n${viaCache.queryExecution.optimizedPlan}")
        val exactF = session(aqp = false).sql(
          "SELECT count(*) AS n FROM lineitem WHERE l_quantity < 5").head.getLong(0)
        assert(qerr(math.max(viaCache.head.getLong(0).toDouble, 1.0),
          math.max(exactF.toDouble, 1.0)) <= 1.5,
          s"AQE cached-view fold: ${viaCache.head.getLong(0)} vs $exactF")
      } finally filtered.unpersist(blocking = true)
    } finally cached.unpersist(blocking = true)
  }

  test("GROUP BY year(date) folds as calendar-year buckets over the model's domain") {
    val sql = """SELECT year(o_orderdate) AS y, count(*) AS n, sum(o_totalprice) AS s
                 FROM orders WHERE o_totalprice < 150000
                 GROUP BY year(o_orderdate) ORDER BY y""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1).toDouble, r.getDouble(2)))).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"year buckets must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1).toDouble, r.getDouble(2)))).toMap
    assert(est.keySet == exact.keySet, s"year keys ${est.keySet} vs ${exact.keySet}")
    exact.foreach { case (y, (en, es)) =>
      assert(qerr(est(y)._1, en) <= 2.0, s"year $y count: ${est(y)._1} vs $en")
      assert(qerr(est(y)._2, es) <= 2.0, s"year $y sum: ${est(y)._2} vs $es")
    }
    // date_trunc folds per calendar month/quarter — the monthly time
    // series every dashboard draws (keys are the truncated timestamps)
    Seq("month", "quarter").foreach { unit =>
      val tSql = s"""SELECT date_trunc('$unit', o_orderdate) AS p, count(*) AS n
                     FROM orders WHERE o_totalprice < 150000
                     GROUP BY date_trunc('$unit', o_orderdate) ORDER BY p"""
      val tExact = session(aqp = false).sql(tSql).collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1).toDouble).toMap
      val tDf = session(aqp = true).sql(tSql)
      assert(isRewritten(tDf),
        s"date_trunc('$unit') must fold:\n${tDf.queryExecution.optimizedPlan}")
      val tEst = tDf.collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1).toDouble).toMap
      assert(tEst.keySet == tExact.keySet,
        s"$unit keys ${tEst.keySet.toSeq.sorted.take(5)}... vs ${tExact.keySet.toSeq.sorted.take(5)}...")
      tExact.foreach { case (k, v) =>
        // sparse buckets (a handful of rows) are q-error-noisy by nature;
        // a small absolute slack keeps the gate meaningful for real mass
        assert(qerr(tEst(k), v) <= 3.0 || math.abs(tEst(k) - v) <= 5.0,
          s"$unit bucket $k: ${tEst(k)} vs $v")
      }
    }
    // the buckets compose with FK joins (the walk resolves the date
    // attribute across the join) and with ORDER BY/LIMIT above the fold
    val jSql = """SELECT year(o_orderdate) AS y, count(*) AS n
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  WHERE l_quantity < 30
                  GROUP BY year(o_orderdate) ORDER BY n DESC LIMIT 3""".stripMargin
    val jExact = session(aqp = false).sql(jSql).collect().map(_.getInt(0)).toSet
    val jDf = session(aqp = true).sql(jSql)
    assert(isRewritten(jDf), s"join + year buckets must fold:\n${jDf.queryExecution.optimizedPlan}")
    val jEst = jDf.collect().map(_.getInt(0)).toSet
    assert(jEst.size == 3 && jExact.size == 3, s"top-3 years: $jEst vs $jExact")
    // an expression OVER the key (`year(d)+1`) is not the bare key:
    // folding it would silently emit the raw year — must fall back
    val keyExpr = session(aqp = true).sql(
      """SELECT year(o_orderdate) + 1 AS y1, count(*) AS n
         FROM orders GROUP BY year(o_orderdate)""".stripMargin)
    assert(!isRewritten(keyExpr), "an expression over the year key must fall back")
  }

  test("month()/quarter() fold as cross-year cyclic multi-interval buckets; week/day trunc fold") {
    // month(d)'s bucket k is the UNION of month-k intervals across every
    // domain year — ONE RangeUnion atom per bucket (multi-interval leaf
    // evaluation), not inclusion-exclusion
    Seq(
      "SELECT month(o_orderdate) AS k, count(*) AS n FROM orders GROUP BY month(o_orderdate)",
      "SELECT quarter(o_orderdate) AS k, count(*) AS n FROM orders GROUP BY quarter(o_orderdate)",
      """SELECT month(o_orderdate) AS k, count(*) AS n FROM orders
         WHERE o_totalprice < 150000 GROUP BY month(o_orderdate)""".stripMargin)
      .foreach { sql =>
        val exact = session(aqp = false).sql(sql).collect()
          .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
        val df = session(aqp = true).sql(sql)
        assert(isRewritten(df), s"cyclic buckets must fold for [$sql]:\n${df.queryExecution.optimizedPlan}")
        val est = df.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
        assert(est.keySet == exact.keySet, s"cyclic keys for [$sql]: ${est.keySet} vs ${exact.keySet}")
        exact.foreach { case (k, v) =>
          assert(qerr(est(k), v) <= 2.0 || math.abs(est(k) - v) <= 5.0,
            s"cyclic bucket $k for [$sql]: ${est(k)} vs $v")
        }
      }
    // dayofweek(): 1=Sunday..7=Saturday, each bucket one single-day
    // interval per domain week — the "traffic by weekday" dashboard shape
    val dowSql = """SELECT dayofweek(o_orderdate) AS k, count(*) AS n
                    FROM orders WHERE o_orderdate < DATE'1999-01-01'
                    GROUP BY dayofweek(o_orderdate)""".stripMargin
    val dowExact = session(aqp = false).sql(dowSql).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val dowDf = session(aqp = true).sql(dowSql)
    assert(isRewritten(dowDf), s"dayofweek() must fold:\n${dowDf.queryExecution.optimizedPlan}")
    val dowEst = dowDf.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    assert(dowEst.keySet == dowExact.keySet, s"dow keys ${dowEst.keySet} vs ${dowExact.keySet}")
    dowExact.foreach { case (k, v) =>
      assert(qerr(dowEst(k), v) <= 2.0 || math.abs(dowEst(k) - v) <= 5.0,
        s"dow bucket $k: ${dowEst(k)} vs $v")
    }
    // weekday(): 0=Monday..6=Sunday — same machinery, shifted keys
    val wdSql = """SELECT weekday(o_orderdate) AS k, count(*) AS n
                   FROM orders WHERE o_orderdate < DATE'1999-01-01'
                   GROUP BY weekday(o_orderdate)""".stripMargin
    val wdExact = session(aqp = false).sql(wdSql).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val wdDf = session(aqp = true).sql(wdSql)
    assert(isRewritten(wdDf), s"weekday() must fold:\n${wdDf.queryExecution.optimizedPlan}")
    val wdEst = wdDf.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    assert(wdEst.keySet == wdExact.keySet)
    // weekday k maps to dayofweek (k+2-1)%7+1: the two folds must agree
    wdExact.foreach { case (k, v) =>
      assert(qerr(wdEst(k), v) <= 2.0 || math.abs(wdEst(k) - v) <= 5.0,
        s"weekday bucket $k: ${wdEst(k)} vs $v")
    }
    // ISO week: Spark's date_trunc('week') floors to MONDAY — bucket keys
    // must agree with the engine's own truncation exactly (a one-day-off
    // floor shifts every key); restricted span keeps buckets dense
    val wSql = """SELECT date_trunc('week', o_orderdate) AS p, count(*) AS n
                  FROM orders WHERE o_orderdate < DATE'1992-06-01'
                  GROUP BY date_trunc('week', o_orderdate)""".stripMargin
    val wExact = session(aqp = false).sql(wSql).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1).toDouble).toMap
    val wDf = session(aqp = true).sql(wSql)
    assert(isRewritten(wDf), s"date_trunc('week') must fold:\n${wDf.queryExecution.optimizedPlan}")
    val wEst = wDf.collect().map(r => r.getTimestamp(0).toString -> r.getLong(1).toDouble).toMap
    assert(wEst.keySet == wExact.keySet,
      s"week keys ${wEst.keySet.toSeq.sorted.take(4)} vs ${wExact.keySet.toSeq.sorted.take(4)}")
    wEst.keys.foreach { k =>
      assert(java.time.LocalDate.parse(k.substring(0, 10)).getDayOfWeek
        == java.time.DayOfWeek.MONDAY, s"week key $k must floor to Monday")
    }
    // 'day' buckets under the 400 cap fold; the full multi-year span
    // (>400 daily buckets) pins the cap-exceeded fallback
    val dSql = """SELECT date_trunc('day', o_orderdate) AS p, count(*) AS n
                  FROM orders WHERE o_orderdate < DATE'1992-03-01'
                  GROUP BY date_trunc('day', o_orderdate)""".stripMargin
    val dExact = session(aqp = false).sql(dSql).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1).toDouble).toMap
    val dDf = session(aqp = true).sql(dSql)
    assert(isRewritten(dDf), s"date_trunc('day') must fold:\n${dDf.queryExecution.optimizedPlan}")
    assert(dDf.collect().map(r => r.getTimestamp(0).toString).toSet == dExact.keySet)
    val dAll = session(aqp = true).sql(
      """SELECT date_trunc('day', o_orderdate) AS p, count(*) AS n
         FROM orders GROUP BY date_trunc('day', o_orderdate)""".stripMargin)
    assert(!isRewritten(dAll), "a multi-year daily series exceeds the 2000-bucket interval cap: fallback")
  }

  test("mixed calendar × dimension grouping folds: GROUP BY year(d), dimcol") {
    // the highest-frequency dashboard shape: one calendar bucket axis, one
    // dictionary axis — per bucket the dictionary groups enumerate under
    // the bucket-conjoined predicate (group_by_combination over a range)
    val sql = """SELECT year(o_orderdate) AS y, o_orderpriority, count(*) AS n,
                        sum(o_totalprice) AS rev
                 FROM orders WHERE o_totalprice < 150000
                 GROUP BY year(o_orderdate), o_orderpriority""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> ((r.getLong(2).toDouble, r.getDouble(3)))).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"mixed grouping must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect()
      .map(r => (r.getInt(0), r.getString(1)) -> ((r.getLong(2).toDouble, r.getDouble(3)))).toMap
    assert(est.keySet == exact.keySet,
      s"mixed keys: ${(est.keySet -- exact.keySet).take(4)} extra, ${(exact.keySet -- est.keySet).take(4)} missing")
    // year × priority cells at sf0.001 hold a handful of rows each —
    // sparse-bucket q-error is noisy by nature (the month test's slack
    // convention); the keyset equality above is the strict gate
    exact.foreach { case (k, (en, es)) =>
      assert(qerr(est(k)._1, en) <= 3.0 || math.abs(est(k)._1 - en) <= 10.0,
        s"mixed group $k count: ${est(k)._1} vs $en")
      assert(qerr(est(k)._2, es) <= 3.0 || math.abs(est(k)._2 - es) <= 10.0 * 150000,
        s"mixed group $k rev: ${est(k)._2} vs $es")
    }
    // grouping order is the USER's: (dim, calendar) works too, and the
    // fold composes with cyclic buckets and joins
    val sql2 = """SELECT l_returnflag, month(o_orderdate) AS m, count(*) AS n
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  WHERE l_quantity < 30
                  GROUP BY l_returnflag, month(o_orderdate)""".stripMargin
    val exact2 = session(aqp = false).sql(sql2).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2).toDouble).toMap
    val df2 = session(aqp = true).sql(sql2)
    assert(isRewritten(df2), s"dim × cyclic over a join must fold:\n${df2.queryExecution.optimizedPlan}")
    val est2 = df2.collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2).toDouble).toMap
    assert(est2.keySet == exact2.keySet, s"dim×month keys differ: ${(est2.keySet diff exact2.keySet).take(3)} / ${(exact2.keySet diff est2.keySet).take(3)}")
    exact2.foreach { case (k, v) =>
      assert(qerr(est2(k), v) <= 2.0 || math.abs(est2(k) - v) <= 5.0,
        s"dim×month group $k: ${est2(k)} vs $v")
    }
    // TWO dictionary dimensions beside the calendar bucket: the per-bucket
    // enumeration is multi-attribute (prefix-pruned), so the general
    // calendar × dim × dim shape folds too
    val sql3 = """SELECT year(o_orderdate) AS y, o_orderstatus, o_orderpriority, count(*) AS n
                  FROM orders WHERE o_totalprice < 150000
                  GROUP BY year(o_orderdate), o_orderstatus, o_orderpriority""".stripMargin
    val exact3 = session(aqp = false).sql(sql3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)) -> r.getLong(3).toDouble).toMap
    val df3 = session(aqp = true).sql(sql3)
    assert(isRewritten(df3), s"calendar × dim × dim must fold:\n${df3.queryExecution.optimizedPlan}")
    val est3 = df3.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)) -> r.getLong(3).toDouble).toMap
    // at 105-cell granularity the model's universe can disagree with the
    // exact plane's only AT THE EMPTY-CELL BOUNDARY (a sampled model puts
    // fractional mass on genuinely empty fine cells and vice versa) — any
    // disagreement on a non-trivial cell is a real bug
    (est3.keySet diff exact3.keySet).foreach { k =>
      assert(est3(k) <= 5.0, s"3-way phantom group $k carries real mass: ${est3(k)}")
    }
    (exact3.keySet diff est3.keySet).foreach { k =>
      assert(exact3(k) <= 5.0, s"3-way dropped group $k has real rows: ${exact3(k)}")
    }
    (est3.keySet intersect exact3.keySet).foreach { k =>
      assert(qerr(est3(k), exact3(k)) <= 3.0 || math.abs(est3(k) - exact3(k)) <= 10.0,
        s"3-way group $k: ${est3(k)} vs ${exact3(k)}")
    }
    // an UNMODELED second grouping column must fall back (num-MODELED
    // numeric dims ride the fold via realized-value support since r15 —
    // the dedicated test below; o_custkey is a key, never modeled)
    val numDim = session(aqp = true).sql(
      """SELECT year(o_orderdate) AS y, o_custkey, count(*) AS n
         FROM orders GROUP BY year(o_orderdate), o_custkey""".stripMargin)
    assert(!isRewritten(numDim), "an unmodeled dimension column must fall back")
  }

  test("numeric dimension columns ride the calendar fold via realized-value support") {
    // `GROUP BY year(d), numcol` — kind dispatch on the dimension: the
    // num-modeled column expands the bucket tuples by its realized-value
    // support (one point pin per value), under the shared 400-tuple cap
    val sql = """SELECT year(l_shipdate) AS y, l_quantity, count(*) AS n,
                        sum(l_extendedprice) AS s
                 FROM lineitem WHERE l_quantity < 10
                 GROUP BY year(l_shipdate), l_quantity""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => (r.getInt(0), r.getDouble(1)) -> r.getLong(2).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"year × numeric dim must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => (r.getInt(0), r.getDouble(1)) -> r.getLong(2).toDouble).toMap
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"y×num phantom cell $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"y×num dropped cell $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"y×num cell $k: ${est(k)} vs ${exact(k)}")
    }
    // calendar × numeric × dictionary: all three kinds in one grouping —
    // the numeric expands tuples, the dictionary enumerates per tuple
    val sql2 = """SELECT year(l_shipdate) AS y, l_quantity, l_returnflag, count(*) AS n
                  FROM lineitem WHERE l_quantity < 5
                  GROUP BY year(l_shipdate), l_quantity, l_returnflag""".stripMargin
    val exact2 = session(aqp = false).sql(sql2).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2)) -> r.getLong(3).toDouble).toMap
    val df2 = session(aqp = true).sql(sql2)
    assert(isRewritten(df2),
      s"year × numeric × dict must fold:\n${df2.queryExecution.optimizedPlan}")
    val est2 = df2.collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getString(2)) -> r.getLong(3).toDouble).toMap
    // year × qty × flag is ~84 cells over ~500 selected rows at sf0.001 —
    // the mean occupied cell holds ~6 rows, so the empty-cell boundary
    // tolerance is one mean cell, not the coarser tests' 5
    (est2.keySet diff exact2.keySet).foreach { k =>
      assert(est2(k) <= 8.0, s"3-kind phantom cell $k carries real mass: ${est2(k)}")
    }
    (exact2.keySet diff est2.keySet).foreach { k =>
      assert(exact2(k) <= 8.0, s"3-kind dropped cell $k has real rows: ${exact2(k)}")
    }
    (est2.keySet intersect exact2.keySet).foreach { k =>
      assert(qerr(est2(k), exact2(k)) <= 3.0 || math.abs(est2(k) - exact2(k)) <= 10.0,
        s"3-kind cell $k: ${est2(k)} vs ${exact2(k)}")
    }
    // TWO numeric grouping columns (no calendar) cross their supports
    // through the same tuple machinery in rewriteNumericGroup
    val sql3 = """SELECT l_quantity, l_linestatus, l_tax, count(*) AS n
                  FROM lineitem WHERE l_quantity < 15
                  GROUP BY l_quantity, l_linestatus, l_tax""".stripMargin
    val exact3 = session(aqp = false).sql(sql3).collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2)) -> r.getLong(3).toDouble).toMap
    val df3 = session(aqp = true).sql(sql3)
    assert(isRewritten(df3),
      s"two numeric keys × dict must fold:\n${df3.queryExecution.optimizedPlan}")
    val est3 = df3.collect()
      .map(r => (r.getDouble(0), r.getString(1), r.getDouble(2)) -> r.getLong(3).toDouble).toMap
    (est3.keySet diff exact3.keySet).foreach { k =>
      assert(est3(k) <= 5.0, s"2-num phantom cell $k carries real mass: ${est3(k)}")
    }
    (exact3.keySet diff est3.keySet).foreach { k =>
      assert(exact3(k) <= 5.0, s"2-num dropped cell $k has real rows: ${exact3(k)}")
    }
    (est3.keySet intersect exact3.keySet).foreach { k =>
      assert(qerr(est3(k), exact3(k)) <= 3.0 || math.abs(est3(k) - exact3(k)) <= 10.0,
        s"2-num cell $k: ${est3(k)} vs ${exact3(k)}")
    }
    // a cap-exceeded numeric dimension (near-continuous support) falls back
    val cappedDim = session(aqp = true).sql(
      """SELECT year(o_orderdate) AS y, o_totalprice, count(*) AS n
         FROM orders GROUP BY year(o_orderdate), o_totalprice""".stripMargin)
    assert(!isRewritten(cappedDim), "a cap-exceeded numeric dimension must fall back")
  }

  test("GROUP BY cast(ts AS date) folds as daily buckets keyed by the date") {
    // the analyzer lowers to_date(ts) over a timestamp to Cast(ts, date):
    // date_trunc('day')'s buckets with DateType keys, span narrowed by the
    // query's own date predicate under the 400-bucket cap
    val sql = """SELECT cast(o_orderdate AS date) AS d, count(*) AS n
                 FROM orders WHERE o_orderdate >= TIMESTAMP'2000-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP'2000-04-01 00:00:00'
                 GROUP BY cast(o_orderdate AS date)""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"daily cast buckets must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getDate(0).toString -> r.getLong(1).toDouble).toMap
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"phantom day $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"dropped day $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"day $k: ${est(k)} vs ${exact(k)}")
    }
    // the to_date spelling folds identically
    val viaToDate = session(aqp = true).sql(
      """SELECT to_date(o_orderdate) AS d, count(*) AS n
         FROM orders WHERE o_orderdate >= TIMESTAMP'2000-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP'2000-04-01 00:00:00'
         GROUP BY to_date(o_orderdate)""".stripMargin)
    assert(isRewritten(viaToDate),
      s"to_date buckets must fold:\n${viaToDate.queryExecution.optimizedPlan}")
    // an un-narrowed multi-year daily span exceeds the 400-bucket cap
    val wide = session(aqp = true).sql(
      """SELECT cast(o_orderdate AS date) AS d, count(*) AS n
         FROM orders GROUP BY cast(o_orderdate AS date)""".stripMargin)
    assert(!isRewritten(wide), "a multi-year daily span must fall back")
  }

  test("numeric-column GROUP BY folds as realized-value histogram buckets") {
    // the histogram dashboard shape: one bucket per realized value of a
    // modeled numeric column, each a point-pinned estimation (the numeric
    // mirror of the dictionary enumeration)
    val sql = """SELECT l_quantity, count(*) AS n, avg(l_extendedprice) AS ap
                 FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_quantity""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getDouble(0) -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"numeric GROUP BY must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getDouble(0) -> r.getLong(1).toDouble).toMap
    // sparse-cell boundary convention (the calendar tests'): phantom or
    // dropped cells must be trivial, shared cells within loose q-error
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"phantom bucket $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"dropped bucket $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"bucket $k: ${est(k)} vs ${exact(k)}")
    }
    // numeric × dictionary dimension: the per-bucket enumeration rides
    // along exactly like the calendar fold's
    val sql2 = """SELECT l_quantity, l_linestatus, count(*) AS n
                  FROM lineitem WHERE l_quantity < 10 GROUP BY l_quantity, l_linestatus""".stripMargin
    val exact2 = session(aqp = false).sql(sql2).collect()
      .map(r => (r.getDouble(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    val df2 = session(aqp = true).sql(sql2)
    assert(isRewritten(df2), s"numeric × dim must fold:\n${df2.queryExecution.optimizedPlan}")
    val est2 = df2.collect()
      .map(r => (r.getDouble(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    (est2.keySet diff exact2.keySet).foreach { k =>
      assert(est2(k) <= 5.0, s"phantom cell $k carries real mass: ${est2(k)}")
    }
    (exact2.keySet diff est2.keySet).foreach { k =>
      assert(exact2(k) <= 5.0, s"dropped cell $k has real rows: ${exact2(k)}")
    }
    (est2.keySet intersect exact2.keySet).foreach { k =>
      assert(qerr(est2(k), exact2(k)) <= 3.0 || math.abs(est2(k) - exact2(k)) <= 10.0,
        s"cell $k: ${est2(k)} vs ${exact2(k)}")
    }
    // over an FK join: p_size buckets against the lineitem fan-out
    val sql3 = """SELECT p_size, count(*) AS n
                  FROM lineitem JOIN part ON l_partkey = p_partkey
                  WHERE l_quantity < 30 GROUP BY p_size""".stripMargin
    val exact3 = session(aqp = false).sql(sql3).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val df3 = session(aqp = true).sql(sql3)
    assert(isRewritten(df3), s"numeric GROUP BY over a join must fold:\n${df3.queryExecution.optimizedPlan}")
    val est3 = df3.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    (est3.keySet diff exact3.keySet).foreach { k =>
      assert(est3(k) <= 5.0, s"phantom p_size $k carries real mass: ${est3(k)}")
    }
    (exact3.keySet diff est3.keySet).foreach { k =>
      assert(exact3(k) <= 5.0, s"dropped p_size $k has real rows: ${exact3(k)}")
    }
    (est3.keySet intersect exact3.keySet).foreach { k =>
      assert(qerr(est3(k), exact3(k)) <= 3.0 || math.abs(est3(k) - exact3(k)) <= 20.0,
        s"p_size $k: ${est3(k)} vs ${exact3(k)}")
    }
    // a cross-column disjunction COMPOSES with the value pins since r15:
    // each bucket's point conjunct distributes into both branches through
    // the shape dispatch (inclusion-exclusion per bucket)
    val orSql = """SELECT l_quantity, count(*) AS n FROM lineitem
                   WHERE l_discount < 0.02 OR l_tax > 0.06 GROUP BY l_quantity""".stripMargin
    val orExact = session(aqp = false).sql(orSql).collect()
      .map(r => r.getDouble(0) -> r.getLong(1).toDouble).toMap
    val orDf = session(aqp = true).sql(orSql)
    assert(isRewritten(orDf),
      s"numeric GROUP BY under a disjunction must fold:\n${orDf.queryExecution.optimizedPlan}")
    val orEst = orDf.collect().map(r => r.getDouble(0) -> r.getLong(1).toDouble).toMap
    (orEst.keySet diff orExact.keySet).foreach { k =>
      assert(orEst(k) <= 5.0, s"OR phantom bucket $k carries real mass: ${orEst(k)}")
    }
    (orExact.keySet diff orEst.keySet).foreach { k =>
      assert(orExact(k) <= 5.0, s"OR dropped bucket $k has real rows: ${orExact(k)}")
    }
    (orEst.keySet intersect orExact.keySet).foreach { k =>
      assert(qerr(orEst(k), orExact(k)) <= 3.0 || math.abs(orEst(k) - orExact(k)) <= 10.0,
        s"OR bucket $k: ${orEst(k)} vs ${orExact(k)}")
    }
    // fallbacks: a near-continuous column exceeds the 400-bucket cap; an
    // aggregate over the grouped column itself falls back rather than guess
    val capped = session(aqp = true).sql(
      "SELECT l_extendedprice, count(*) AS n FROM lineitem GROUP BY l_extendedprice")
    assert(!isRewritten(capped), "near-continuous numeric GROUP BY must fall back")
    val selfAgg = session(aqp = true).sql(
      "SELECT l_quantity, sum(l_quantity) AS s FROM lineitem GROUP BY l_quantity")
    assert(!isRewritten(selfAgg), "aggregating the grouped column must fall back")
  }

  test("binned numeric GROUP BY folds: floor(x/w), width_bucket, round(x,-k)") {
    // the binned-histogram dashboard shape over a NEAR-CONTINUOUS column —
    // l_extendedprice has ~6k realized values, past the realized-value
    // enumeration cap (the bare GROUP BY l_extendedprice falls back, pinned
    // above) — but floor(x/1000) is ~105 half-open range buckets, each one
    // NumericLeaf range estimation, no enumeration at all
    def check(sql: String, keyOf: org.apache.spark.sql.Row => Any,
        nIdx: Int, label: String): Unit = {
      val exact = session(aqp = false).sql(sql).collect()
        .map(r => keyOf(r) -> r.getLong(nIdx).toDouble).toMap
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df), s"$label must fold:\n${df.queryExecution.optimizedPlan}")
      val est = df.collect().map(r => keyOf(r) -> r.getLong(nIdx).toDouble).toMap
      (est.keySet diff exact.keySet).foreach { k =>
        assert(est(k) <= 5.0, s"$label phantom bin $k carries real mass: ${est(k)}")
      }
      (exact.keySet diff est.keySet).foreach { k =>
        assert(exact(k) <= 5.0, s"$label dropped bin $k has real rows: ${exact(k)}")
      }
      (est.keySet intersect exact.keySet).foreach { k =>
        assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
          s"$label bin $k: ${est(k)} vs ${exact(k)}")
      }
    }
    check(
      """SELECT floor(l_extendedprice/1000) AS bin, count(*) AS n
         FROM lineitem WHERE l_quantity < 24
         GROUP BY floor(l_extendedprice/1000)""".stripMargin,
      _.getLong(0), 1, "floor-div bins")
    // aggregates over the binned source column estimate per bin (range-
    // conditioned moments): avg(x) GROUP BY floor(x/w) is well-defined
    val aSql = """SELECT floor(l_extendedprice/20000) AS bin, count(*) AS n,
                         avg(l_extendedprice) AS ax
                  FROM lineitem GROUP BY floor(l_extendedprice/20000)""".stripMargin
    val aExact = session(aqp = false).sql(aSql).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1).toDouble, r.getDouble(2)))).toMap
    val aDf = session(aqp = true).sql(aSql)
    assert(isRewritten(aDf), s"avg over binned col must fold:\n${aDf.queryExecution.optimizedPlan}")
    val aEst = aDf.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1).toDouble, r.getDouble(2)))).toMap
    assert(aEst.keySet == aExact.keySet, s"bins ${aEst.keySet} vs ${aExact.keySet}")
    aExact.foreach { case (k, (en, ea)) =>
      assert(qerr(aEst(k)._1, en) <= 2.0 || math.abs(aEst(k)._1 - en) <= 10.0,
        s"bin $k count: ${aEst(k)._1} vs $en")
      assert(qerr(aEst(k)._2, ea) <= 1.2, s"bin $k avg: ${aEst(k)._2} vs $ea")
    }
    // width_bucket's underflow (0) / regular (1..n) / overflow (n+1) keys
    // map to half-open intervals exactly like Spark's floor-scaled math
    check(
      """SELECT width_bucket(o_totalprice, 50000, 450000, 8) AS bin, count(*) AS n
         FROM orders GROUP BY width_bucket(o_totalprice, 50000, 450000, 8)""".stripMargin,
      _.getLong(0), 1, "width_bucket bins")
    // round(x, -k): HALF_UP away from zero — nonnegative domains only;
    // keys are the rounded doubles
    check(
      """SELECT round(l_extendedprice, -4) AS bin, count(*) AS n
         FROM lineitem WHERE l_quantity < 24
         GROUP BY round(l_extendedprice, -4)""".stripMargin,
      _.getDouble(0), 1, "round bins")
    // calendar × bin cross product through the shared interval-meet
    // machinery: GROUP BY year(d), floor(price/w)
    check(
      """SELECT year(o_orderdate) AS y, floor(o_totalprice/100000) AS bin, count(*) AS n
         FROM orders GROUP BY year(o_orderdate), floor(o_totalprice/100000)""".stripMargin,
      r => (r.getInt(0), r.getLong(1)), 2, "year × bin")
    // bin × dictionary dimension: per-bin group enumeration rides along
    check(
      """SELECT floor(o_totalprice/100000) AS bin, o_orderpriority, count(*) AS n
         FROM orders WHERE o_orderstatus = 'F'
         GROUP BY floor(o_totalprice/100000), o_orderpriority""".stripMargin,
      r => (r.getLong(0), r.getString(1)), 2, "bin × dict dim")
    // bin × numeric dimension: the num-modeled column expands the bin
    // tuples by realized-value support (r15 kind dispatch, unchanged)
    check(
      """SELECT floor(l_extendedprice/20000) AS bin, l_quantity, count(*) AS n
         FROM lineitem WHERE l_quantity < 10
         GROUP BY floor(l_extendedprice/20000), l_quantity""".stripMargin,
      r => (r.getLong(0), r.getDouble(1)), 2, "bin × num dim")
    // cross-column disjunction composes per bin (shape dispatch: the bin
    // range conjoins both OR branches, inclusion-exclusion per bucket)
    check(
      """SELECT floor(o_totalprice/100000) AS bin, count(*) AS n
         FROM orders WHERE o_orderstatus = 'F' OR o_orderpriority = '1-URGENT'
         GROUP BY floor(o_totalprice/100000)""".stripMargin,
      _.getLong(0), 1, "bin under OR")
    // fallbacks: past the 400-bin cap; positive round scale (fractional
    // bins regroup within FP noise); an unmodeled source column; an
    // expression OVER the bin key
    // r17: ~1000 bins now FOLD under the pure-interval cap (no dims, one
    // range probe per bin); a ~10000-bin width keeps the loud fallback
    val thousandBins = session(aqp = true).sql(
      """SELECT floor(l_extendedprice/100) AS bin, count(*) AS n
         FROM lineitem GROUP BY floor(l_extendedprice/100)""".stripMargin)
    assert(isRewritten(thousandBins),
      s"a ~1000-bin histogram must fold (r17 interval cap):\n${thousandBins.queryExecution.optimizedPlan}")
    assert(thousandBins.collect().length >= 200)
    val capped = session(aqp = true).sql(
      """SELECT floor(l_extendedprice/10) AS bin, count(*) AS n
         FROM lineitem GROUP BY floor(l_extendedprice/10)""".stripMargin)
    assert(!isRewritten(capped), "a ~10000-bin histogram must fall back at the interval cap")
    val posScale = session(aqp = true).sql(
      """SELECT round(l_discount, 1) AS bin, count(*) AS n
         FROM lineitem GROUP BY round(l_discount, 1)""".stripMargin)
    assert(!isRewritten(posScale), "round with a positive scale must fall back")
    val unmodeled = session(aqp = true).sql(
      """SELECT floor(l_partkey/100) AS bin, count(*) AS n
         FROM lineitem GROUP BY floor(l_partkey/100)""".stripMargin)
    assert(!isRewritten(unmodeled), "bins over an unmodeled column must fall back")
    // an expression over the bin key used to fall back; since the r16
    // composed-key widening it folds (see the composed-key test), but an
    // output expression DIFFERENT from the grouping expression still must
    val overKey = session(aqp = true).sql(
      """SELECT floor(o_totalprice/100000) + 1 AS b1, count(*) AS n
         FROM orders GROUP BY floor(o_totalprice/100000)""".stripMargin)
    assert(!isRewritten(overKey),
      "an output expression over the RAW bin key (not the grouping expression) must fall back")
  }

  test("sub-day calendar buckets fold over the secs-modeled stream table") {
    // r16 (VERDICT item 4, the modeling branch): events.ts models at
    // SECOND granularity ("secs" kind — epoch seconds), so
    // date_trunc('hour', ts) folds as step-aligned half-open intervals —
    // the tumbling-dashboard class, zero scans. Buckets at sf0.001 are
    // SPARSE (~1.4 events/hour), so the sparse-cell boundary convention
    // applies: phantom/dropped cells must be trivial, shared cells loose
    val sql = """SELECT date_trunc('hour', ts) AS h, count(*) AS n
                 FROM events WHERE ts < TIMESTAMP'2024-01-08 00:00:00'
                 GROUP BY date_trunc('hour', ts)""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"hourly buckets must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getTimestamp(0).toString -> r.getLong(1).toDouble).toMap
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"phantom hour $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"dropped hour $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 5.0,
        s"hour $k: ${est(k)} vs ${exact(k)}")
    }
    // every folded key is a true hour boundary
    est.keys.foreach(k => assert(k.endsWith("00:00.0"), s"hour key $k must truncate to :00:00"))
    // hour × dictionary dimension composes through the shared machinery
    val dSql = """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
                  FROM events WHERE ts < TIMESTAMP'2024-01-03 00:00:00'
                  GROUP BY date_trunc('hour', ts), event_type""".stripMargin
    val dExact = session(aqp = false).sql(dSql).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2).toDouble).toMap
    val dDf = session(aqp = true).sql(dSql)
    assert(isRewritten(dDf), s"hour × dim must fold:\n${dDf.queryExecution.optimizedPlan}")
    val dEst = dDf.collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2).toDouble).toMap
    (dEst.keySet diff dExact.keySet).foreach { k =>
      assert(dEst(k) <= 5.0, s"phantom cell $k carries real mass: ${dEst(k)}")
    }
    (dExact.keySet diff dEst.keySet).foreach { k =>
      assert(dExact(k) <= 5.0, s"dropped cell $k has real rows: ${dExact(k)}")
    }
    // minute-level buckets fold under the cap on a narrow window
    val mSql = """SELECT date_trunc('minute', ts) AS m, count(*) AS n
                  FROM events WHERE ts < TIMESTAMP'2024-01-01 06:00:00'
                  GROUP BY date_trunc('minute', ts)""".stripMargin
    val mDf = session(aqp = true).sql(mSql)
    assert(isRewritten(mDf), s"minute buckets must fold:\n${mDf.queryExecution.optimizedPlan}")
    val mExactKeys = session(aqp = false).sql(mSql).collect()
      .map(_.getTimestamp(0).toString).toSet
    val mEstKeys = mDf.collect().map(_.getTimestamp(0).toString).toSet
    // sparse single-row buckets may drop at the half-row gate; anything
    // folded must be a true minute boundary within the window
    assert(mEstKeys.nonEmpty)
    mEstKeys.foreach(k => assert(k.endsWith(":00.0"), s"minute key $k"))
    assert((mEstKeys diff mExactKeys).isEmpty, "no phantom minute outside the exact set")
    // DAY-granular calendar expressions fold over the secs column too
    // (the days-variant scaled by 86 400): GROUP BY cast(ts AS date)
    val daySql = """SELECT cast(ts AS date) AS d, count(*) AS n
                    FROM events GROUP BY cast(ts AS date)""".stripMargin
    val dayExact = session(aqp = false).sql(daySql).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1).toDouble).toMap
    val dayDf = session(aqp = true).sql(daySql)
    assert(isRewritten(dayDf), s"daily buckets over secs must fold:\n${dayDf.queryExecution.optimizedPlan}")
    val dayEst = dayDf.collect().map(r => r.getDate(0).toString -> r.getLong(1).toDouble).toMap
    assert(dayEst.keySet == dayExact.keySet, s"day keys ${dayEst.keySet} vs ${dayExact.keySet}")
    dayExact.foreach { case (k, v) =>
      assert(qerr(dayEst(k), v) <= 2.0 || math.abs(dayEst(k) - v) <= 5.0,
        s"day $k: ${dayEst(k)} vs $v")
    }
    // the literal tumbling-window SQL folds too: `GROUP BY window(ts,
    // '1 hour')` lowers to the named_struct(start, end) floor arithmetic,
    // recognized by numeric probe verification and keyed by the struct
    val wSql = """SELECT window(ts, '1 hour') AS w, count(*) AS n, avg(value) AS av
                  FROM events WHERE ts < TIMESTAMP'2024-01-08 00:00:00'
                  GROUP BY window(ts, '1 hour')""".stripMargin
    val wExact = session(aqp = false).sql(wSql).collect()
      .map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    val wDf = session(aqp = true).sql(wSql)
    assert(isRewritten(wDf), s"tumbling window must fold:\n${wDf.queryExecution.optimizedPlan}")
    val wEst = wDf.collect().map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    (wEst.keySet diff wExact.keySet).foreach { k =>
      assert(wEst(k) <= 5.0, s"phantom window $k carries real mass: ${wEst(k)}")
    }
    (wExact.keySet diff wEst.keySet).foreach { k =>
      assert(wExact(k) <= 5.0, s"dropped window $k has real rows: ${wExact(k)}")
    }
    (wEst.keySet intersect wExact.keySet).foreach { k =>
      assert(qerr(wEst(k), wExact(k)) <= 3.0 || math.abs(wEst(k) - wExact(k)) <= 5.0,
        s"window $k: ${wEst(k)} vs ${wExact(k)}")
    }
    // window-struct projections resolve ABOVE the fold (w.start etc.)
    val wsDf = session(aqp = true).sql(
      """SELECT w.start AS s, n FROM (
           SELECT window(ts, '6 hours') AS w, count(*) AS n
           FROM events WHERE ts < TIMESTAMP'2024-01-08 00:00:00'
           GROUP BY window(ts, '6 hours')) ORDER BY s""".stripMargin)
    assert(isRewritten(wsDf), s"window.start projection must resolve over the fold:\n${wsDf.queryExecution.optimizedPlan}")
    assert(wsDf.collect().length >= 20)
    // r17 (VERDICT item 7): the FULL 30-day hourly span — 720 buckets —
    // FOLDS under the pure-interval cap (one bucket column, zero
    // dimensions, one range probe per bucket); the monthly hourly
    // dashboard answers zero-scan. Exactness: key sets match the exact
    // plane and every shared cell stays inside the usual gates.
    val fsSql = """SELECT date_trunc('hour', ts) AS h, count(*) AS n
                   FROM events GROUP BY date_trunc('hour', ts)""".stripMargin
    val fullSpan = session(aqp = true).sql(fsSql)
    assert(isRewritten(fullSpan),
      s"the 720-bucket hourly series must fold (r17 interval cap):\n${fullSpan.queryExecution.optimizedPlan}")
    val fsExact = session(aqp = false).sql(fsSql).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1).toDouble).toMap
    val fsEst = fullSpan.collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1).toDouble).toMap
    // sparse hours fold out through the half-row gate at sf0.001;
    // >400 emitted buckets proves the old tuple cap is gone
    assert(fsEst.size > 400, s">400 hourly buckets expected, got ${fsEst.size}")
    (fsEst.keySet diff fsExact.keySet).foreach { k =>
      assert(fsEst(k) <= 5.0, s"hourly phantom $k carries real mass: ${fsEst(k)}")
    }
    (fsExact.keySet diff fsEst.keySet).foreach { k =>
      assert(fsExact(k) <= 5.0, s"hourly dropped $k has real rows: ${fsExact(k)}")
    }
    (fsEst.keySet intersect fsExact.keySet).foreach { k =>
      assert(qerr(fsEst(k), fsExact(k)) <= 3.0 || math.abs(fsEst(k) - fsExact(k)) <= 10.0,
        s"hourly cell $k: ${fsEst(k)} vs ${fsExact(k)}")
    }
    val fullWin = session(aqp = true).sql(
      """SELECT window(ts, '1 hour') AS w, count(*) AS n
         FROM events GROUP BY window(ts, '1 hour')""".stripMargin)
    assert(isRewritten(fullWin),
      s"the 720-bucket tumbling series must fold (r17 interval cap):\n${fullWin.queryExecution.optimizedPlan}")
    assert(fullWin.collect().length > 400)
    val daysCol = session(aqp = true).sql(
      """SELECT date_trunc('hour', o_orderdate) AS h, count(*) AS n
         FROM orders WHERE o_orderdate < DATE'1992-02-01'
         GROUP BY date_trunc('hour', o_orderdate)""".stripMargin)
    assert(!isRewritten(daysCol), "hourly over a day-granular column must fall back")
  }

  test("AVG-bearing ± combos fold per bucket (calendar and hourly)") {
    // r18 (VERDICT item 6): the bucketed grouped path carries AVG leaves
    // inside aggregate-arithmetic outputs through the same ratio machinery
    // the flat fold uses — hourly bucket × AVG-bearing tree, and a yearly
    // calendar bucket × AVG(x) − AVG(y), both vs the exact plane.
    val hSql = """SELECT date_trunc('hour', ts) AS h, avg(value) - count(*) AS d
                  FROM events WHERE ts < TIMESTAMP'2024-01-08 00:00:00'
                  GROUP BY date_trunc('hour', ts)""".stripMargin
    val hDf = session(aqp = true).sql(hSql)
    assert(isRewritten(hDf),
      s"hourly bucket x AVG± must fold:\n${hDf.queryExecution.optimizedPlan}")
    val hExact = session(aqp = false).sql(hSql).collect()
      .map(r => r.getTimestamp(0).toString -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val hEst = hDf.collect()
      .map(r => r.getTimestamp(0).toString -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    // hourly cells at sf0.001 hold 1–5 rows, so a per-cell sample AVG is
    // statistically noisy regardless of the estimator (sd ≈ 29/√n on a
    // U(0,100) value) — the hourly pin asserts the FOLD (above) and cell
    // emission; the accuracy gate runs on the denser daily buckets below
    // (~33 rows/cell) and the yearly lineitem combo
    assert(hEst.nonEmpty)
    val dSql = """SELECT cast(ts AS date) AS d, avg(value) - count(*) AS v
                  FROM events GROUP BY cast(ts AS date)""".stripMargin
    val dDf = session(aqp = true).sql(dSql)
    assert(isRewritten(dDf),
      s"daily bucket x AVG± must fold:\n${dDf.queryExecution.optimizedPlan}")
    val dExact = session(aqp = false).sql(dSql).collect()
      .map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    val dEst = dDf.collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    val relErrs = (dEst.keySet intersect dExact.keySet).toSeq
      .map(k => math.abs(dEst(k) - dExact(k)) / math.max(math.abs(dExact(k)), 1.0)).sorted
    assert(relErrs.nonEmpty)
    val medianRel = relErrs(relErrs.length / 2)
    assert(medianRel <= 0.35, s"daily AVG± median relative error $medianRel")
    val ySql = """SELECT year(l_shipdate) AS y,
                         avg(l_extendedprice) - avg(l_quantity) AS d
                  FROM lineitem GROUP BY year(l_shipdate)""".stripMargin
    val yDf = session(aqp = true).sql(ySql)
    assert(isRewritten(yDf),
      s"calendar bucket x AVG(x)-AVG(y) must fold:\n${yDf.queryExecution.optimizedPlan}")
    val yExact = session(aqp = false).sql(ySql).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val yEst = yDf.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(yEst.keySet == yExact.keySet, s"${yEst.keySet} vs ${yExact.keySet}")
    yExact.foreach { case (k, x) =>
      assert(qerr(math.max(yEst(k), 1.0), math.max(x, 1.0)) <= 1.3,
        s"year AVG± cell $k: ${yEst(k)} vs $x")
    }
  }

  test("hour-of-day / minute-of-hour fold as cyclic buckets over the secs column") {
    // `GROUP BY hour(ts)` — the daily-cycle dashboard: key k is the union
    // of its hour slice in every domain day (epoch-aligned in the UTC
    // session), estimated as one multi-interval range atom. 1000 events
    // over 30 days ≈ 42 rows/hour-of-day — real mass per key
    val sql = "SELECT hour(ts) AS h, count(*) AS n FROM events GROUP BY hour(ts)"
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"hour-of-day must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet.subsetOf((0 to 23).toSet), s"keys must be hours-of-day: ${est.keySet}")
    (est.keySet diff exact.keySet).foreach(k =>
      assert(est(k) <= 5.0, s"phantom hour $k carries real mass: ${est(k)}"))
    (exact.keySet diff est.keySet).foreach(k =>
      assert(exact(k) <= 5.0, s"dropped hour $k has real rows: ${exact(k)}"))
    (est.keySet intersect exact.keySet).foreach(k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"hour $k: ${est(k)} vs ${exact(k)}"))
    // hour × dictionary dimension composes through the shared machinery
    val dDf = session(aqp = true).sql(
      """SELECT hour(ts) AS h, event_type, count(*) AS n
         FROM events GROUP BY hour(ts), event_type""".stripMargin)
    assert(isRewritten(dDf), s"hour × dim must fold:\n${dDf.queryExecution.optimizedPlan}")
    assert(dDf.collect().nonEmpty)
    // minute-of-hour folds under a predicate-narrowed window
    val mDf = session(aqp = true).sql(
      """SELECT minute(ts) AS m, count(*) AS n
         FROM events WHERE ts < TIMESTAMP'2024-01-02 00:00:00'
         GROUP BY minute(ts)""".stripMargin)
    assert(isRewritten(mDf), s"minute-of-hour must fold:\n${mDf.queryExecution.optimizedPlan}")
    mDf.collect().foreach(r => assert(r.getInt(0) >= 0 && r.getInt(0) < 60))
    // hour() over a DAYS-modeled date column has no secs variant: kind
    // mismatch, honest fallback (hour of a date is the constant 0 anyway)
    val daysHour = session(aqp = true).sql(
      """SELECT hour(o_orderdate) AS h, count(*) AS n
         FROM orders GROUP BY hour(o_orderdate)""".stripMargin)
    assert(!isRewritten(daysHour), "hour over a days-modeled column must fall back")
  }

  test("sliding windows fold as overlapping range buckets") {
    // `GROUP BY window(ts, '2 hours', '1 hour')` — the analyzer lowers a
    // SLIDING window to an Expand (one candidate struct per overlap);
    // rewriteSliding verifies the lowering numerically and folds through
    // the calendar pipeline. Buckets OVERLAP (each event counts in
    // size/slide windows) — exact per-bucket semantics, each bucket an
    // independent range query over [start, start+size)
    val sql = """SELECT window(ts, '2 hours', '1 hour') AS w, count(*) AS n, avg(value) AS av
                 FROM events WHERE ts < TIMESTAMP'2024-01-08 00:00:00'
                 GROUP BY window(ts, '2 hours', '1 hour')""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"sliding window must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"phantom window $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"dropped window $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 5.0,
        s"window $k: ${est(k)} vs ${exact(k)}")
    }
    // the overlap property itself: hourly-slide starts are 1 h apart while
    // each span is 2 h, so consecutive folded windows overlap
    // events.ts reads as TimestampNTZ, so struct fields are LocalDateTime
    val starts = df.collect().map(_.getStruct(0).getAs[java.time.LocalDateTime](0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli).sorted
    assert(starts.sliding(2).exists(p => p(1) - p(0) == 3600000L),
      "consecutive sliding starts must be one slide apart")
    // NON-DIVISIBLE size/slide adds the containment Filter (+ pruning
    // Project when only window survives) between Aggregate and Expand —
    // the other recognized shape; a window.start key resolves per tumbling
    val ndSql = """SELECT window.start AS ws, count(*) AS n
                   FROM events WHERE ts < TIMESTAMP'2024-01-03 00:00:00'
                   GROUP BY window(ts, '3 hours', '2 hours')""".stripMargin
    val ndExact = session(aqp = false).sql(ndSql).collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1).toDouble).toMap
    val ndDf = session(aqp = true).sql(ndSql)
    assert(isRewritten(ndDf), s"non-divisible sliding must fold:\n${ndDf.queryExecution.optimizedPlan}")
    val ndEst = ndDf.collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1).toDouble).toMap
    (ndEst.keySet diff ndExact.keySet).foreach { k =>
      assert(ndEst(k) <= 5.0, s"phantom window $k carries real mass: ${ndEst(k)}")
    }
    (ndExact.keySet diff ndEst.keySet).foreach { k =>
      assert(ndExact(k) <= 5.0, s"dropped window $k has real rows: ${ndExact(k)}")
    }
    (ndEst.keySet intersect ndExact.keySet).foreach { k =>
      assert(qerr(ndEst(k), ndExact(k)) <= 3.0 || math.abs(ndEst(k) - ndExact(k)) <= 5.0,
        s"window $k: ${ndEst(k)} vs ${ndExact(k)}")
    }
    // sliding × dictionary dimension composes through the shared machinery
    val dDf = session(aqp = true).sql(
      """SELECT window(ts, '12 hours', '6 hours') AS w, event_type, count(*) AS n
         FROM events WHERE ts < TIMESTAMP'2024-01-15 00:00:00'
         GROUP BY window(ts, '12 hours', '6 hours'), event_type""".stripMargin)
    assert(isRewritten(dDf), s"sliding × dim must fold:\n${dDf.queryExecution.optimizedPlan}")
    assert(dDf.collect().nonEmpty)
    // cross-column ORs distribute into every sliding bucket through the
    // shared shape dispatch, like any calendar bucket
    val orSql = """SELECT window(ts, '12 hours', '6 hours') AS w, count(*) AS n
                   FROM events
                   WHERE (event_type = 'purchase') OR (value > 400)
                   GROUP BY window(ts, '12 hours', '6 hours')""".stripMargin
    val orExact = session(aqp = false).sql(orSql).collect()
      .map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    val orDf = session(aqp = true).sql(orSql)
    assert(isRewritten(orDf), s"sliding × OR must fold:\n${orDf.queryExecution.optimizedPlan}")
    val orEst = orDf.collect().map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    // OR-window cells at this SF hold ~5-10 rows — the same sparse-cell
    // tolerance the hour-of-day pin uses
    (orEst.keySet intersect orExact.keySet).foreach { k =>
      assert(qerr(orEst(k), orExact(k)) <= 3.0 || math.abs(orEst(k) - orExact(k)) <= 10.0,
        s"sliding OR window $k: ${orEst(k)} vs ${orExact(k)}")
    }
    // r17: the FULL 30-day hourly-slide span (~720 overlapping windows)
    // folds under the pure-interval cap — each window one range probe
    val fullSpan = session(aqp = true).sql(
      """SELECT window(ts, '2 hours', '1 hour') AS w, count(*) AS n
         FROM events GROUP BY window(ts, '2 hours', '1 hour')""".stripMargin)
    assert(isRewritten(fullSpan),
      s"a ~720-bucket sliding series must fold (r17 interval cap):\n${fullSpan.queryExecution.optimizedPlan}")
    assert(fullSpan.collect().length > 400)
    // a startTime OFFSET shifts every boundary by st: the numeric
    // verification derives st from the probes, so offset windows fold with
    // correctly shifted keys (tumbling spelled with 4 args goes through
    // the same Expand when sliding, the Project shape when not)
    val offSql = """SELECT window(ts, '2 hours', '1 hour', '30 minutes') AS w, count(*) AS n
                    FROM events WHERE ts < TIMESTAMP'2024-01-08 00:00:00'
                    GROUP BY window(ts, '2 hours', '1 hour', '30 minutes')""".stripMargin
    val offExact = session(aqp = false).sql(offSql).collect()
      .map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    val offDf = session(aqp = true).sql(offSql)
    assert(isRewritten(offDf), s"offset sliding must fold:\n${offDf.queryExecution.optimizedPlan}")
    val offEst = offDf.collect().map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    (offEst.keySet diff offExact.keySet).foreach { k =>
      assert(offEst(k) <= 5.0, s"phantom offset window $k carries real mass: ${offEst(k)}")
    }
    (offExact.keySet diff offEst.keySet).foreach { k =>
      assert(offExact(k) <= 5.0, s"dropped offset window $k has real rows: ${offExact(k)}")
    }
    offEst.keys.foreach(k => assert(k.contains(":30"), s"offset window key $k must shift by 30 min"))
  }

  test("count(DISTINCT) rides the calendar bucket fold; unmodeled keys fall back") {
    // daily-distinct dashboard: the daily bucket fold composes with a
    // distinct output through the shared OutCol dispatch (dict-modeled
    // event_type → per-bucket dictionary enumeration). Distinct outputs
    // never annotate (the pinned support-enumeration CI contract) but the
    // fold itself must engage.
    val sql = """SELECT cast(ts AS date) AS d, count(DISTINCT event_type) AS k
                 FROM events GROUP BY cast(ts AS date)""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"daily distinct must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getDate(0).toString -> r.getLong(1).toDouble).toMap
    assert(est.keySet == exact.keySet, s"day keys ${est.keySet} vs ${exact.keySet}")
    exact.foreach { case (k, v) =>
      assert(qerr(est(k), v) <= 2.0 || math.abs(est(k) - v) <= 2.0,
        s"day $k: distinct ${est(k)} vs $v")
    }
    // user_id is deliberately UNMODELED (keys and payloads never model —
    // DatasetSpec events comment): the true-DAU spelling runs exact,
    // untouched — the honest-fallback contract, not a gap
    val dau = session(aqp = true).sql(
      """SELECT cast(ts AS date) AS d, count(DISTINCT user_id) AS dau
         FROM events GROUP BY cast(ts AS date)""".stripMargin)
    assert(!isRewritten(dau), "count(DISTINCT <unmodeled key>) must fall back")
  }

  test("date_format grouping folds as merged daily buckets") {
    // the string-keyed dashboard spelling: daily buckets evaluated
    // through the expression's own eval and MERGED on equal keys — one
    // recognizer answers 'yyyy-MM-dd' (identity), 'yyyy-MM' (12 keys/yr)
    // and 'EEEE' (7 keys) alike with exact Spark formatter semantics
    val dSql = """SELECT date_format(ts, 'yyyy-MM-dd') AS d, count(*) AS n
                  FROM events GROUP BY date_format(ts, 'yyyy-MM-dd')""".stripMargin
    val dExact = session(aqp = false).sql(dSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val dDf = session(aqp = true).sql(dSql)
    assert(isRewritten(dDf), s"daily date_format must fold:\n${dDf.queryExecution.optimizedPlan}")
    val dEst = dDf.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(dEst.keySet == dExact.keySet, s"day keys ${dEst.keySet} vs ${dExact.keySet}")
    dExact.foreach { case (k, v) =>
      assert(qerr(dEst(k), v) <= 2.0 || math.abs(dEst(k) - v) <= 5.0, s"day $k: ${dEst(k)} vs $v")
    }
    // month keys MERGE ~30 daily buckets each (under a narrowed span —
    // the full 7-year orders domain is past the 400-day cap, see below)
    val mSql = """SELECT date_format(o_orderdate, 'yyyy-MM') AS m, count(*) AS n
                  FROM orders
                  WHERE o_orderdate >= DATE'1996-01-01' AND o_orderdate < DATE'1997-01-01'
                  GROUP BY date_format(o_orderdate, 'yyyy-MM')""".stripMargin
    val mExact = session(aqp = false).sql(mSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val mDf = session(aqp = true).sql(mSql)
    assert(isRewritten(mDf), s"month date_format must fold:\n${mDf.queryExecution.optimizedPlan}")
    val mEst = mDf.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(mEst.keySet == mExact.keySet, s"month keys ${mEst.keySet} vs ${mExact.keySet}")
    assert(mEst.keySet.forall(_.matches("1996-\\d\\d")))
    mExact.foreach { case (k, v) =>
      assert(qerr(mEst(k), v) <= 1.5, s"month $k: ${mEst(k)} vs $v")
    }
    // weekday names merge to seven keys through the same machinery
    val wDf = session(aqp = true).sql(
      """SELECT date_format(o_orderdate, 'EEEE') AS wd, count(*) AS n
         FROM orders
         WHERE o_orderdate >= DATE'1996-01-01' AND o_orderdate < DATE'1997-01-01'
         GROUP BY date_format(o_orderdate, 'EEEE')""".stripMargin)
    assert(isRewritten(wDf), s"weekday date_format must fold:\n${wDf.queryExecution.optimizedPlan}")
    val wdKeys = wDf.collect().map(_.getString(0)).toSet
    assert(wdKeys == Set("Monday", "Tuesday", "Wednesday", "Thursday",
      "Friday", "Saturday", "Sunday"), s"weekday keys: $wdKeys")
    // r17 (VERDICT item 4): the SUB-DAY spelling 'yyyy-MM-dd HH' over the
    // secs-modeled stream column folds as hour-step buckets evaluated
    // through Spark's own formatter and merged on equal keys — the hourly
    // string-key dashboard; key sets and cells match the exact plane
    val hSql = """SELECT date_format(ts, 'yyyy-MM-dd HH') AS h, count(*) AS n
                  FROM events WHERE ts < TIMESTAMP'2024-01-08 00:00:00'
                  GROUP BY date_format(ts, 'yyyy-MM-dd HH')""".stripMargin
    val hExact = session(aqp = false).sql(hSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val hDf = session(aqp = true).sql(hSql)
    assert(isRewritten(hDf),
      s"sub-day date_format must fold (r17):\n${hDf.queryExecution.optimizedPlan}")
    val hEst = hDf.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(hEst.keySet.forall(_.matches("2024-01-0\\d \\d\\d")), s"hour keys: ${hEst.keySet.take(3)}")
    (hEst.keySet diff hExact.keySet).foreach { k =>
      assert(hEst(k) <= 5.0, s"sub-day phantom $k carries real mass: ${hEst(k)}")
    }
    (hExact.keySet diff hEst.keySet).foreach { k =>
      assert(hExact(k) <= 5.0, s"sub-day dropped $k has real rows: ${hExact(k)}")
    }
    (hEst.keySet intersect hExact.keySet).foreach { k =>
      assert(qerr(hEst(k), hExact(k)) <= 3.0 || math.abs(hEst(k) - hExact(k)) <= 10.0,
        s"sub-day cell $k: ${hEst(k)} vs ${hExact(k)}")
    }
    // the full 30-day hourly span (720 merged keys) folds whole under the
    // r17 interval cap — the dashboard shape item 7 names
    val hAll = session(aqp = true).sql(
      """SELECT date_format(ts, 'yyyy-MM-dd HH') AS h, count(*) AS n
         FROM events GROUP BY date_format(ts, 'yyyy-MM-dd HH')""".stripMargin)
    assert(isRewritten(hAll), "the 720-key hourly string dashboard must fold")
    assert(hAll.collect().length > 400)
    // r19: a SECOND-granular format FOLDS when the predicate-narrowed
    // span fits the interval cap at a 1-second step (20 min = 1200
    // buckets); cells are sparse at sf0.001, so the pin is the fold
    // itself plus well-formed keys and trivial divergence
    val sSql = """SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS s, count(*) AS n
                  FROM events
                  WHERE ts >= TIMESTAMP'2024-01-01 10:00:00'
                    AND ts < TIMESTAMP'2024-01-01 10:20:00'
                  GROUP BY date_format(ts, 'yyyy-MM-dd HH:mm:ss')""".stripMargin
    val sExact = session(aqp = false).sql(sSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val sDf = session(aqp = true).sql(sSql)
    assert(isRewritten(sDf),
      s"a narrowed second-granular format must fold (r19):\n${sDf.queryExecution.optimizedPlan}")
    val sEst = sDf.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    sEst.keys.foreach(k => assert(k.matches("2024-01-01 10:[0-1]\\d:\\d\\d"), s"second key $k"))
    (sEst.keySet diff sExact.keySet).foreach { k =>
      assert(sEst(k) <= 5.0, s"second-bucket phantom $k carries real mass: ${sEst(k)}")
    }
    (sExact.keySet diff sEst.keySet).foreach { k =>
      assert(sExact(k) <= 5.0, s"second-bucket dropped $k has real rows: ${sExact(k)}")
    }
    // fallbacks: an UNCAPPED second-granular span (2.6M one-second buckets
    // — the cap, not the parse, refuses it since r19); zone-rendering
    // formats; a sub-day format over a DAYS-modeled column (no matching
    // variant); the uncapped 7-year daily span (past the 2000-bucket
    // interval cap)
    val secFmt = session(aqp = true).sql(
      """SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS s, count(*) AS n
         FROM events GROUP BY date_format(ts, 'yyyy-MM-dd HH:mm:ss')""".stripMargin)
    assert(!isRewritten(secFmt), "an uncapped second-granular span must fall back")
    val subDayOverDays = session(aqp = true).sql(
      """SELECT date_format(o_orderdate, 'yyyy-MM-dd HH') AS h, count(*) AS n
         FROM orders WHERE o_orderdate < DATE'1992-02-01'
         GROUP BY date_format(o_orderdate, 'yyyy-MM-dd HH')""".stripMargin)
    assert(!isRewritten(subDayOverDays), "sub-day format over a days-modeled column must fall back")
    val fullSpan = session(aqp = true).sql(
      """SELECT date_format(o_orderdate, 'yyyy-MM') AS m, count(*) AS n
         FROM orders GROUP BY date_format(o_orderdate, 'yyyy-MM')""".stripMargin)
    assert(!isRewritten(fullSpan), "a ~2500-day span must fall back at the 2000-day interval cap")
  }

  test("per-bucket MIN/MAX fold; session windows honestly fall back") {
    // MIN/MAX over a num-modeled column composes with the calendar bucket
    // fold through the shared OutCol dispatch (realized-extreme under the
    // bucket's atoms); the extremes are support statistics, so they never
    // annotate — the same pinned contract as COUNT(DISTINCT)
    val sql = """SELECT year(o_orderdate) AS y, max(o_totalprice) AS mx,
                        min(o_totalprice) AS mn
                 FROM orders GROUP BY year(o_orderdate)""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (gMax, gMin) = session(aqp = false).sql(
      "SELECT max(o_totalprice), min(o_totalprice) FROM orders")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"per-bucket MIN/MAX must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (y, (mx, mn)) =>
      // realized extremes come from the model's (sampled) support under
      // the bucket's atoms. o_totalprice is near-INDEPENDENT of the order
      // date, so the conditional extreme of any year approaches the GLOBAL
      // extreme (per-bucket sample extremes are the noisy quantity here,
      // drifting 1.5–2× year to year at this SF) — the sound envelope is
      // [global, per-bucket truth], not a tight ratio on the bucket's own
      // sample extreme
      assert(est(y)._1 <= gMax + 1e-6 && est(y)._1 >= mx * 0.75,
        s"year $y max: ${est(y)._1} vs bucket $mx / global $gMax")
      assert(est(y)._2 >= gMin - 1e-6 && est(y)._2 <= mn * 1.35 + 1e-6,
        s"year $y min: ${est(y)._2} vs bucket $mn / global $gMin")
    }
    // session_window(ts, gap): boundaries are DATA-DEPENDENT (a session
    // ends where the next event is > gap away) — no fixed bucket can
    // express them, so the honest contract is exact execution, untouched
    val sess = session(aqp = true).sql(
      """SELECT session_window(ts, '30 minutes') AS w, count(*) AS n
         FROM events GROUP BY session_window(ts, '30 minutes')""".stripMargin)
    assert(!isRewritten(sess), "session windows must fall back (data-dependent boundaries)")
    assert(sess.count() > 0)
  }

  test("dayofmonth folds as per-month day slices") {
    // key k = one single-day interval per domain month that HAS day k —
    // Feb contributes no 30/31 interval, so key 31 only aggregates
    // 31-day months (the billing-cycle dashboard shape)
    val sql = """SELECT dayofmonth(o_orderdate) AS d, count(*) AS n
                 FROM orders GROUP BY dayofmonth(o_orderdate)""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"dayofmonth must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet.subsetOf((1 to 31).toSet))
    (est.keySet intersect exact.keySet).foreach(k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"dom $k: ${est(k)} vs ${exact(k)}"))
    // the full key set at this scale is 1..31 on both planes (orders spans
    // ~7 years of every month); day 31 must be present and ~7/12 the mass
    assert((exact.keySet diff est.keySet).forall(k => exact(k) <= 5.0))
    assert((est.keySet diff exact.keySet).forall(k => est(k) <= 5.0))
  }

  test("expressions over bucket keys fold by driver-side key evaluation") {
    // the bin-lo spelling: `GROUP BY floor(x/w)*w` — the grouping
    // expression is a deterministic scalar over ONE foldable bucket
    // expression, so each bucket key evaluates through it driver-side
    val sql = """SELECT floor(o_totalprice/100000)*100000 AS bin_lo, count(*) AS n
                 FROM orders GROUP BY floor(o_totalprice/100000)*100000""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"bin-lo keys must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet == exact.keySet, s"bin-lo keys: ${est.keySet} vs ${exact.keySet}")
    est.keys.foreach(k => assert(k % 100000 == 0, s"key $k must be a bin floor"))
    (est.keySet intersect exact.keySet).foreach(k =>
      assert(qerr(est(k), exact(k)) <= 1.5, s"bin_lo $k: ${est(k)} vs ${exact(k)}"))
    // a STRING-typed composed key: cast(year(d) AS string)
    val sDf = session(aqp = true).sql(
      """SELECT cast(year(o_orderdate) AS string) AS ys, count(*) AS n
         FROM orders GROUP BY cast(year(o_orderdate) AS string)""".stripMargin)
    assert(isRewritten(sDf), s"cast-to-string keys must fold:\n${sDf.queryExecution.optimizedPlan}")
    val sKeys = sDf.collect().map(_.getString(0)).toSet
    val sExact = session(aqp = false).sql(
      """SELECT cast(year(o_orderdate) AS string) AS ys, count(*) AS n
         FROM orders GROUP BY cast(year(o_orderdate) AS string)""".stripMargin)
      .collect().map(_.getString(0)).toSet
    assert(sKeys == sExact, s"string keys: $sKeys vs $sExact")
    // a NON-INJECTIVE outer MERGES buckets: boolean threshold over the bin
    // key groups every bin on each side into one row per truth value
    val bSql = """SELECT floor(o_totalprice/100000) >= 2 AS big, count(*) AS n
                  FROM orders GROUP BY floor(o_totalprice/100000) >= 2""".stripMargin
    val bExact = session(aqp = false).sql(bSql).collect()
      .map(r => r.getBoolean(0) -> r.getLong(1).toDouble).toMap
    val bDf = session(aqp = true).sql(bSql)
    assert(isRewritten(bDf), s"merged boolean keys must fold:\n${bDf.queryExecution.optimizedPlan}")
    val bEst = bDf.collect().map(r => r.getBoolean(0) -> r.getLong(1).toDouble).toMap
    assert(bEst.keySet == bExact.keySet && bEst.size == bEst.keySet.size,
      s"boolean merge must emit one row per truth value: $bEst")
    bEst.keys.foreach(k =>
      assert(qerr(bEst(k), bExact(k)) <= 1.5, s"big=$k: ${bEst(k)} vs ${bExact(k)}"))
    // composition over a calendar bucket with arithmetic: year(d)+1
    val yDf = session(aqp = true).sql(
      """SELECT year(o_orderdate)+1 AS y1, count(*) AS n
         FROM orders GROUP BY year(o_orderdate)+1""".stripMargin)
    assert(isRewritten(yDf), s"year+1 keys must fold:\n${yDf.queryExecution.optimizedPlan}")
    // fallbacks: an outer referencing a SECOND column, and two DISTINCT
    // foldable subexpressions in one grouping expression
    val twoCol = session(aqp = true).sql(
      """SELECT floor(o_totalprice/100000) + o_custkey AS k, count(*) AS n
         FROM orders GROUP BY floor(o_totalprice/100000) + o_custkey""".stripMargin)
    assert(!isRewritten(twoCol), "an outer referencing another column must fall back")
    val twoSub = session(aqp = true).sql(
      """SELECT floor(o_totalprice/100000) + floor(o_totalprice/50000) AS k, count(*) AS n
         FROM orders GROUP BY floor(o_totalprice/100000) + floor(o_totalprice/50000)""".stripMargin)
    assert(!isRewritten(twoSub), "two distinct foldable subexpressions must fall back")
  }

  test("two-calendar cross product folds: GROUP BY year(d), month(d)") {
    // the seasonal-matrix dashboard shape — each (year, month) key pair's
    // predicate is the MEET of the year bucket's range and the cyclic
    // month bucket's multi-interval (that year's month slice)
    val sql = """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n
                 FROM orders WHERE o_totalprice < 150000
                 GROUP BY year(o_orderdate), month(o_orderdate)""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"year × month must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2).toDouble).toMap
    // year × month cells at sf0.001 hold a handful of rows each — the
    // empty-cell boundary can disagree (the mixed 3-way test's convention);
    // any disagreement on a non-trivial cell is a real bug
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"y×m phantom cell $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"y×m dropped cell $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"y×m cell $k: ${est(k)} vs ${exact(k)}")
    }
    // calendar × calendar × dimension: the pair tuples compose with the
    // per-bucket dictionary enumeration like any single calendar bucket
    val sql2 = """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
                         o_orderpriority, count(*) AS n
                  FROM orders GROUP BY year(o_orderdate), quarter(o_orderdate),
                                       o_orderpriority""".stripMargin
    val exact2 = session(aqp = false).sql(sql2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)) -> r.getLong(3).toDouble).toMap
    val df2 = session(aqp = true).sql(sql2)
    assert(isRewritten(df2), s"year × quarter × dim must fold:\n${df2.queryExecution.optimizedPlan}")
    val est2 = df2.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)) -> r.getLong(3).toDouble).toMap
    (est2.keySet diff exact2.keySet).foreach { k =>
      assert(est2(k) <= 5.0, s"y×q×dim phantom cell $k carries real mass: ${est2(k)}")
    }
    (exact2.keySet diff est2.keySet).foreach { k =>
      assert(exact2(k) <= 5.0, s"y×q×dim dropped cell $k has real rows: ${exact2(k)}")
    }
    (est2.keySet intersect exact2.keySet).foreach { k =>
      assert(qerr(est2(k), exact2(k)) <= 3.0 || math.abs(est2(k) - exact2(k)) <= 10.0,
        s"y×q×dim cell $k: ${est2(k)} vs ${exact2(k)}")
    }
    // two DIFFERENT date columns over a join: the pair conjoins TWO
    // RangeUnion atoms instead of meeting interval sets on one
    val sql3 = """SELECT year(o_orderdate) AS y, quarter(l_shipdate) AS q, count(*) AS n
                  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                  WHERE l_quantity < 30
                  GROUP BY year(o_orderdate), quarter(l_shipdate)""".stripMargin
    val exact3 = session(aqp = false).sql(sql3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2).toDouble).toMap
    val df3 = session(aqp = true).sql(sql3)
    assert(isRewritten(df3), s"two date columns must fold:\n${df3.queryExecution.optimizedPlan}")
    val est3 = df3.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2).toDouble).toMap
    (est3.keySet diff exact3.keySet).foreach { k =>
      assert(est3(k) <= 5.0, s"two-col phantom cell $k carries real mass: ${est3(k)}")
    }
    (exact3.keySet diff est3.keySet).foreach { k =>
      assert(exact3(k) <= 5.0, s"two-col dropped cell $k has real rows: ${exact3(k)}")
    }
    (est3.keySet intersect exact3.keySet).foreach { k =>
      assert(qerr(est3(k), exact3(k)) <= 3.0 || math.abs(est3(k) - exact3(k)) <= 10.0,
        s"two-col cell $k: ${est3(k)} vs ${exact3(k)}")
    }
    // a cross product past the 400-tuple cap falls back (monthly trunc ×
    // day-of-week over a multi-year domain crosses it)
    val capped = session(aqp = true).sql(
      """SELECT date_trunc('month', o_orderdate) AS p, dayofweek(o_orderdate) AS d,
                count(*) AS n
         FROM orders GROUP BY date_trunc('month', o_orderdate), dayofweek(o_orderdate)""".stripMargin)
    assert(!isRewritten(capped), "a cap-exceeded bucket cross product must fall back")
    // THREE calendar expressions fold since r15 — the per-column interval
    // meets prune the cube (each month meets exactly its own quarter:
    // ~84 surviving tuples, well under the cap)
    val sql4 = """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
                         month(o_orderdate) AS m, count(*) AS n
                  FROM orders GROUP BY year(o_orderdate), quarter(o_orderdate),
                                       month(o_orderdate)""".stripMargin
    val exact4 = session(aqp = false).sql(sql4).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3).toDouble).toMap
    val df4 = session(aqp = true).sql(sql4)
    assert(isRewritten(df4), s"year × quarter × month must fold:\n${df4.queryExecution.optimizedPlan}")
    val est4 = df4.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3).toDouble).toMap
    // quarter is DERIVED from month, so no tuple may pair a month with a
    // foreign quarter — the meet must kill those structurally
    est4.keys.foreach { case (_, q, m) =>
      assert((m - 1) / 3 + 1 == q, s"month $m emitted under foreign quarter $q")
    }
    (est4.keySet diff exact4.keySet).foreach { k =>
      assert(est4(k) <= 5.0, s"y×q×m phantom cell $k carries real mass: ${est4(k)}")
    }
    (exact4.keySet diff est4.keySet).foreach { k =>
      assert(exact4(k) <= 5.0, s"y×q×m dropped cell $k has real rows: ${exact4(k)}")
    }
    (est4.keySet intersect exact4.keySet).foreach { k =>
      assert(qerr(est4(k), exact4(k)) <= 3.0 || math.abs(est4(k) - exact4(k)) <= 10.0,
        s"y×q×m cell $k: ${est4(k)} vs ${exact4(k)}")
    }
    // a genuinely fine TRIPLE still caps (year × month × dayofweek ≈ 588)
    val threeCapped = session(aqp = true).sql(
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
                dayofweek(o_orderdate) AS d, count(*) AS n
         FROM orders GROUP BY year(o_orderdate), month(o_orderdate),
                              dayofweek(o_orderdate)""".stripMargin)
    assert(!isRewritten(threeCapped), "a cap-exceeded calendar triple must fall back")
  }

  test("answerable aggregates fold inside UNION ALL; constant tag columns ride along") {
    // transformUp folds each branch's Aggregate independently — the
    // tagged-bucket dashboard idiom becomes a Union of LocalRelations,
    // zero scans total; the literal tag is a ConstOut riding the fold
    val sql = """SELECT 'lo' AS bucket, count(*) AS n FROM lineitem WHERE l_quantity < 10
                 UNION ALL
                 SELECT 'hi' AS bucket, count(*) AS n FROM lineitem WHERE l_quantity > 40""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"UNION ALL branches must fold:\n${df.queryExecution.optimizedPlan}")
    val est = df.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet == exact.keySet, s"buckets ${est.keySet} vs ${exact.keySet}")
    exact.foreach { case (k, v) =>
      assert(qerr(est(k), v) <= 1.5, s"bucket $k: ${est(k)} vs $v")
    }
    // grouped with a constant column: every group carries the tag
    val gSql = """SELECT 'q24' AS tag, l_returnflag, count(*) AS n FROM lineitem
                  WHERE l_quantity < 24 GROUP BY l_returnflag""".stripMargin
    val gExact = session(aqp = false).sql(gSql).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    val gDf = session(aqp = true).sql(gSql)
    assert(isRewritten(gDf), s"constant tag must ride the grouped fold:\n${gDf.queryExecution.optimizedPlan}")
    val gEst = gDf.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    assert(gEst.keySet == gExact.keySet, s"tagged groups ${gEst.keySet} vs ${gExact.keySet}")
    gExact.foreach { case (k, v) =>
      assert(qerr(gEst(k), v) <= 1.5, s"tagged group $k: ${gEst(k)} vs $v")
    }
  }

  test("first aqp-enabled query against an untrained directory trains inside planning, no deadlock") {
    // the planner-re-entrancy regression: the AQP rule consults the
    // ensemble DURING optimization; if that triggers training, training's
    // own Spark queries (sample scans, count(*) row scales) must NOT
    // re-enter the rule — before the training-session isolation this
    // recursed into concurrent re-trainings that deadlocked the awaits,
    // hanging the FIRST aqp query any user ran against a fresh directory
    import org.scalatest.concurrent.TimeLimits.failAfter
    import org.scalatest.concurrent.{Signaler, ThreadSignaler}
    import org.scalatest.time.{Seconds, Span}
    implicit val signaler: Signaler = ThreadSignaler
    val dir = java.nio.file.Files.createTempDirectory("graft-aqp-firsttouch-")
    Seq("lineitem", "orders", "customer", "part", "supplier", "documents").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/$t.parquet"), dir.resolve(s"$t.parquet"))
    }
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.spn.sfDir", dir.toString)
    s2.conf.set("spark.graft.aqp.enabled", "true")
    s2.read.parquet(s"$dir/lineitem.parquet").createOrReplaceTempView("lineitem")
    failAfter(Span(300, Seconds)) {
      val df = s2.sql("SELECT count(*) AS n FROM lineitem WHERE l_quantity < 24")
      assert(isRewritten(df),
        s"the first-touch query must train and fold:\n${df.queryExecution.optimizedPlan}")
      assert(df.head.getLong(0) > 0)
    }
  }

  test("unanswerable shapes fall back to the exact plan, untouched") {
    val s2 = session(aqp = true)
    // LIKE on an UNMODELED string column: no dictionary to close over
    val like = s2.sql("SELECT count(*) AS n FROM customer WHERE c_name LIKE 'C%'")
    assert(!isRewritten(like), "LIKE on an unmodeled column must fall back to exact")
    assert(like.head.getLong(0) ==
      session(aqp = false).sql("SELECT count(*) AS n FROM customer WHERE c_name LIKE 'C%'")
        .head.getLong(0))
    // MIN over an UNMODELED numeric column: no realized-value support
    val mn = s2.sql("SELECT min(l_linenumber) AS m FROM lineitem")
    assert(!isRewritten(mn), "MIN on an unmodeled column must fall back to exact")
    // undeclared join edge: the schema graph doesn't relate these keys, so
    // estimating it as the FK join would be a wrong ANSWER — must fall back
    val badJoin = s2.sql(
      "SELECT count(*) AS n FROM lineitem JOIN orders ON l_partkey = o_orderkey")
    assert(!isRewritten(badJoin), "non-FK equi join must fall back to exact")
    // unmodeled column in the filter
    val unmodeled = s2.sql("SELECT count(*) AS n FROM lineitem WHERE l_suppkey < 5")
    assert(!isRewritten(unmodeled))
    // a NARROWING cast truncates per row before summing — outside the class
    val narrow = s2.sql("SELECT sum(cast(l_extendedprice AS int)) AS s FROM lineitem")
    assert(!isRewritten(narrow), "narrowing casts must fall back to exact")
    // an explicit IS NOT NULL on an unmodeled key column with NO join is a
    // real predicate the model cannot see (the pushdown-implied form under
    // an inner join still folds — the FK join test above proves it)
    val keyNn = s2.sql("SELECT count(*) AS n FROM lineitem WHERE l_orderkey IS NOT NULL")
    assert(!isRewritten(keyNn), "bare key IS NOT NULL must fall back to exact")
    // a CACHED filtered DataFrame with an UNDERSTOOD baked filter now
    // FOLDS — the baked conjuncts conjoin the estimation predicates like
    // an uncached Filter's (r14); see the cached-view test for the full
    // matrix. An UN-UNDERSTOOD baked filter must still fall back and
    // answer exactly through the cache.
    val filtered = s2.read.parquet(s"$tmpSf/lineitem.parquet")
      .filter(col("l_quantity") < 5).cache()
    try {
      filtered.createOrReplaceTempView("lineitem_cached")
      val viaCache = s2.sql("SELECT count(*) AS n FROM lineitem_cached")
      assert(isRewritten(viaCache),
        s"cached filtered view must fold:\n${viaCache.queryExecution.optimizedPlan}")
      val exactN = session(aqp = false).sql(
        "SELECT count(*) AS n FROM lineitem WHERE l_quantity < 5").head.getLong(0)
      assert(qerr(math.max(viaCache.head.getLong(0).toDouble, 1.0), math.max(exactN.toDouble, 1.0)) <= 1.5,
        s"cached-view fold: ${viaCache.head.getLong(0)} vs $exactN")
    } finally filtered.unpersist(blocking = true)
    // un-understood baked filter (multi-column arithmetic): falls back
    val opaqueCache = s2.read.parquet(s"$tmpSf/lineitem.parquet")
      .filter(col("l_quantity") + col("l_tax") > 5).cache()
    try {
      opaqueCache.createOrReplaceTempView("lineitem_opaque_cached")
      val viaOpaque = s2.sql("SELECT count(*) AS n FROM lineitem_opaque_cached")
      assert(!isRewritten(viaOpaque), "un-understood baked filter must fall back")
      val exactO = session(aqp = false).sql(
        "SELECT count(*) AS n FROM lineitem WHERE l_quantity + l_tax > 5").head.getLong(0)
      assert(viaOpaque.head.getLong(0) == exactO)
    } finally opaqueCache.unpersist(blocking = true)
    // a baked filter COMPOSES with query-time predicates: the cached
    // view's atoms and the query's own conjoin
    val composed = s2.read.parquet(s"$tmpSf/lineitem.parquet")
      .filter(col("l_quantity") < 30).cache()
    try {
      composed.createOrReplaceTempView("lineitem_q30_cached")
      val viaBoth = s2.sql(
        """SELECT l_returnflag, count(*) AS n FROM lineitem_q30_cached
           WHERE l_discount < 0.05 GROUP BY l_returnflag""".stripMargin)
      assert(isRewritten(viaBoth),
        s"baked + query predicates must fold:\n${viaBoth.queryExecution.optimizedPlan}")
      val exactB = session(aqp = false).sql(
        """SELECT l_returnflag, count(*) AS n FROM lineitem
           WHERE l_quantity < 30 AND l_discount < 0.05 GROUP BY l_returnflag""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
      val estB = viaBoth.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
      assert(estB.keySet == exactB.keySet, s"cached-view group keys: ${estB.keySet} vs ${exactB.keySet}")
      exactB.foreach { case (k, v) =>
        assert(qerr(estB(k), v) <= 1.5, s"cached-view group $k: ${estB(k)} vs $v")
      }
    } finally composed.unpersist(blocking = true)
  }

  test("multi-interval atoms: !=, NOT IN, and single-column ORs fold without disjunction slots") {
    def checkFold(sql: String, bound: Double = 1.5): Unit = {
      val exact = session(aqp = false).sql(sql).collect()
        .map(r => (0 until r.length - 1).map(r.get(_).toString) -> r.getLong(r.length - 1).toDouble).toMap
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df), s"must fold for [$sql]:\n${df.queryExecution.optimizedPlan}")
      val est = df.collect()
        .map(r => (0 until r.length - 1).map(r.get(_).toString) -> r.getLong(r.length - 1).toDouble).toMap
      assert(est.keySet == exact.keySet, s"keys for [$sql]: ${est.keySet} vs ${exact.keySet}")
      exact.foreach { case (k, v) =>
        assert(qerr(math.max(est(k), 1.0), math.max(v, 1.0)) <= bound,
          s"fold for [$sql] key $k: ${est(k)} vs $v")
      }
    }
    // numeric NOT IN: the gaps between the sorted points, one plain atom
    // (reference ranges.py::NumericRange list-of-intervals parity)
    checkFold("SELECT count(*) AS n FROM lineitem WHERE l_quantity NOT IN (5, 10, 15)")
    // a single-column range disjunction is a range UNION, not an OR slot
    checkFold(
      """SELECT l_linestatus, count(*) AS n FROM lineitem
         WHERE l_quantity < 5 OR l_quantity > 45 GROUP BY l_linestatus""".stripMargin)
    // ...which is what admits it inside a FILTER clause (conjunctive atom lists)
    checkFold(
      """SELECT l_linestatus, count(*) FILTER (WHERE l_quantity < 5 OR l_quantity > 45) AS n
         FROM lineitem GROUP BY l_linestatus""".stripMargin)
    // the slot-budget proof: numeric != plus a single-column interval OR
    // stacked with THREE genuinely multi-column disjunctions (the whole
    // slot budget) still folds — before multi-interval atoms the != or the
    // single-column OR would have burned a fourth slot and fallen back
    checkFold(
      """SELECT count(*) AS n FROM lineitem
         WHERE l_quantity != 24
           AND (l_quantity < 10 OR l_quantity > 40)
           AND (l_quantity < 20 OR l_discount > 0.05)
           AND (l_extendedprice < 40000 OR l_discount < 0.08)
           AND (l_quantity > 5 OR l_extendedprice > 20000)""".stripMargin, bound = 2.0)
    // mixed shapes on ONE column conjoin exactly: IN ∧ != intersects the
    // point set against the interval complement (kills 10, keeps the rest)
    checkFold("SELECT count(*) AS n FROM lineitem WHERE l_quantity IN (5, 10, 15) AND l_quantity != 10")
    // r17 CNF pre-simplification: an INTERLEAVED two-column disjunct list
    // regroups by column (OR is commutative/associative under 3VL), so the
    // same-column branches absorb into one AnyOf atom and the conjunct
    // costs ONE slot — previously the nested multi-column Or fell back
    checkFold(
      """SELECT count(*) AS n FROM lineitem
         WHERE l_quantity < 5 OR l_discount > 0.08 OR l_quantity > 45""".stripMargin)
    checkFold(
      """SELECT l_linestatus, count(*) AS n FROM lineitem
         WHERE (l_quantity < 5 OR l_discount > 0.08 OR l_quantity > 45 OR l_discount < 0.01)
           AND l_extendedprice > 1000
         GROUP BY l_linestatus""".stripMargin)
    // three distinct columns in ONE disjunction FOLD since r18 (full
    // per-group inclusion–exclusion, 7 signed terms); the dedicated
    // n-branch cap test pins the fold/fallback boundary
    val threeCol = session(aqp = true).sql(
      """SELECT count(*) AS n FROM lineitem
         WHERE l_quantity < 5 OR l_discount > 0.08 OR l_extendedprice > 90000""".stripMargin)
    assert(isRewritten(threeCol), "a 3-column single disjunction folds (r18)")
    val threeColExact = session(aqp = false).sql(
      """SELECT count(*) AS n FROM lineitem
         WHERE l_quantity < 5 OR l_discount > 0.08 OR l_extendedprice > 90000""".stripMargin)
      .head.getLong(0).toDouble
    assert(qerr(math.max(threeCol.head.getLong(0).toDouble, 1.0),
      math.max(threeColExact, 1.0)) <= 1.3)
  }

  test("corpus dashboard queries over the documents table fold from the model") {
    // the LLM-pipeline table is modeled like any TPC-H slice (n_chars num,
    // lang/source cat): "docs per language", "avg length per source" — the
    // corpus-quality dashboard — answers zero-scan under aqp.enabled
    val cases = Seq(
      """SELECT lang, count(*) AS n, avg(n_chars) AS chars
         FROM documents GROUP BY lang""".stripMargin,
      """SELECT lang, source, count(*) AS n FROM documents
         WHERE n_chars > 200 GROUP BY lang, source""".stripMargin,
      "SELECT count(*) AS n FROM documents WHERE n_chars BETWEEN 100 AND 500 AND lang != 'en'")
    cases.foreach { sql =>
      val exact = session(aqp = false).sql(sql).collect()
      val df = session(aqp = true).sql(sql)
      assert(isRewritten(df), s"corpus query must fold for [$sql]:\n${df.queryExecution.optimizedPlan}")
      val keyCols = df.schema.fields.indexWhere(_.name == "n")
      val ex = exact.map(r => (0 until keyCols).map(r.getString) -> r.getLong(keyCols).toDouble).toMap
      val es = df.collect().map(r => (0 until keyCols).map(r.getString) -> r.getLong(keyCols).toDouble).toMap
      // fine lang × source cells over the small corpus slice: universe
      // disagreement is tolerable only at the empty-cell boundary (the
      // 3-way mixed-calendar test's convention)
      (es.keySet diff ex.keySet).foreach { k =>
        assert(es(k) <= 5.0, s"corpus phantom group $k carries real mass for [$sql]: ${es(k)}")
      }
      (ex.keySet diff es.keySet).foreach { k =>
        assert(ex(k) <= 5.0, s"corpus dropped group $k has real rows for [$sql]: ${ex(k)}")
      }
      // lang x source cells hold a handful of docs each at this SF —
      // sparse-cell slack (the mixed-calendar convention); the phantom/
      // dropped-group gates above are the strict universe check
      (es.keySet intersect ex.keySet).foreach { k =>
        assert(qerr(math.max(es(k), 1.0), math.max(ex(k), 1.0)) <= 3.0 || math.abs(es(k) - ex(k)) <= 10.0,
          s"corpus group $k for [$sql]: ${es(k)} vs ${ex(k)}")
      }
    }
  }

  test("spn_last_fold() surfaces the fold's per-group 95% intervals (annotate opt-in)") {
    val s2 = session(aqp = true)
    s2.conf.set("spark.graft.aqp.annotate", "true")
    val sql = """SELECT l_returnflag, count(*) AS n, sum(l_extendedprice) AS s,
                        avg(l_extendedprice) AS a,
                        sum(l_extendedprice * (1 - l_discount)) AS rev,
                        count(*) FILTER (WHERE l_linestatus = 'F') AS nf,
                        avg(l_extendedprice * (1 - l_discount)) AS ae
                 FROM lineitem WHERE l_quantity < 24 GROUP BY l_returnflag""".stripMargin
    val df = s2.sql(sql)
    assert(isRewritten(df), s"annotated query must fold:\n${df.queryExecution.optimizedPlan}")
    df.collect()
    val tvf = s2.sql("SELECT * FROM spn_last_fold()").collect()
    assert(tvf.nonEmpty, "annotation must record rows")
    // conjunctive channel: measured-coverage CIs, bias_blind=false (r19)
    assert(tvf.forall(!_.getAs[Boolean]("bias_blind")),
      "a conjunctive fold must not flag bias_blind")
    def tvfCol(c: String): Map[String, (Double, Double, Double)] =
      tvf.filter(_.getString(1) == c)
        .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // the intervals must EQUAL the explicit model surface's — same
    // estimator calls, deterministic models, so exact double equality
    def viaTvf(call: String): Map[String, (Double, Double, Double)] =
      s2.sql(s"SELECT * FROM $call").collect()
        .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(tvfCol("n") == viaTvf("spn_groupby('lineitem', 'l_returnflag', 'l_quantity < 24')"),
      "count intervals must equal spn_groupby's")
    assert(tvfCol("s") == viaTvf(
      "spn_groupby_sum('lineitem', 'l_returnflag', 'l_extendedprice', 'l_quantity < 24')"),
      "sum intervals must equal spn_groupby_sum's")
    assert(tvfCol("a") == viaTvf(
      "spn_groupby_avg('lineitem', 'l_returnflag', 'l_extendedprice', 'l_quantity < 24')"),
      "avg intervals must equal spn_groupby_avg's")
    tvf.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(4),
        s"lo <= est <= hi must hold: $r")
    }
    // the REVENUE shape (multi-term linear SUM) and the FILTER-clause count
    // annotate too: point values must equal the folded answers
    val foldedRows = df.collect()
      .map(r => r.getString(0) -> ((r.getDouble(4), r.getLong(5).toDouble))).toMap
    foldedRows.foreach { case (k, (rev, nf)) =>
      val (revEst, revLo, revHi) = tvfCol("rev")(k)
      assert(math.abs(revEst - rev) < 1e-6 * math.max(1.0, math.abs(rev)),
        s"revenue annotation for $k: $revEst vs folded $rev")
      assert(revLo <= revEst && revEst <= revHi)
      val (nfEst, _, _) = tvfCol("nf")(k)
      assert(math.round(nfEst).toDouble == nf,
        s"FILTER-count annotation for $k: $nfEst vs folded $nf")
    }
    // AVG of a linear form annotates by the interval quotient: the point
    // value equals the fold's own, the interval covers it
    val aeFold = df.collect().map(r => r.getString(0) -> r.getDouble(6)).toMap
    aeFold.foreach { case (k, v) =>
      val (aeEst, aeLo, aeHi) = tvfCol("ae")(k)
      assert(math.abs(aeEst - v) < 1e-6 * math.max(1.0, math.abs(v)),
        s"avg-expr annotation for $k: $aeEst vs folded $v")
      assert(aeLo <= aeEst && aeEst <= aeHi, s"avg-expr interval for $k: [$aeLo, $aeHi]")
    }
    // the folded point answers sit inside their own intervals
    val folded = df.collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    tvfCol("n").foreach { case (k, (_, lo, hi)) =>
      assert(folded(k) >= lo - 1 && folded(k) <= hi + 1,
        s"folded count for $k (${folded(k)}) outside its CI [$lo, $hi]")
    }
    // a SINGLE disjunction annotates too — the inclusion-exclusion
    // estimators carry CIs, and the point value equals the fold's own
    val orDf = s2.sql(
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity < 5 OR l_discount > 0.07")
    assert(isRewritten(orDf))
    val orFolded = orDf.head.getLong(0).toDouble
    val orTvf = s2.sql("SELECT * FROM spn_last_fold()").collect()
    assert(orTvf.length == 1 && orTvf.head.getString(0) == "n")
    assert(math.round(orTvf.head.getDouble(1)).toDouble == orFolded,
      s"single-OR annotation est ${orTvf.head.getDouble(1)} vs folded $orFolded")
    assert(orTvf.head.getDouble(2) <= orTvf.head.getDouble(1) &&
      orTvf.head.getDouble(1) <= orTvf.head.getDouble(3))
    // the legacy single-OR inclusion-exclusion keeps its coverage gates:
    // not bias_blind
    assert(!orTvf.head.getAs[Boolean]("bias_blind"),
      "single-OR fold must not flag bias_blind")
    // a MULTI-disjunction fold annotates through the signed expansion:
    // conservative interval combination (signs flip bounds, intervals
    // add), point values equal to the fold's own
    val or2Df = s2.sql(
      """SELECT count(*) AS n, sum(l_extendedprice) AS s FROM lineitem
         WHERE (l_quantity < 5 OR l_discount > 0.07)
           AND (l_extendedprice < 10000 OR l_tax > 0.06)""".stripMargin)
    assert(isRewritten(or2Df))
    val or2Row = or2Df.head
    val or2Raw = s2.sql("SELECT * FROM spn_last_fold()").collect()
    // the multi-OR signed expansion's intervals are model-bias-blind —
    // the r19 honesty contract flags them (BENCH_SCALING r18: nominal-95%
    // coverage 4/8 at sf10)
    assert(or2Raw.forall(_.getAs[Boolean]("bias_blind")),
      "a multi-OR signed-expansion fold must flag bias_blind")
    val or2Tvf = or2Raw
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(math.round(or2Tvf("n")._1).toDouble == or2Row.getLong(0).toDouble,
      s"multi-OR count annotation ${or2Tvf("n")._1} vs folded ${or2Row.getLong(0)}")
    assert(or2Tvf("n")._2 <= or2Tvf("n")._1 && or2Tvf("n")._1 <= or2Tvf("n")._3,
      s"multi-OR count interval must cover its point: ${or2Tvf("n")}")
    assert(math.abs(or2Tvf("s")._1 - or2Row.getDouble(1)) <=
      1e-6 * math.max(1.0, math.abs(or2Row.getDouble(1))),
      s"multi-OR sum annotation ${or2Tvf("s")._1} vs folded ${or2Row.getDouble(1)}")
    // STALENESS: an Aggregate the rule sees but does NOT fold clears the
    // tag's annotation — a fallback query can never serve the previous
    // query's intervals as its own
    s2.sql("SELECT count(*) AS n FROM lineitem WHERE l_suppkey < 5").collect()
    val e = intercept[Throwable] { s2.sql("SELECT * FROM spn_last_fold()").collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("no annotated fold")),
      s"a non-folding aggregate must clear the annotation: $e")
    // GROUPING SETS annotate per set, grouped-out key columns SQL NULL
    val setsDf = s2.sql(
      """SELECT l_returnflag, count(*) AS n FROM lineitem
         WHERE l_quantity < 24 GROUP BY ROLLUP(l_returnflag)""".stripMargin)
    assert(isRewritten(setsDf))
    val setsFold = setsDf.collect().map(r =>
      (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1).toDouble).toMap
    val setsTvf = s2.sql("SELECT * FROM spn_last_fold()").collect()
    assert(setsTvf.length == setsFold.size,
      s"per-set annotation rows ${setsTvf.length} vs folded ${setsFold.size}")
    setsTvf.foreach { r =>
      val k = if (r.isNullAt(0)) null else r.getString(0)
      assert(math.round(r.getDouble(2)).toDouble == setsFold(k),
        s"set annotation for $k: ${r.getDouble(2)} vs folded ${setsFold(k)}")
      assert(r.getDouble(3) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(4))
    }
    // CALENDAR buckets annotate per bucket (key stringified), with the
    // fold's own bucket gate as the row universe
    val calDf = s2.sql(
      """SELECT year(o_orderdate) AS y, count(*) AS n FROM orders
         WHERE o_totalprice < 150000 GROUP BY year(o_orderdate)""".stripMargin)
    assert(isRewritten(calDf))
    val calFold = calDf.collect().map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    val calTvf = s2.sql("SELECT * FROM spn_last_fold()").collect()
    assert(calTvf.length == calFold.size,
      s"per-bucket annotation rows ${calTvf.length} vs folded ${calFold.size}")
    calTvf.foreach { r =>
      assert(math.round(r.getDouble(2)).toDouble == calFold(r.getString(0)),
        s"bucket ${r.getString(0)} annotation ${r.getDouble(2)} vs folded ${calFold(r.getString(0))}")
    }
    // PER-TAG handles: two annotated folds under different tags each keep
    // their own intervals — the session-global last-write race is gone
    s2.conf.set("spark.graft.aqp.tag", "q1")
    val q1 = s2.sql("SELECT count(*) AS n FROM lineitem WHERE l_quantity < 10")
    assert(isRewritten(q1))
    val v1 = q1.head.getLong(0).toDouble
    s2.conf.set("spark.graft.aqp.tag", "q2")
    val q2 = s2.sql("SELECT count(*) AS n FROM lineitem WHERE l_quantity > 40")
    assert(isRewritten(q2))
    val v2 = q2.head.getLong(0).toDouble
    val t2 = s2.sql("SELECT est FROM spn_last_fold()").head.getDouble(0)
    s2.conf.set("spark.graft.aqp.tag", "q1")
    val t1 = s2.sql("SELECT est FROM spn_last_fold()").head.getDouble(0)
    assert(math.round(t1).toDouble == v1, s"tag q1 annotation $t1 vs folded $v1")
    assert(math.round(t2).toDouble == v2, s"tag q2 annotation $t2 vs folded $v2")
    s2.conf.unset("spark.graft.aqp.tag")
  }

  test("cross-column disjunctions compose with calendar and histogram folds") {
    // the dashboard slicer shape (r15): `WHERE a='x' OR b>10` with a
    // calendar/histogram grouping — each bucket's range/point conjunct
    // distributes into both OR branches through the shape dispatch, the
    // per-bucket answer is inclusion-exclusion (reference
    // spn_ensemble.py::evaluate_group_by_… composes group enumeration
    // with arbitrary factor predicates the same way)
    def cellCheck[K](est: Map[K, Double], exact: Map[K, Double], what: String): Unit = {
      (est.keySet diff exact.keySet).foreach { k =>
        assert(est(k) <= 5.0, s"$what phantom cell $k carries real mass: ${est(k)}")
      }
      (exact.keySet diff est.keySet).foreach { k =>
        assert(exact(k) <= 5.0, s"$what dropped cell $k has real rows: ${exact(k)}")
      }
      (est.keySet intersect exact.keySet).foreach { k =>
        assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
          s"$what cell $k: ${est(k)} vs ${exact(k)}")
      }
    }
    // single cross-column OR × year buckets (count + gated sum)
    val sql = """SELECT year(o_orderdate) AS y, count(*) AS n, sum(o_totalprice) AS rev
                 FROM orders WHERE o_orderstatus = 'F' OR o_totalprice < 50000
                 GROUP BY year(o_orderdate)""".stripMargin
    val exact = session(aqp = false).sql(sql).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val df = session(aqp = true).sql(sql)
    assert(isRewritten(df), s"OR × year must fold:\n${df.queryExecution.optimizedPlan}")
    cellCheck(df.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap, exact, "OR×year")
    // single OR × the two-calendar cross product
    val sql2 = """SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q, count(*) AS n
                  FROM orders WHERE o_orderstatus = 'F' OR o_totalprice < 50000
                  GROUP BY year(o_orderdate), quarter(o_orderdate)""".stripMargin
    val exact2 = session(aqp = false).sql(sql2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2).toDouble).toMap
    val df2 = session(aqp = true).sql(sql2)
    assert(isRewritten(df2), s"OR × year×quarter must fold:\n${df2.queryExecution.optimizedPlan}")
    cellCheck(df2.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2).toDouble).toMap,
      exact2, "OR×y×q")
    // single OR × calendar × dictionary dimension (per-bucket grouped IE)
    val sql3 = """SELECT year(o_orderdate) AS y, o_orderpriority, count(*) AS n
                  FROM orders WHERE o_orderstatus = 'F' OR o_totalprice < 50000
                  GROUP BY year(o_orderdate), o_orderpriority""".stripMargin
    val exact3 = session(aqp = false).sql(sql3).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    val df3 = session(aqp = true).sql(sql3)
    assert(isRewritten(df3), s"OR × year × dim must fold:\n${df3.queryExecution.optimizedPlan}")
    cellCheck(df3.collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2).toDouble).toMap,
      exact3, "OR×y×dim")
    // TWO independent disjunctions × year buckets: the 9-term signed
    // product expansion runs per bucket
    val sql4 = """SELECT year(l_shipdate) AS y, count(*) AS n FROM lineitem
                  WHERE (l_returnflag = 'A' OR l_discount > 0.07)
                    AND (l_linestatus = 'F' OR l_tax > 0.06)
                  GROUP BY year(l_shipdate)""".stripMargin
    val exact4 = session(aqp = false).sql(sql4).collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap
    val df4 = session(aqp = true).sql(sql4)
    assert(isRewritten(df4), s"two ORs × year must fold:\n${df4.queryExecution.optimizedPlan}")
    cellCheck(df4.collect().map(r => r.getInt(0) -> r.getLong(1).toDouble).toMap,
      exact4, "2OR×year")
    // FOUR independent disjunctions stay past the accuracy cap: fallback
    val four = session(aqp = true).sql(
      """SELECT year(l_shipdate) AS y, count(*) AS n FROM lineitem
         WHERE (l_returnflag = 'A' OR l_discount > 0.07)
           AND (l_linestatus = 'F' OR l_tax > 0.06)
           AND (l_quantity < 10 OR l_extendedprice > 50000)
           AND (l_returnflag = 'R' OR l_quantity > 40)
         GROUP BY year(l_shipdate)""".stripMargin)
    assert(!isRewritten(four), "four multi-column ORs × calendar must fall back")
    // the annotation channel rides the OR composition: per-bucket
    // inclusion-exclusion intervals, point values EQUAL to the fold's own
    val sAnn = session(aqp = true)
    sAnn.conf.set("spark.graft.aqp.annotate", "true")
    val annDf = sAnn.sql(sql) // the OR × year count+sum query above
    assert(isRewritten(annDf))
    val annFold = annDf.collect().map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    val annTvf = sAnn.sql("SELECT * FROM spn_last_fold()").collect()
      .filter(_.getString(1) == "n")
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(annTvf.keySet == annFold.keySet,
      s"OR×year annotation buckets ${annTvf.keySet} vs folded ${annFold.keySet}")
    annFold.foreach { case (k, v) =>
      val (est, lo, hi) = annTvf(k)
      assert(math.round(est).toDouble == v, s"OR×year bucket $k annotation $est vs folded $v")
      assert(lo <= est && est <= hi, s"OR×year bucket $k interval [$lo, $hi] must cover $est")
    }
  }

  test("support-enumeration outputs never annotate: the documented CI contract") {
    // COUNT(DISTINCT)/MIN/MAX fold via set/extreme enumerations — not
    // scaled expectations — so spn_last_fold() deliberately carries NO
    // interval rows for them (their failure mode, sampled support missing
    // realized values, is one-sided and a symmetric CI would misstate
    // it); other outputs of the SAME fold annotate normally
    val s2 = session(aqp = true)
    s2.conf.set("spark.graft.aqp.annotate", "true")
    val df = s2.sql(
      """SELECT l_returnflag, count(*) AS n, count(DISTINCT l_linestatus) AS d,
                max(l_quantity) AS mx
         FROM lineitem WHERE l_quantity < 24 GROUP BY l_returnflag""".stripMargin)
    assert(isRewritten(df), s"mixed outputs must fold:\n${df.queryExecution.optimizedPlan}")
    df.collect()
    val tvf = s2.sql("SELECT * FROM spn_last_fold()").collect()
    assert(tvf.map(_.getString(1)).toSet == Set("n"),
      s"only the count may annotate, got ${tvf.map(_.getString(1)).toSet}")
    assert(tvf.nonEmpty, "the fold's count output must still annotate")
    // scalar shape: same contract
    val dfS = s2.sql(
      """SELECT count(*) AS n, count(DISTINCT l_quantity) AS d, min(l_quantity) AS mn
         FROM lineitem WHERE l_quantity < 24""".stripMargin)
    assert(isRewritten(dfS))
    dfS.collect()
    // scalar folds have no group column: the TVF row is (name, est, lo, hi)
    val tvfS = s2.sql("SELECT * FROM spn_last_fold()").collect()
    assert(tvfS.map(_.getString(0)).toSet == Set("n"),
      s"scalar: only the count may annotate, got ${tvfS.map(_.getString(0)).toSet}")
    s2.conf.unset("spark.graft.aqp.annotate")
  }
}
