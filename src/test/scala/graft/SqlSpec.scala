package graft

import graft.rspn._
import graft.rspn.SqlParser._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-text entry point (reference evaluation/utils.py::parse_query): the
  * same SQL string runs on the exact plane via spark.sql and on the model
  * plane via SqlEstimate — q-error ties them together, the reference's own
  * evaluation methodology.
  */
class SqlSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ens = Ensemble.get(spark, sf)

  private lazy val views: Unit =
    Seq("lineitem", "orders", "customer", "part").foreach { t =>
      schema.Tables(spark, sf, t).createOrReplaceTempView(t)
    }

  private def exactScalar(sql: String): Double = {
    views
    val r = spark.sql(sql).head()
    r.get(0) match {
      case l: Long   => l.toDouble
      case d: Double => d
      case x         => x.toString.toDouble
    }
  }

  private def qerr(est: Double, exact: Double): Double = {
    val e = math.max(est, 1.0); val x = math.max(exact, 1.0)
    math.max(e / x, x / e)
  }

  private def estScalar(sql: String): Double =
    SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Scalar(e) => e.value
      case _                     => fail("expected scalar")
    }

  private val scalarQueries = Seq(
    // single-table COUNTs (marginals are exact in the model; 1.5 = headroom)
    ("SELECT COUNT(*) FROM lineitem WHERE l_quantity < 25", 1.5),
    ("SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_discount <= 0.05", 1.5),
    ("SELECT COUNT(*) FROM lineitem WHERE l_returnflag IN ('A', 'R')", 1.5),
    ("SELECT COUNT(*) FROM lineitem WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'", 1.5),
    ("SELECT COUNT(*) FROM orders WHERE o_totalprice > 100000", 1.5),
    ("SELECT COUNT(*) FROM customer WHERE c_mktsegment = 'BUILDING'", 1.5),
    // join COUNTs (2-way single-SPN, 3-way chain)
    ("SELECT COUNT(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'", 2.5),
    ("SELECT COUNT(*) FROM customer JOIN orders ON o_custkey = c_custkey WHERE c_mktsegment = 'MACHINERY'", 2.5),
    ("SELECT COUNT(*) FROM customer JOIN orders ON o_custkey = c_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey WHERE c_mktsegment = 'BUILDING' AND l_quantity < 25", 2.5),
    // SUM / AVG
    ("SELECT SUM(l_extendedprice) FROM lineitem WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'", 1.5),
    ("SELECT AVG(l_extendedprice) FROM lineitem WHERE l_quantity <= 30", 1.5),
    ("SELECT SUM(o_totalprice) FROM orders WHERE o_orderstatus = 'F'", 1.5))

  test("q-error of >= 12 parsed SQL queries within per-class thresholds") {
    assert(scalarQueries.length >= 12)
    scalarQueries.foreach { case (sql, thresh) =>
      val est = estScalar(sql)
      val exact = exactScalar(sql)
      val q = qerr(est, exact)
      assert(q <= thresh, s"q-error $q > $thresh for: $sql (est=$est exact=$exact)")
    }
  }

  test("GROUP BY estimates match exact groups") {
    views
    val sql = "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag"
    val groups = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (g, e) => g.head -> e }.toMap
      case _                        => fail("expected groups")
    }
    val exact = spark.sql("SELECT l_returnflag, COUNT(*) FROM lineitem GROUP BY l_returnflag")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(groups.keySet == exact.keySet)
    exact.foreach { case (g, x) =>
      assert(qerr(groups(g).value, x) <= 1.5, s"group $g")
    }
  }

  test("two BETWEEN conjuncts split/glue correctly around their ANDs") {
    val q = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 5 AND 20 AND l_discount BETWEEN 0.02 AND 0.06")
    assert(q.preds.map(_.range) == Seq(
      NumR(5.0, 20.0, loIncl = true, hiIncl = true),
      NumR(0.02, 0.06, loIncl = true, hiIncl = true)))
  }

  test("parser extracts tables, joins, predicates, group-by") {
    val q = SqlParser.parseQuery(
      "SELECT SUM(l_extendedprice) FROM customer JOIN orders ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND l_shipdate >= DATE '1996-01-01' AND o_totalprice BETWEEN 1000 AND 90000 " +
        "GROUP BY l_returnflag")
    assert(q.agg == Sum("lineitem", "l_extendedprice"))
    assert(q.tables == Set("customer", "orders", "lineitem"))
    assert(q.joins.length == 2)
    assert(q.preds.length == 3)
    assert(q.groupBy.contains(("lineitem", "l_returnflag")))
    val between = q.preds.find(_.col == "o_totalprice").get.range
    assert(between == NumR(1000.0, 90000.0, loIncl = true, hiIncl = true))
  }

  test("JOB-light comma-join form desugars to the same parse as JOIN ... ON") {
    // the reference's benchmark SQL shape: aliased comma FROM, equijoins in
    // WHERE (benchmarks/job-light/sql via evaluation/utils.py::parse_query)
    val comma = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM customer c, orders o, lineitem l " +
        "WHERE o.o_custkey = c.c_custkey AND l.l_orderkey = o.o_orderkey " +
        "AND c.c_mktsegment = 'BUILDING' AND l.l_quantity < 30")
    val explicit = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM customer JOIN orders ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND l_quantity < 30")
    assert(comma.tables == explicit.tables)
    assert(comma.joins.toSet == explicit.joins.toSet)
    assert(comma.preds.toSet == explicit.preds.toSet)
    // edge order is scope-valid even when the WHERE lists joins "backwards"
    val reversedEdges = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem l, orders o, customer c " +
        "WHERE c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey")
    assert(reversedEdges.tables == Set("lineitem", "orders", "customer"))
    assert(reversedEdges.joins.map(_.table) == Seq("orders", "customer"))
    // a decimal literal must not be mistaken for an alias qualifier
    val withDecimal = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM orders o, lineitem l " +
        "WHERE l.l_orderkey = o.o_orderkey AND l.l_discount < 0.05")
    assert(withDecimal.preds == Seq(
      Pred("lineitem", "l_discount", NumR(Double.NegativeInfinity, 0.05, loIncl = true, hiIncl = false))))
    // disconnected FROM (a cartesian product) is rejected, not silently joined
    val err = intercept[IllegalArgumentException] {
      SqlParser.parseQuery("SELECT COUNT(*) FROM orders o, lineitem l WHERE l.l_quantity < 5")
    }
    assert(err.getMessage.contains("unjoined"))
    // an equijoin must not smuggle in a table absent from FROM
    val errFrom = intercept[IllegalArgumentException] {
      SqlParser.parseQuery("SELECT COUNT(*) FROM lineitem l, orders o " +
        "WHERE l.l_orderkey = o.o_orderkey AND p_partkey = l_partkey")
    }
    assert(errFrom.getMessage.contains("not in FROM"))
    // a qualifier naming the WRONG table for its column is rejected loudly,
    // not silently rebound to the column's real table
    val errAlias = intercept[IllegalArgumentException] {
      SqlParser.parseQuery("SELECT COUNT(*) FROM customer c, orders o " +
        "WHERE c.o_custkey = c.c_custkey AND o.o_totalprice < 1000")
    }
    assert(errAlias.getMessage.contains("not a column of"))
    // alias-dot patterns inside string literals survive the qualifier strip
    val quoted = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM customer c, orders o " +
        "WHERE o.o_custkey = c.c_custkey AND c.c_mktsegment IN ('o.BUILDING')")
    assert(quoted.preds == Seq(Pred("customer", "c_mktsegment", StrIn(Seq("o.BUILDING")))))
    // alias lookup is case-insensitive like every keyword
    val cased = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM customer C, orders o WHERE c.c_custkey = o.o_custkey")
    assert(cased.tables == Set("customer", "orders"))
    // both planes answer the comma form identically to the explicit form
    views
    val sqlComma = "SELECT COUNT(*) FROM customer c, orders o, lineitem l " +
      "WHERE o.o_custkey = c.c_custkey AND l.l_orderkey = o.o_orderkey " +
      "AND c.c_mktsegment = 'BUILDING' AND l.l_quantity < 30"
    val compiled = SqlExact.compile(spark, sf, sqlComma).head().getDouble(0)
    val viaSparkSql = exactScalar(
      "SELECT COUNT(*) FROM customer JOIN orders ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND l_quantity < 30")
    assert(compiled == viaSparkSql)
  }

  test("SUM(a) - SUM(b) parses, matches spark.sql exactly, estimates within q-error") {
    views
    val sql = "SELECT SUM(l_extendedprice) - SUM(l_quantity) FROM lineitem WHERE l_quantity < 30"
    val q = SqlParser.parseQuery(sql)
    assert(q.agg == Combo(plus = false,
      Sum("lineitem", "l_extendedprice"), Sum("lineitem", "l_quantity")))
    val compiled = SqlExact.compile(spark, sf, sql).head().getDouble(0)
    // compare against the decimal-exact formulation (what the DuckDB oracle
    // runs): plain SUM(double) - SUM(double) in spark.sql drifts in the ulps
    val viaSparkSql = exactScalar(
      "SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,12))) " +
        "- SUM(CAST(l_quantity AS DECIMAL(38,12))), 2) AS DOUBLE) " +
        "FROM lineitem WHERE l_quantity < 30")
    assert(compiled == viaSparkSql, s"$compiled != $viaSparkSql")
    // model plane: combined estimate lands near the exact difference, and
    // the interval-arithmetic CI brackets the point estimate
    val est = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Scalar(e) => e
      case other                 => fail(s"expected Scalar, got $other")
    }
    assert(qerr(est.value, viaSparkSql) <= 1.5, s"est ${est.value} exact $viaSparkSql")
    assert(est.ci95Lo <= est.value && est.value <= est.ci95Hi)
    // AVG rides a ± combination since r17 (VERDICT item 8): each AVG a
    // ratio of two linear estimates, combined by interval arithmetic —
    // scalar, grouped, and under a parenthesized OR; COUNT(DISTINCT)
    // stays rejected (a set size has no interval arithmetic)
    val avgSql = """SELECT AVG(l_extendedprice) - AVG(l_quantity) FROM lineitem
                    WHERE l_quantity < 30""".stripMargin
    val avgExact = spark.sql(avgSql).head().getDouble(0)
    val avgEst = SqlEstimate.estimate(ens, avgSql) match {
      case SqlEstimate.Scalar(e) => e
      case other                 => fail(s"expected Scalar, got $other")
    }
    assert(qerr(avgEst.value, avgExact) <= 1.5, s"AVG± est ${avgEst.value} exact $avgExact")
    val avgViaExact = SqlExact.compile(spark, sf, avgSql).head().getDouble(0)
    assert(math.abs(avgViaExact - spark.sql(
      "SELECT CAST(ROUND(AVG(CAST(l_extendedprice AS DECIMAL(38,12))) " +
        "- AVG(CAST(l_quantity AS DECIMAL(38,12))), 2) AS DOUBLE) " +
        "FROM lineitem WHERE l_quantity < 30").head().getDouble(0)) < 1e-9)
    val gAvgSql = """SELECT l_returnflag, AVG(l_extendedprice) - AVG(l_quantity)
                     FROM lineitem GROUP BY l_returnflag""".stripMargin
    val gAvgExact = spark.sql(gAvgSql).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gAvgEst = SqlEstimate.estimate(ens, gAvgSql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected Groups, got $other")
    }
    assert(gAvgEst.keySet == gAvgExact.keySet)
    gAvgExact.foreach { case (k, v) =>
      assert(qerr(gAvgEst(k), v) <= 1.5, s"AVG± group $k: ${gAvgEst(k)} vs $v")
    }
    val orAvgSql = """SELECT AVG(l_extendedprice) + AVG(l_quantity) FROM lineitem
                      WHERE (l_discount < 0.02 OR l_tax > 0.06)""".stripMargin
    val orAvgExact = spark.sql(orAvgSql).head().getDouble(0)
    val orAvgEst = SqlEstimate.estimate(ens, orAvgSql) match {
      case SqlEstimate.Scalar(e) => e.value
      case other                 => fail(s"expected Scalar, got $other")
    }
    assert(qerr(orAvgEst, orAvgExact) <= 1.5, s"OR AVG± est $orAvgEst exact $orAvgExact")
    // COUNT(DISTINCT) rides scalar ± combos since r18 (degenerate-interval
    // set size) — under the OR too: the distinct term unions both
    // branches' enumerations, the linear term uses inclusion-exclusion
    val orCdSql = """SELECT COUNT(DISTINCT l_returnflag) + SUM(l_tax) FROM lineitem
                     WHERE (l_discount < 0.02 OR l_tax > 0.06)""".stripMargin
    val orCdExact = spark.sql(orCdSql).head().getDouble(0)
    val orCdEst = SqlEstimate.estimate(ens, orCdSql) match {
      case SqlEstimate.Scalar(e) => e.value
      case other                 => fail(s"expected Scalar, got $other")
    }
    assert(qerr(orCdEst, orCdExact) <= 1.5, s"OR distinct± est $orCdEst exact $orCdExact")
  }

  test("ORDER BY / LIMIT / HAVING parse, compile exactly, and validate") {
    views
    // ORDER BY agg DESC with a group-column tiebreak + LIMIT
    val sql = "SELECT COUNT(*) FROM orders GROUP BY o_orderpriority " +
      "ORDER BY COUNT(*) DESC, o_orderpriority LIMIT 3"
    val q = SqlParser.parseQuery(sql)
    assert(q.orderBy == Seq(OrderKey(byAgg = true, "", "", asc = false),
      OrderKey(byAgg = false, "orders", "o_orderpriority", asc = true)))
    assert(q.limit.contains(3) && q.having.isEmpty)
    val got = SqlExact.compile(spark, sf, sql).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = spark.sql("SELECT o_orderpriority, CAST(COUNT(*) AS DOUBLE) FROM orders " +
      "GROUP BY o_orderpriority ORDER BY COUNT(*) DESC, o_orderpriority LIMIT 3")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == want, s"$got != $want")

    // HAVING filters on a one-pass hidden aggregate column
    val hSql = "SELECT SUM(l_quantity) FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 100"
    assert(SqlParser.parseQuery(hSql).having.contains(Having(Count, ">", 100.0)))
    val hGot = SqlExact.compile(spark, sf, hSql).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    val hWant = spark.sql(
      "SELECT l_returnflag, CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,12))), 2) AS DOUBLE) " +
        "FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 100")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(hGot == hWant && hGot.nonEmpty, s"$hGot != $hWant")

    // a SELECT alias names the aggregate for ORDER BY
    val aq = SqlParser.parseQuery("SELECT SUM(l_quantity) AS qty FROM lineitem " +
      "GROUP BY l_returnflag ORDER BY qty DESC")
    assert(aq.agg == Sum("lineitem", "l_quantity"))
    assert(aq.orderBy == Seq(OrderKey(byAgg = true, "", "", asc = false)))

    // estimate plane: LIMIT bounds the estimated groups; a HAVING aggregate
    // other than the SELECT one has no estimate to filter on
    SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => assert(rows.length == 3)
      case other                    => fail(s"expected Groups, got $other")
    }
    intercept[IllegalArgumentException](SqlEstimate.estimate(ens,
      "SELECT SUM(l_quantity) FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 5"))

    // clause keywords INSIDE string literals must not be torn out by the
    // clause regex (masked around the match)
    val litQ = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM part WHERE p_type IN ('A ORDER BY B', 'X LIMIT 5')")
    assert(litQ.preds == Seq(Pred("part", "p_type", StrIn(Seq("A ORDER BY B", "X LIMIT 5")))))
    assert(litQ.orderBy.isEmpty && litQ.limit.isEmpty)
    val litComma = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM customer c, orders o WHERE o.o_custkey = c.c_custkey " +
        "AND c.c_mktsegment IN ('B GROUP BY HAVING')")
    assert(litComma.preds == Seq(Pred("customer", "c_mktsegment", StrIn(Seq("B GROUP BY HAVING")))))

    // malformed shapes fail loudly, never silently reorder or truncate
    intercept[IllegalArgumentException](SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem HAVING COUNT(*) > 5"))
    // LIMIT literals outside Int range (or zero) use the parser's uniform
    // unsupported-SQL failure channel, not a NumberFormatException
    intercept[IllegalArgumentException](SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag ORDER BY COUNT(*) LIMIT 99999999999"))
    intercept[IllegalArgumentException](SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag ORDER BY COUNT(*) LIMIT 0"))
    // ROLLUP with ORDER BY orders on BOTH planes since r15 (post() sorts
    // grouping-set rows with SQL NULL first ascending, the exact plane's
    // convention) — the grouped-out total row leads
    SqlEstimate.estimate(ens,
      "SELECT COUNT(*) FROM lineitem GROUP BY ROLLUP(l_returnflag) ORDER BY l_returnflag") match {
      case SqlEstimate.GroupSets(rows) =>
        assert(rows.head._1 == Seq(None),
          s"NULL (total) row must sort first ascending, got ${rows.map(_._1)}")
        assert(rows.drop(1).map(_._1.head.get) == rows.drop(1).map(_._1.head.get).sorted,
          s"defined keys must sort ascending: ${rows.map(_._1)}")
      case other => fail(s"expected grouping sets, got $other")
    }
    intercept[IllegalArgumentException](SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag ORDER BY l_quantity"))
    intercept[IllegalArgumentException](SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag LIMIT 2"))
    intercept[IllegalArgumentException](SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag ORDER BY SUM(l_quantity)"))
  }

  test("estimate-plane ordering matches the exact plane: native key order + tiebreak") {
    // unit-level drive of the post() ordering (the fixture schema has no
    // numeric categorical column to reach this end-to-end): group values
    // that all parse as numbers must sort NATIVELY ("2" before "10"), and
    // an ORDER BY <agg> LIMIT cut must fall back to the group key like
    // SqlExact's appended trailing keys — not enumeration order
    def est(v: Double) = Ensemble.Estimate(v, v, v)
    def q(keys: OrderKey*) = ParsedQuery(Count, "t", Set("t"), Nil, Nil, Nil,
      groupBy = Seq(("t", "x")), orderBy = keys.toList, limit = Some(2))
    val rows = Seq(
      Seq("10") -> est(7.0), Seq("2") -> est(5.0), Seq("1") -> est(7.0))
    // ORDER BY x: numeric, so "2" precedes "10"
    SqlEstimate.post(q(OrderKey(byAgg = false, "t", "x", asc = true)),
      SqlEstimate.Groups(rows)) match {
      case SqlEstimate.Groups(r) => assert(r.map(_._1.head) == Seq("1", "2"))
      case other                 => fail(s"expected Groups, got $other")
    }
    // ORDER BY COUNT(*) DESC LIMIT 2: the 7.0-tie must cut by the group
    // key ("1" before "10"), not by the incoming row order
    SqlEstimate.post(q(OrderKey(byAgg = true, "", "", asc = false)),
      SqlEstimate.Groups(rows)) match {
      case SqlEstimate.Groups(r) => assert(r.map(_._1.head) == Seq("1", "10"))
      case other                 => fail(s"expected Groups, got $other")
    }
    // non-numeric keys keep lexicographic order
    val sRows = Seq(Seq("b") -> est(1.0), Seq("a10") -> est(1.0), Seq("a2") -> est(1.0))
    SqlEstimate.post(q(OrderKey(byAgg = false, "t", "x", asc = true)),
      SqlEstimate.Groups(sRows)) match {
      case SqlEstimate.Groups(r) => assert(r.map(_._1.head) == Seq("a10", "a2"))
      case other                 => fail(s"expected Groups, got $other")
    }
  }

  test("COUNT(DISTINCT): exact countDistinct, model-plane enumeration size") {
    views
    val sql = "SELECT COUNT(DISTINCT o_orderpriority) FROM orders WHERE o_orderstatus = 'F'"
    assert(SqlParser.parseQuery(sql).agg == CountDistinct("orders", "o_orderpriority"))
    val compiled = SqlExact.compile(spark, sf, sql).head().getDouble(0)
    assert(compiled == exactScalar(sql))
    // a categorical dictionary is the column's complete domain, so the
    // model enumeration matches exactly on a well-supported filter
    SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Scalar(e) => assert(e.value == compiled, s"model ${e.value} exact $compiled")
      case other                 => fail(s"expected Scalar, got $other")
    }
    // per-group distinct agrees on both planes
    val gSql = "SELECT COUNT(DISTINCT l_linestatus) FROM lineitem GROUP BY l_returnflag"
    val exactG = spark.sql("SELECT l_returnflag, CAST(COUNT(DISTINCT l_linestatus) AS DOUBLE) " +
        "FROM lineitem GROUP BY l_returnflag")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val gotG = SqlExact.compile(spark, sf, gSql).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotG == exactG, s"$gotG != $exactG")
    SqlEstimate.estimate(ens, gSql) match {
      case SqlEstimate.Groups(rows) =>
        assert(rows.map { case (g, e) => g.head -> e.value }.toMap == exactG)
      case other => fail(s"expected Groups, got $other")
    }
    // numeric distinct: fine exactly; the model plane answers from the
    // mass-filtered realized support since r16 (at this SF the training
    // sample is the table, so the full-domain count is exact)
    val nSql = "SELECT COUNT(DISTINCT l_quantity) FROM lineitem"
    val nExact = exactScalar(nSql)
    assert(SqlExact.compile(spark, sf, nSql).head().getDouble(0) == nExact)
    SqlEstimate.estimate(ens, nSql) match {
      case SqlEstimate.Scalar(e) =>
        assert(math.abs(e.value - nExact) <= 2.0, s"num distinct: ${e.value} vs $nExact")
      case other => fail(s"expected Scalar, got $other")
    }
    // numeric distinct PER GROUP (r18, Catalyst CountDistinctNumOut
    // parity): the per-group realized-value support — flat, under a
    // disjunction, and under two independent OR groups (quadrant union)
    def grouped(sql: String): Map[String, Double] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
        case other                    => fail(s"expected groups, got $other")
      }
    def groupedExact(sql: String): Map[String, Double] =
      spark.sql(sql).collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val ngFlat = "SELECT COUNT(DISTINCT l_quantity) FROM lineitem WHERE l_quantity < 10 GROUP BY l_returnflag"
    val ngFlatX = groupedExact(
      "SELECT l_returnflag, COUNT(DISTINCT l_quantity) FROM lineitem WHERE l_quantity < 10 GROUP BY 1")
    grouped(ngFlat).foreach { case (k, v) =>
      assert(math.abs(v - ngFlatX.getOrElse(k, 0.0)) <= 2.0, s"num distinct group $k: $v vs ${ngFlatX.get(k)}")
    }
    val ngOr = "SELECT COUNT(DISTINCT l_quantity) FROM lineitem " +
      "WHERE (l_quantity < 5) OR (l_quantity > 45) GROUP BY l_returnflag"
    val ngOrX = groupedExact(
      "SELECT l_returnflag, COUNT(DISTINCT l_quantity) FROM lineitem " +
        "WHERE l_quantity < 5 OR l_quantity > 45 GROUP BY 1")
    grouped(ngOr).foreach { case (k, v) =>
      assert(math.abs(v - ngOrX.getOrElse(k, 0.0)) <= 2.0, s"num distinct OR group $k: $v vs ${ngOrX.get(k)}")
    }
    val ngMulti = "SELECT COUNT(DISTINCT l_quantity) FROM lineitem " +
      "WHERE (l_quantity < 5 OR l_tax > 0.06) AND (l_discount < 0.03 OR l_extendedprice > 50000) " +
      "GROUP BY l_returnflag"
    val ngMultiX = groupedExact(
      "SELECT l_returnflag, COUNT(DISTINCT l_quantity) FROM lineitem " +
        "WHERE (l_quantity < 5 OR l_tax > 0.06) AND (l_discount < 0.03 OR l_extendedprice > 50000) GROUP BY 1")
    grouped(ngMulti).foreach { case (k, v) =>
      assert(math.abs(v - ngMultiX.getOrElse(k, 0.0)) <= 3.0,
        s"num distinct multi-OR group $k: $v vs ${ngMultiX.get(k)}")
    }
    // scalar ± combos carry the distinct term since r18; both planes agree
    // (the dictionary enumeration is exact at this SF)
    val cdComboSql = "SELECT COUNT(DISTINCT l_linestatus) + COUNT(*) FROM lineitem"
    val cdComboExact = exactScalar(cdComboSql)
    assert(SqlExact.compile(spark, sf, cdComboSql).head().getDouble(0) == cdComboExact)
    SqlEstimate.estimate(ens, cdComboSql) match {
      case SqlEstimate.Scalar(e) =>
        assert(qerr(e.value, cdComboExact) <= 1.05, s"distinct± ${e.value} vs $cdComboExact")
      case other => fail(s"expected Scalar, got $other")
    }
    // grouped combos carry the DISTINCT term too since r18 (per-group set
    // size through the dictionary enumeration — exact at this SF)
    val cdgSql = "SELECT l_returnflag, COUNT(DISTINCT l_linestatus) + COUNT(*) " +
      "FROM lineitem GROUP BY l_returnflag"
    val cdgEst = SqlEstimate.estimate(ens, cdgSql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val cdgExact = spark.sql(cdgSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(cdgEst.keySet == cdgExact.keySet)
    cdgExact.foreach { case (k, v) =>
      assert(qerr(cdgEst(k), v) <= 1.1, s"grouped distinct± $k: ${cdgEst(k)} vs $v")
    }
  }

  test("SqlExact compiles the same class to a DataFrame plan matching spark.sql") {
    views
    val cases = Seq(
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 25",
      "SELECT COUNT(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'",
      "SELECT COUNT(*) FROM customer JOIN orders ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey WHERE c_mktsegment = 'BUILDING' AND l_quantity BETWEEN 5 AND 30")
    cases.foreach { sql =>
      val compiled = SqlExact.compile(spark, sf, sql).head().getDouble(0)
      val viaSparkSql = exactScalar(sql)
      assert(compiled == viaSparkSql, s"$sql: $compiled != $viaSparkSql")
    }
  }

  test("multi-column GROUP BY enumeration matches exact combinations") {
    views
    val est = Ensemble.estGroupByCountMulti(ens, Set("lineitem"),
      Seq(("lineitem", "l_returnflag"), ("lineitem", "l_linestatus")), Map.empty)
      .map { case (gs, v) => (gs.head, gs(1)) -> v }.toMap
    val exact = spark.sql(
      "SELECT l_returnflag, l_linestatus, COUNT(*) FROM lineitem GROUP BY 1, 2")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    assert(est.keySet == exact.keySet, s"${est.keySet} vs ${exact.keySet}")
    exact.foreach { case (k, x) =>
      assert(qerr(est(k), x) <= 1.5, s"group $k est=${est(k)} exact=$x")
    }
  }

  test("GROUP BY respects a WHERE filter on the group column") {
    views
    val sql = "SELECT COUNT(*) FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY l_returnflag"
    val groups = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (g, e) => g.head -> e }.toMap
      case _                        => fail("expected groups")
    }
    assert(groups.keySet == Set("A", "R"), s"filtered-out groups resurrected: ${groups.keySet}")
    val exact = spark.sql(sql.replace("COUNT(*)", "l_returnflag, COUNT(*)"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    exact.foreach { case (g, x) => assert(qerr(groups(g).value, x) <= 1.5, s"group $g") }
  }

  test("date equality predicate parses and estimates") {
    views
    val sql = "SELECT COUNT(*) FROM orders WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-02-01'"
    val q = qerr(estScalar(sql), exactScalar(sql))
    assert(q <= 2.0, s"q-error $q for $sql")
  }

  test("multi-conjunct contradiction estimates zero instead of throwing") {
    val sql = "SELECT COUNT(*) FROM lineitem WHERE l_quantity > 5 AND l_quantity < 3 AND l_quantity > 1"
    val est = estScalar(sql)
    assert(est == 0.0, s"contradictory conjunction must be zero, got $est")
  }

  test("string literal containing the word AND survives the conjunct split") {
    val q = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM part WHERE p_type = 'BURNISHED AND POLISHED' AND p_size < 10")
    assert(q.preds.length == 2)
    assert(q.preds.head.range == StrIn(Seq("BURNISHED AND POLISHED")))
  }

  test("string literal containing the word BETWEEN does not confuse the glue step") {
    val q = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM part WHERE p_type = 'A BETWEEN B' AND p_size < 10")
    assert(q.preds.length == 2)
    assert(q.preds.head.range == StrIn(Seq("A BETWEEN B")))
  }

  test("IN list splits on commas outside quotes only") {
    val q = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM part WHERE p_type IN ('A, B', 'C') AND p_size < 10")
    assert(q.preds.head.range == StrIn(Seq("A, B", "C")))
  }

  test("unknown column prefix is rejected") {
    assertThrows[IllegalArgumentException](
      SqlParser.parseQuery("SELECT COUNT(*) FROM lineitem WHERE zz_bogus < 5"))
  }

  test("chain SPN and single-edge SPN agree on their shared 2-table query") {
    val two = Ensemble.select(ens, Set("orders", "lineitem"))
    assert(two.name == "orders_lineitem", "smallest covering SPN wins selection")
    val viaTwo = Ensemble.estCount(ens, Set("orders", "lineitem"), Map.empty).value
    val chain = ens("customer_orders_lineitem")
    val viaChain = {
      val sub = Map(chain.name -> chain)
      Ensemble.estCount(sub, Set("orders", "lineitem"), Map.empty).value
    }
    val exact = spark.sql(
      "SELECT COUNT(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey").head().getLong(0).toDouble
    assert(qerr(viaTwo, exact) <= 1.5, s"edge SPN $viaTwo vs $exact")
    assert(qerr(viaChain, exact) <= 1.5, s"chain SPN $viaChain vs $exact")
  }

  test("parenthesized OR compiles to inclusion-exclusion and matches exact") {
    views
    val cases = Seq(
      // disjoint same-column branches
      "SELECT COUNT(*) FROM lineitem WHERE (l_quantity < 5) OR (l_quantity > 45)",
      // overlapping branches across columns, single paren group
      "SELECT COUNT(*) FROM lineitem WHERE (l_quantity < 20 OR l_discount > 0.07)",
      // common conjunct distributed into both branches
      "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = 'A' AND (l_quantity < 10 OR l_quantity > 40)",
      // OR over a join
      "SELECT COUNT(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE (o_orderstatus = 'F') OR (l_quantity > 45)")
    cases.foreach { sql =>
      val q = qerr(estScalar(sql), exactScalar(sql))
      assert(q <= 2.0, s"q-error $q for: $sql")
      // the exact plane compiles the same disjunction
      val compiled = SqlExact.compile(spark, sf, sql).head().getDouble(0)
      assert(compiled == exactScalar(sql), s"SqlExact mismatch for: $sql")
    }
  }

  test("OR supports SUM and AVG via linear inclusion-exclusion") {
    views
    val sumSql = "SELECT SUM(l_extendedprice) FROM lineitem WHERE (l_quantity < 10) OR (l_quantity > 40)"
    val sumQ = qerr(estScalar(sumSql), exactScalar(sumSql))
    assert(sumQ <= 1.5, s"SUM-over-OR q-error $sumQ")
    val avgSql = "SELECT AVG(l_extendedprice) FROM lineitem WHERE (l_quantity < 10) OR (l_discount > 0.08)"
    val avgQ = qerr(estScalar(avgSql), exactScalar(avgSql))
    assert(avgQ <= 1.5, s"AVG-over-OR q-error $avgQ")
    // the exact plane compiles both disjunctions too
    Seq(sumSql, avgSql).foreach { sql =>
      val compiled = SqlExact.compile(spark, sf, sql).head().getDouble(0)
      val viaSql = BigDecimal(exactScalar(sql)).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(compiled - viaSql) < 0.51, s"SqlExact mismatch for: $sql")
    }
  }

  test("OR branch with a BETWEEN keeps its AND inside the branch") {
    val q = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem WHERE (l_quantity BETWEEN 5 AND 10 OR l_tax > 0.05)")
    assert(q.preds.map(_.range) == Seq(NumR(5.0, 10.0, loIncl = true, hiIncl = true)))
    assert(q.orPreds.map(_.col) == Seq("l_tax"))
  }

  test("SUM(a*b) parses and estimates within threshold") {
    views
    val sql = "SELECT SUM(l_extendedprice * l_discount) FROM lineitem " +
      "WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'"
    val q = SqlParser.parseQuery(sql)
    assert(q.agg == SumProduct("lineitem", "l_extendedprice", "lineitem", "l_discount"))
    val est = estScalar(sql)
    val exact = exactScalar(sql)
    assert(math.abs(est - exact) / exact <= 0.25, s"est=$est exact=$exact")
  }

  test("multi-column GROUP BY via SQL matches exact combinations") {
    views
    val sql = "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag, l_linestatus"
    val groups = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (g, e) => (g.head, g(1)) -> e }.toMap
      case _                        => fail("expected groups")
    }
    val exact = spark.sql(
      "SELECT l_returnflag, l_linestatus, COUNT(*) FROM lineitem GROUP BY 1, 2")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    assert(groups.keySet == exact.keySet)
    exact.foreach { case (k, x) =>
      val e = groups(k)
      assert(qerr(e.value, x) <= 1.5, s"group $k est=${e.value} exact=$x")
      assert(e.ci95Lo <= e.value && e.value <= e.ci95Hi, s"group $k CI disordered")
    }
    // exact plane: grp/grp2 output matches spark.sql
    val compiled = SqlExact.compile(spark, sf, sql).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(compiled == exact)
  }

  test("unsupported SQL fails loudly, not silently") {
    val bad = Seq(
      "SELECT MAX(l_quantity) FROM lineitem",                       // unsupported agg
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 25 OR l_tax > 0", // disjunction
      "SELECT COUNT(*) FROM lineitem JOIN part ON l_quantity = p_size",   // not a PK-FK edge
      "SELECT COUNT(*) FROM (SELECT * FROM lineitem)")               // subquery
    bad.foreach { sql =>
      assertThrows[IllegalArgumentException](SqlParser.parseQuery(sql))
    }
    // supported-shape boundaries: a 3-branch disjunction ANSWERS since r18
    // (full per-group inclusion–exclusion); past the Π(2^k−1) ≤ 27 term
    // cap — e.g. five branches — it keeps failing loudly. Same-column
    // singles PARTIALLY absorb since r19, so the first shape charges a
    // lone 2-branch group and rides the legacy distributed form
    val pq = SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem WHERE (l_quantity < 5) OR (l_quantity > 45) OR (l_tax > 0.05)")
    assert(pq.orGroupsN.isEmpty && pq.preds.length == 1 && pq.orPreds.length == 1,
      s"partial absorption must reduce to the legacy 2-branch form: $pq")
    assert(SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem WHERE (l_quantity < 5) OR (l_discount > 0.08) OR (l_tax > 0.05)")
      .orGroupsN.map(_.length) == Seq(3))
    assertThrows[IllegalArgumentException](SqlParser.parseQuery(
      "SELECT COUNT(*) FROM lineitem WHERE (l_quantity < 5) OR (l_tax > 0.05) " +
        "OR (l_discount > 0.08) OR (l_returnflag = 'R') OR (l_linestatus = 'F')"))
    // OR + GROUP BY is SUPPORTED since round 9 (per-group inclusion-
    // exclusion) — its correctness is pinned in the dedicated test below
    // GROUP BY over a modeled NUMERIC column estimates via the realized-
    // value support since round 14; a NEAR-CONTINUOUS column still fails
    // loudly past the 400-bucket support cap
    assertThrows[IllegalArgumentException](SqlEstimate.estimate(ens,
      "SELECT COUNT(*) FROM lineitem GROUP BY l_extendedprice"))
    // SUM(a*a) must fail everywhere, not silently collapse to SUM(a) where
    // the feature Map would dedup the repeated key (OR / GROUP BY paths)
    assertThrows[IllegalArgumentException](SqlParser.parseQuery(
      "SELECT SUM(l_quantity * l_quantity) FROM lineitem GROUP BY l_returnflag"))
    // LIKE on a numeric model column must throw, not estimate zero (the
    // exact plane would cast-and-match, so silence would diverge)
    assertThrows[IllegalArgumentException](SqlEstimate.estimate(ens,
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity LIKE '1%'"))
  }

  test("LIKE compiles to dictionary-code sets and matches exact counts") {
    views
    val cases = Seq(
      "SELECT COUNT(*) FROM part WHERE p_type LIKE '%BRASS'",
      "SELECT COUNT(*) FROM part WHERE p_type LIKE 'STANDARD%'",
      "SELECT COUNT(*) FROM orders WHERE o_orderpriority LIKE '_-URGENT'")
    cases.foreach { sql =>
      val est = estScalar(sql)
      val exact = exactScalar(sql)
      assert(qerr(est, exact) <= 1.5, s"est=$est exact=$exact for: $sql")
      val compiled = SqlExact.compile(spark, sf, sql).head().getDouble(0)
      assert(compiled == exact, s"SqlExact mismatch for: $sql")
    }
    // a pattern matching nothing estimates zero
    assert(estScalar("SELECT COUNT(*) FROM part WHERE p_type LIKE 'ZZZ%'") == 0.0)
  }

  test("!= and NOT IN compile to dictionary complements and match exact") {
    views
    val cases = Seq(
      "SELECT COUNT(*) FROM lineitem WHERE l_returnflag != 'A'",
      "SELECT COUNT(*) FROM lineitem WHERE l_returnflag <> 'N' AND l_quantity < 30",
      "SELECT COUNT(*) FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')",
      "SELECT COUNT(*) FROM customer WHERE c_mktsegment NOT IN ('BUILDING')")
    cases.foreach { sql =>
      val est = estScalar(sql)
      val exact = exactScalar(sql)
      assert(qerr(est, exact) <= 1.5, s"est=$est exact=$exact for: $sql")
      val compiled = SqlExact.compile(spark, sf, sql).head().getDouble(0)
      assert(compiled == exact, s"SqlExact mismatch for: $sql")
    }
    // numeric complement is out of the class and must throw
    assertThrows[IllegalArgumentException](SqlEstimate.estimate(ens,
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity != '5'"))
  }

  test("IS NOT NULL parses to the nn indicator and composes with ranges") {
    views
    val sql = "SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NOT NULL AND l_quantity < 25"
    val q = SqlParser.parseQuery(sql)
    assert(q.preds.exists(_.range == NotNull))
    val est = estScalar(sql)
    val exact = exactScalar(sql)
    assert(qerr(est, exact) <= 1.5, s"est=$est exact=$exact")
    val compiled = SqlExact.compile(spark, sf, sql).head().getDouble(0)
    assert(compiled == exact)
  }

  test("GROUP BY with SUM/AVG/SUM(a*b) estimates every group within threshold") {
    views
    def groups(sql: String): Map[String, Ensemble.Estimate] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) => rows.map { case (g, e) => g.mkString("|") -> e }.toMap
        case _                        => fail("expected groups")
      }
    // SUM per group
    val sumEst = groups("SELECT SUM(l_extendedprice) FROM lineitem GROUP BY l_returnflag")
    val sumExact = spark.sql(
      "SELECT l_returnflag, SUM(l_extendedprice) FROM lineitem GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sumEst.keySet == sumExact.keySet)
    sumExact.foreach { case (g, x) =>
      assert(qerr(sumEst(g).value, x) <= 1.5, s"SUM group $g est=${sumEst(g).value} exact=$x")
    }
    // AVG per group, with ordered CIs
    val avgEst = groups("SELECT AVG(l_extendedprice) FROM lineitem GROUP BY l_linestatus")
    val avgExact = spark.sql(
      "SELECT l_linestatus, AVG(l_extendedprice) FROM lineitem GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(avgEst.keySet == avgExact.keySet)
    avgExact.foreach { case (g, x) =>
      val e = avgEst(g)
      assert(qerr(e.value, x) <= 1.5, s"AVG group $g est=${e.value} exact=$x")
      assert(e.ci95Lo <= e.value && e.value <= e.ci95Hi, s"AVG group $g CI disordered")
    }
    // SUM(a*b) over a multi-column grouping
    val spEst = groups(
      "SELECT SUM(l_extendedprice * l_discount) FROM lineitem GROUP BY l_returnflag, l_linestatus")
    val spExact = spark.sql(
      "SELECT concat(l_returnflag, '|', l_linestatus), SUM(l_extendedprice * l_discount) " +
        "FROM lineitem GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(spEst.keySet == spExact.keySet)
    spExact.foreach { case (g, x) =>
      assert(math.abs(spEst(g).value - x) / x <= 0.3,
        s"SUM(a*b) group $g est=${spEst(g).value} exact=$x")
    }
  }

  test("OR + GROUP BY estimates every group via per-group inclusion-exclusion") {
    val sql = "SELECT COUNT(*) FROM lineitem WHERE (l_quantity < 5) OR (l_quantity > 45) GROUP BY l_returnflag"
    val est = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val exact = spark.sql(
      "SELECT l_returnflag, COUNT(*) FROM lineitem " +
        "WHERE l_quantity < 5 OR l_quantity > 45 GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(est.keySet == exact.keySet, s"groups ${est.keySet} vs ${exact.keySet}")
    exact.foreach { case (k, x) =>
      val q = math.max(est(k) / x, x / est(k))
      assert(q <= 1.5, s"group $k: est ${est(k)} vs exact $x")
    }
    // SUM under grouped OR too
    val sumSql = "SELECT SUM(l_extendedprice) FROM lineitem WHERE (l_quantity < 5) OR (l_quantity > 45) GROUP BY l_returnflag"
    val sums = SqlEstimate.estimate(ens, sumSql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val exactS = spark.sql(
      "SELECT l_returnflag, SUM(l_extendedprice) FROM lineitem " +
        "WHERE l_quantity < 5 OR l_quantity > 45 GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exactS.foreach { case (k, x) =>
      val q = math.max(sums(k) / x, x / sums(k))
      assert(q <= 1.5, s"group $k sum: est ${sums(k)} vs exact $x")
    }
  }

  test("GROUP BY ROLLUP/CUBE sugar matches exact grouping sets") {
    views
    def sets(sql: String): Map[String, Double] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.GroupSets(rows) =>
          rows.map { case (g, e) => g.map(_.getOrElse("ALL")).mkString("|") -> e.value }.toMap
        case _ => fail("expected grouping sets")
      }
    val est = sets(
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 30 GROUP BY ROLLUP(l_returnflag, l_linestatus)")
    val exact = spark.sql(
      "SELECT coalesce(l_returnflag, 'ALL'), coalesce(l_linestatus, 'ALL'), COUNT(*) " +
        "FROM lineitem WHERE l_quantity < 30 GROUP BY ROLLUP(l_returnflag, l_linestatus)")
      .collect().map(r => s"${r.getString(0)}|${r.getString(1)}" -> r.getLong(2).toDouble).toMap
    assert(est.keySet == exact.keySet, s"rollup sets ${est.keySet} vs ${exact.keySet}")
    exact.foreach { case (g, x) =>
      assert(qerr(est(g), x) <= 1.5, s"ROLLUP set $g est=${est(g)} exact=$x")
    }
    val cubeEst = sets("SELECT COUNT(*) FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)")
    val cubeExact = spark.sql(
      "SELECT coalesce(l_returnflag, 'ALL'), coalesce(l_linestatus, 'ALL'), COUNT(*) " +
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)")
      .collect().map(r => s"${r.getString(0)}|${r.getString(1)}" -> r.getLong(2).toDouble).toMap
    assert(cubeEst.keySet == cubeExact.keySet)
    cubeExact.foreach { case (g, x) =>
      assert(qerr(cubeEst(g), x) <= 1.5, s"CUBE set $g est=${cubeEst(g)} exact=$x")
    }
    // the exact plane compiles the same sugar through Dataset.rollup
    val sqlExact = rspn.SqlExact.compile(spark, sf,
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 30 GROUP BY ROLLUP(l_returnflag, l_linestatus)")
      .collect()
    assert(sqlExact.length == exact.size)
    // SUM and AVG thread through every grouping set since r15 (the
    // feature/ratio pass under one shared memo — the Catalyst plane's
    // grouping-set fold semantics on the text plane)
    val sumEst = sets(
      "SELECT SUM(l_extendedprice) FROM lineitem WHERE l_quantity < 30 GROUP BY ROLLUP(l_returnflag, l_linestatus)")
    val sumExact = spark.sql(
      "SELECT coalesce(l_returnflag, 'ALL'), coalesce(l_linestatus, 'ALL'), SUM(l_extendedprice) " +
        "FROM lineitem WHERE l_quantity < 30 GROUP BY ROLLUP(l_returnflag, l_linestatus)")
      .collect().map(r => s"${r.getString(0)}|${r.getString(1)}" -> r.getDouble(2)).toMap
    assert(sumEst.keySet == sumExact.keySet, s"rollup SUM sets ${sumEst.keySet} vs ${sumExact.keySet}")
    sumExact.foreach { case (g, x) =>
      assert(qerr(math.max(sumEst(g), 1.0), math.max(x, 1.0)) <= 1.5,
        s"ROLLUP SUM set $g est=${sumEst(g)} exact=$x")
    }
    val avgEst = sets(
      "SELECT AVG(l_extendedprice) FROM lineitem WHERE l_quantity < 30 GROUP BY CUBE(l_returnflag, l_linestatus)")
    val avgExact = spark.sql(
      "SELECT coalesce(l_returnflag, 'ALL'), coalesce(l_linestatus, 'ALL'), AVG(l_extendedprice) " +
        "FROM lineitem WHERE l_quantity < 30 GROUP BY CUBE(l_returnflag, l_linestatus)")
      .collect().map(r => s"${r.getString(0)}|${r.getString(1)}" -> r.getDouble(2)).toMap
    assert(avgEst.keySet == avgExact.keySet)
    avgExact.foreach { case (g, x) =>
      assert(qerr(avgEst(g), x) <= 1.5, s"CUBE AVG set $g est=${avgEst(g)} exact=$x")
    }
    // HAVING + ORDER BY val DESC + LIMIT on the grouping-set result: both
    // planes cut the SAME rows (counts per set are well-separated — the
    // total row dominates, then the largest flag)
    val postSql = "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity < 30 " +
      "GROUP BY ROLLUP(l_returnflag) HAVING COUNT(*) > 10 ORDER BY n DESC LIMIT 2"
    val postEst = SqlEstimate.estimate(ens, postSql) match {
      case SqlEstimate.GroupSets(rows) => rows.map(_._1.head.getOrElse("ALL"))
      case other                       => fail(s"expected grouping sets, got $other")
    }
    val postExact = spark.sql(
      "SELECT coalesce(l_returnflag, 'ALL') AS g, COUNT(*) AS n FROM lineitem " +
        "WHERE l_quantity < 30 GROUP BY ROLLUP(l_returnflag) HAVING COUNT(*) > 10 " +
        "ORDER BY n DESC LIMIT 2").collect().map(_.getString(0)).toSeq
    assert(postEst == postExact,
      s"rollup HAVING/ORDER/LIMIT must cut the same sets: $postEst vs $postExact")
    // the exact-plane compiler applies the same three clauses
    val postViaExact = rspn.SqlExact.compile(spark, sf, postSql).collect()
      .map(r => if (r.isNullAt(0)) "ALL" else r.getString(0)).toSeq
    assert(postViaExact == postExact, s"SqlExact rollup post-clauses: $postViaExact vs $postExact")
  }

  test("numeric and date != / NOT IN estimate via the multi-interval point complement") {
    views
    // reference ranges.py::NumericRange negation on the TEXT plane: both
    // planes share ColRangeOps.pointComplement, so the estimate matches
    // exact within the usual single-table headroom and the exact-plane
    // compiler produces the same row set as spark.sql
    val cases = Seq(
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity != 24",
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity NOT IN (5, 10, 15)",
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity NOT IN (5, 10) AND l_quantity < 20",
      "SELECT COUNT(*) FROM lineitem WHERE l_shipdate != DATE '1996-06-01'",
      // composes with the dictionary complement on the same query
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity != 24 AND l_returnflag != 'A'")
    cases.foreach { sql =>
      val exact = exactScalar(sql)
      val est = estScalar(sql)
      assert(qerr(est, exact) <= 1.5, f"[$sql] est $est%.1f vs exact $exact%.1f")
      val viaExact = rspn.SqlExact.compile(spark, sf, sql).head().get(0) match {
        case n: Number => n.doubleValue()
      }
      assert(viaExact == exact, s"[$sql] SqlExact $viaExact vs spark.sql $exact")
    }
    // a mixed date/numeric NOT IN list has no single encoding: loud failure
    val e = intercept[Exception](estScalar(
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity NOT IN (5, DATE '1996-06-01')"))
    assert(e.getMessage.contains("mixes date and numeric"), e.getMessage)
  }

  test("numeric GROUP BY estimates via realized-value buckets on the text plane") {
    // parity with the Catalyst histogram fold: one bucket per realized
    // value with mass, dictionary columns enumerated per bucket; keys
    // print integrally to match the exact plane's group normalization
    views
    val sql = "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_quantity"
    val exact = spark.sql(
      """SELECT l_quantity, COUNT(*) FROM lineitem
        |WHERE l_returnflag = 'A' GROUP BY l_quantity""".stripMargin).collect()
      .map(r => r.getDouble(0).toLong.toString -> r.getLong(1).toDouble).toMap
    val est = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    // sparse-cell boundary convention: non-trivial cells must agree
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
    // numeric x dictionary: the key tuple keeps the query's group order
    val sql2 = "SELECT SUM(l_extendedprice) FROM lineitem WHERE l_quantity < 5 GROUP BY l_linestatus, l_quantity"
    val exact2 = spark.sql(
      """SELECT l_linestatus, l_quantity, SUM(l_extendedprice) FROM lineitem
        |WHERE l_quantity < 5 GROUP BY l_linestatus, l_quantity""".stripMargin).collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong.toString) -> r.getDouble(2)).toMap
    val est2 = SqlEstimate.estimate(ens, sql2) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => (k(0), k(1)) -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    assert(est2.keySet == exact2.keySet,
      s"numeric x dict keys: ${est2.keySet} vs ${exact2.keySet}")
    exact2.foreach { case (k, v) =>
      assert(qerr(math.max(est2(k), 1.0), math.max(v, 1.0)) <= 1.5,
        s"cell $k: ${est2(k)} vs $v")
    }
  }

  test("two-calendar cross product estimates on the text plane") {
    // GROUP BY year(d), quarter(d): the bucket cross product — nested
    // predicate intersection meets the year range with the cyclic quarter
    // multi-interval (that year's quarter slice), parity with the Catalyst
    // seasonal fold
    views
    val sql = """SELECT year(o_orderdate), quarter(o_orderdate), COUNT(*)
                 FROM orders WHERE o_totalprice < 150000
                 GROUP BY year(o_orderdate), quarter(o_orderdate)""".stripMargin
    val exact = spark.sql(sql).collect()
      .map(r => (r.getInt(0).toString, r.getInt(1).toString) -> r.getLong(2).toDouble).toMap
    val est = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => (k(0), k(1)) -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"phantom cell $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"dropped cell $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"cell $k: ${est(k)} vs ${exact(k)}")
    }
    // ...and with a trailing dimension column
    val sql2 = """SELECT year(o_orderdate), quarter(o_orderdate), o_orderstatus, COUNT(*)
                  FROM orders GROUP BY year(o_orderdate), quarter(o_orderdate), o_orderstatus""".stripMargin
    val exact2 = spark.sql(sql2).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)) -> r.getLong(3).toDouble).toMap
    val est2 = SqlEstimate.estimate(ens, sql2) match {
      case SqlEstimate.Groups(rows) =>
        rows.map { case (k, e) => (k(0).toInt, k(1).toInt, k(2)) -> e.value }.toMap
      case other => fail(s"expected groups, got $other")
    }
    (est2.keySet intersect exact2.keySet).foreach { k =>
      assert(qerr(est2(k), exact2(k)) <= 3.0 || math.abs(est2(k) - exact2(k)) <= 10.0,
        s"cell $k: ${est2(k)} vs ${exact2(k)}")
    }
    (exact2.keySet diff est2.keySet).foreach { k =>
      assert(exact2(k) <= 5.0, s"dropped cell $k has real rows: ${exact2(k)}")
    }
    // a THIRD calendar expression composes since r15 (the meets prune the
    // cube: each month meets exactly its own quarter) — parity with exact
    val sql3 = """SELECT year(o_orderdate), quarter(o_orderdate), month(o_orderdate), COUNT(*)
                  FROM orders WHERE o_totalprice < 150000
                  GROUP BY year(o_orderdate), quarter(o_orderdate), month(o_orderdate)""".stripMargin
    val exact3 = spark.sql(sql3).collect()
      .map(r => (r.getInt(0).toString, r.getInt(1).toString, r.getInt(2).toString)
        -> r.getLong(3).toDouble).toMap
    val est3 = SqlEstimate.estimate(ens, sql3) match {
      case SqlEstimate.Groups(rows) =>
        rows.map { case (k, e) => (k(0), k(1), k(2)) -> e.value }.toMap
      case other => fail(s"expected groups, got $other")
    }
    (est3.keySet diff exact3.keySet).foreach { k =>
      assert(est3(k) <= 5.0, s"y×q×m phantom cell $k carries real mass: ${est3(k)}")
    }
    (exact3.keySet diff est3.keySet).foreach { k =>
      assert(exact3(k) <= 5.0, s"y×q×m dropped cell $k has real rows: ${exact3(k)}")
    }
    (est3.keySet intersect exact3.keySet).foreach { k =>
      assert(qerr(est3(k), exact3(k)) <= 3.0 || math.abs(est3(k) - exact3(k)) <= 10.0,
        s"y×q×m cell $k: ${est3(k)} vs ${exact3(k)}")
    }
    // a FOURTH still fails loudly
    assertThrows[IllegalArgumentException](SqlParser.parseQuery(
      """SELECT COUNT(*) FROM orders
        |GROUP BY year(o_orderdate), quarter(o_orderdate), month(o_orderdate), year(o_orderdate)""".stripMargin))
  }

  test("binned numeric GROUP BY estimates on the text plane: floor/width_bucket/round") {
    // r16 parity with the Catalyst binned fold: each bin is one half-open
    // range estimation over a num-modeled column — the histogram shape the
    // realized-value enumeration refuses on near-continuous columns
    // (l_extendedprice carries ~6k realized values at this SF)
    views
    def checkGroups(sql: String, tol: Double = 3.0): Unit = {
      val w = spark.sql(sql).schema.length
      val exact = spark.sql(sql).collect()
        .map(r => ((0 until w - 1).map(i => String.valueOf(r.get(i))
          .replaceAll("\\.0$", "")): Seq[String]) -> r.getLong(w - 1).toDouble).toMap
      val est = SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k -> e.value }.toMap
        case other                    => fail(s"expected groups for [$sql], got $other")
      }
      (est.keySet diff exact.keySet).foreach { k =>
        assert(est(k) <= 5.0, s"[$sql] phantom bin $k carries real mass: ${est(k)}")
      }
      (exact.keySet diff est.keySet).foreach { k =>
        assert(exact(k) <= 5.0, s"[$sql] dropped bin $k has real rows: ${exact(k)}")
      }
      (est.keySet intersect exact.keySet).foreach { k =>
        assert(qerr(est(k), exact(k)) <= tol || math.abs(est(k) - exact(k)) <= 10.0,
          s"[$sql] bin $k: ${est(k)} vs ${exact(k)}")
      }
    }
    checkGroups(
      """SELECT floor(l_extendedprice/20000), COUNT(*) FROM lineitem
         WHERE l_quantity < 24 GROUP BY floor(l_extendedprice/20000)""".stripMargin)
    checkGroups(
      """SELECT width_bucket(o_totalprice, 50000, 450000, 8), COUNT(*)
         FROM orders GROUP BY width_bucket(o_totalprice, 50000, 450000, 8)""".stripMargin)
    checkGroups(
      """SELECT round(l_extendedprice, -4), COUNT(*) FROM lineitem
         WHERE l_quantity < 24 GROUP BY round(l_extendedprice, -4)""".stripMargin)
    // calendar × bin cross product with a trailing dictionary dimension
    checkGroups(
      """SELECT year(o_orderdate), floor(o_totalprice/100000), o_orderstatus, COUNT(*)
         FROM orders GROUP BY year(o_orderdate), floor(o_totalprice/100000), o_orderstatus""".stripMargin)
    // the exact plane compiles the same encoded fn to the matching Spark
    // function — SqlExact agrees with spark.sql on the raw text
    val xSql = """SELECT floor(l_extendedprice/20000), COUNT(*) AS n FROM lineitem
                  GROUP BY floor(l_extendedprice/20000) ORDER BY n DESC LIMIT 3""".stripMargin
    val viaSpark = spark.sql(xSql).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaExact = SqlExact.compile(spark, sf, xSql).collect()
      .map(r => (r.getLong(0), r.getDouble(1).toLong)).toSeq
    assert(viaExact == viaSpark, s"exact-plane binned grouping: $viaExact vs $viaSpark")
    // loud failures: a bin fn over a non-num column; a past-the-interval-
    // cap bin width (r17: ~1000 bins now answer, ~10000 stay loud); a
    // positive round scale never parses as a bucket expression
    assertThrows[IllegalArgumentException](SqlEstimate.estimate(ens,
      "SELECT floor(o_orderdate/2), COUNT(*) FROM orders GROUP BY floor(o_orderdate/2)"))
    assert(SqlEstimate.estimate(ens,
      """SELECT floor(l_extendedprice/100), COUNT(*) FROM lineitem
         GROUP BY floor(l_extendedprice/100)""".stripMargin)
      .isInstanceOf[SqlEstimate.Groups], "a ~1000-bin histogram answers under the interval cap")
    assertThrows[IllegalArgumentException](SqlEstimate.estimate(ens,
      """SELECT floor(l_extendedprice/10), COUNT(*) FROM lineitem
         GROUP BY floor(l_extendedprice/10)""".stripMargin))
    assertThrows[IllegalArgumentException](SqlEstimate.estimate(ens,
      "SELECT round(l_discount, 1), COUNT(*) FROM lineitem GROUP BY round(l_discount, 1)"))
  }

  test("grouped +/- aggregate combinations estimate per group on the text plane") {
    // r16 (VERDICT item 3): SUM(a) − SUM(b) per group over the shared
    // group universe with interval-arithmetic CIs — the Catalyst plane's
    // expression-tree outputs, closed on the text plane
    views
    def checkCombo(sql: String): Unit = {
      val exact = spark.sql(sql).collect()
        .map(r => r.getString(0) -> (r.get(1) match {
          case d: java.math.BigDecimal => d.doubleValue()
          case n: Number               => n.doubleValue()
        })).toMap
      val est = SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
        case other                    => fail(s"expected groups for [$sql], got $other")
      }
      assert(est.keySet == exact.keySet, s"[$sql] keys: ${est.keySet} vs ${exact.keySet}")
      exact.foreach { case (k, v) =>
        assert(qerr(est(k), v) <= 1.5 || math.abs(est(k) - v) <= 10.0,
          s"[$sql] group $k: ${est(k)} vs $v")
      }
    }
    checkCombo(
      """SELECT l_returnflag, SUM(l_extendedprice) - SUM(l_quantity)
         FROM lineitem WHERE l_quantity < 30 GROUP BY l_returnflag""".stripMargin)
    checkCombo(
      """SELECT o_orderstatus, COUNT(*) + SUM(o_totalprice)
         FROM orders WHERE o_totalprice > 50000 GROUP BY o_orderstatus""".stripMargin)
    // the exact plane compiles the same text (decimal-exact combination)
    val xSql = """SELECT l_returnflag, SUM(l_extendedprice) - SUM(l_quantity) AS v
                  FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    val viaSpark = spark.sql(xSql).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100))).toSeq
    val viaExact = SqlExact.compile(spark, sf, xSql).collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 100))).toSeq
    assert(viaExact == viaSpark, s"exact-plane grouped combo: $viaExact vs $viaSpark")
    // CIs combine by interval arithmetic: the difference's interval must
    // contain its point value with lo <= value <= hi per group
    SqlEstimate.estimate(ens,
      """SELECT l_returnflag, SUM(l_extendedprice) - SUM(l_quantity)
         FROM lineitem GROUP BY l_returnflag""".stripMargin) match {
      case SqlEstimate.Groups(rows) =>
        assert(rows.nonEmpty)
        rows.foreach { case (k, e) =>
          assert(e.ci95Lo <= e.value && e.value <= e.ci95Hi,
            s"group $k: CI [${e.ci95Lo}, ${e.ci95Hi}] must bracket ${e.value}")
        }
      case other => fail(s"expected groups, got $other")
    }
  }

  test("calendar GROUP BY honors HAVING/ORDER BY/LIMIT identically on both planes") {
    // r15 ADVICE (high): the exact plane's calendar branch used to ignore
    // q.having/q.orderBy — `ORDER BY n DESC LIMIT 3` silently returned the
    // first 3 years. Both planes now share the post-clause semantics; the
    // exact plane's truth oracle is spark.sql on the same text.
    views
    val sql = """SELECT year(o_orderdate), COUNT(*) AS n FROM orders
                 GROUP BY year(o_orderdate) ORDER BY n DESC LIMIT 3""".stripMargin
    val viaSpark = spark.sql(sql).collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val viaExact = SqlExact.compile(spark, sf, sql).collect()
      .map(r => (r.getInt(0), r.getDouble(1).toLong)).toSeq
    assert(viaExact == viaSpark,
      s"exact plane must rank by the aggregate, not the year: $viaExact vs $viaSpark")
    // estimate plane cuts the same top years (bucket counts well-separated)
    val viaEst = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => rows.map(_._1.head)
      case other                    => fail(s"expected groups, got $other")
    }
    assert(viaEst == viaSpark.map(_._1.toString),
      s"estimate plane must cut the same top years: $viaEst vs ${viaSpark.map(_._1)}")
    // HAVING over a calendar-only grouping parses and filters (r15: a
    // calendar expression IS a grouping)
    val hvSql = """SELECT year(o_orderdate), COUNT(*) AS n FROM orders
                   GROUP BY year(o_orderdate) HAVING COUNT(*) > 50""".stripMargin
    val hvSpark = spark.sql(hvSql).collect().map(r => r.getInt(0).toString).toSet
    val hvExact = SqlExact.compile(spark, sf, hvSql).collect().map(_.getInt(0).toString).toSet
    assert(hvExact == hvSpark, s"calendar HAVING: $hvExact vs $hvSpark")
    SqlEstimate.estimate(ens, hvSql) match {
      case SqlEstimate.Groups(rows) =>
        assert(rows.map(_._1.head).toSet == hvSpark,
          s"estimate-plane calendar HAVING: ${rows.map(_._1.head).toSet} vs $hvSpark")
      case other => fail(s"expected groups, got $other")
    }
    // r15 ADVICE (medium): `GROUP BY year(d), dim ORDER BY dim` must sort
    // by the DIMENSION — its key index offsets past the calendar prefix —
    // with the calendar key as the ascending tiebreak
    val dimSql = """SELECT year(o_orderdate), o_orderstatus, COUNT(*) AS n FROM orders
                    GROUP BY year(o_orderdate), o_orderstatus
                    ORDER BY o_orderstatus DESC""".stripMargin
    val dimSpark = spark.sql(
      """SELECT year(o_orderdate) AS y, o_orderstatus AS s, COUNT(*) AS n FROM orders
         GROUP BY year(o_orderdate), o_orderstatus
         ORDER BY s DESC, y ASC""".stripMargin).collect()
      .map(r => (r.getInt(0).toString, r.getString(1))).toSeq
    val dimExact = SqlExact.compile(spark, sf, dimSql).collect()
      .map(r => (r.getInt(0).toString, r.getString(1))).toSeq
    assert(dimExact == dimSpark, s"exact-plane dim sort under calendar: $dimExact vs $dimSpark")
    SqlEstimate.estimate(ens, dimSql) match {
      case SqlEstimate.Groups(rows) =>
        assert(rows.map(k => (k._1(0), k._1(1))) == dimSpark,
          s"estimate-plane dim sort under calendar: ${rows.map(_._1)} vs $dimSpark")
      case other => fail(s"expected groups, got $other")
    }
  }

  test("OR composes with calendar and numeric GROUP BY on the text plane") {
    // r15: each bucket's range/point pin conjoins BOTH branches of the
    // parenthesized OR and answers via inclusion-exclusion — parity with
    // the Catalyst fold's shape-dispatch composition
    views
    def cellCheck(est: Map[String, Double], exact: Map[String, Double], what: String): Unit = {
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
    def estGroups(sql: String): Map[String, Double] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.mkString("|") -> e.value }.toMap
        case other                    => fail(s"expected groups, got $other")
      }
    val calSql = """SELECT year(o_orderdate), COUNT(*) FROM orders
                    WHERE (o_orderstatus = 'F') OR (o_totalprice < 50000)
                    GROUP BY year(o_orderdate)""".stripMargin
    val calExact = spark.sql(calSql).collect()
      .map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    cellCheck(estGroups(calSql), calExact, "OR×year")
    // calendar × dimension under the OR: per-bucket grouped IE
    val mixSql = """SELECT year(o_orderdate), o_orderpriority, COUNT(*) FROM orders
                    WHERE (o_orderstatus = 'F') OR (o_totalprice < 50000)
                    GROUP BY year(o_orderdate), o_orderpriority""".stripMargin
    val mixExact = spark.sql(mixSql).collect()
      .map(r => s"${r.getInt(0)}|${r.getString(1)}" -> r.getLong(2).toDouble).toMap
    cellCheck(estGroups(mixSql), mixExact, "OR×year×dim")
    // numeric histogram under the OR: support unions across branches,
    // value pins compose via IE
    val numSql = """SELECT l_quantity, COUNT(*) FROM lineitem
                    WHERE (l_returnflag = 'A') OR (l_tax > 0.06)
                    GROUP BY l_quantity""".stripMargin
    val numExact = spark.sql(numSql).collect()
      .map(r => r.getDouble(0).toLong.toString -> r.getLong(1).toDouble).toMap
    cellCheck(estGroups(numSql), numExact, "OR×numeric")
  }

  test("OR composes with ROLLUP/CUBE, COUNT(DISTINCT) and ± combos on the text plane") {
    // r15 late widenings: the remaining OR asymmetries with the Catalyst
    // plane — grouping sets answer per set via the per-group IE
    // estimators, distinct counts union both branches' enumerations,
    // ± combinations recurse per linear term
    views
    val rollupSql = """SELECT l_returnflag, COUNT(*) FROM lineitem
                       WHERE (l_quantity < 5) OR (l_quantity > 45)
                       GROUP BY ROLLUP(l_returnflag)""".stripMargin
    val rollupEst = SqlEstimate.estimate(ens, rollupSql) match {
      case SqlEstimate.GroupSets(rows) =>
        rows.map { case (g, e) => g.head.getOrElse("ALL") -> e.value }.toMap
      case other => fail(s"expected grouping sets, got $other")
    }
    val rollupExact = spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL'), COUNT(*) FROM lineitem
         WHERE l_quantity < 5 OR l_quantity > 45 GROUP BY ROLLUP(l_returnflag)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(rollupEst.keySet == rollupExact.keySet,
      s"OR rollup sets ${rollupEst.keySet} vs ${rollupExact.keySet}")
    rollupExact.foreach { case (g, x) =>
      assert(qerr(rollupEst(g), x) <= 1.5, s"OR rollup set $g est=${rollupEst(g)} exact=$x")
    }
    // SUM per set under the OR, via per-set inclusion-exclusion
    val cubeSql = """SELECT l_linestatus, SUM(l_extendedprice) FROM lineitem
                     WHERE (l_quantity < 5) OR (l_quantity > 45)
                     GROUP BY CUBE(l_linestatus)""".stripMargin
    val cubeEst = SqlEstimate.estimate(ens, cubeSql) match {
      case SqlEstimate.GroupSets(rows) =>
        rows.map { case (g, e) => g.head.getOrElse("ALL") -> e.value }.toMap
      case other => fail(s"expected grouping sets, got $other")
    }
    val cubeExact = spark.sql(
      """SELECT coalesce(l_linestatus, 'ALL'), SUM(l_extendedprice) FROM lineitem
         WHERE l_quantity < 5 OR l_quantity > 45 GROUP BY CUBE(l_linestatus)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    cubeExact.foreach { case (g, x) =>
      assert(qerr(math.max(cubeEst(g), 1.0), math.max(x, 1.0)) <= 1.5,
        s"OR cube SUM set $g est=${cubeEst(g)} exact=$x")
    }
    // COUNT(DISTINCT) under the OR: exact union of branch enumerations —
    // dictionary supports make it exact, scalar and grouped
    val cdSql = "SELECT COUNT(DISTINCT l_returnflag) FROM lineitem " +
      "WHERE (l_quantity < 3) OR (l_quantity > 47)"
    assert(estScalar(cdSql) == exactScalar(cdSql), s"scalar OR distinct: ${estScalar(cdSql)}")
    val cdgSql = "SELECT COUNT(DISTINCT l_linestatus) FROM lineitem " +
      "WHERE (l_quantity < 3) OR (l_quantity > 47) GROUP BY l_returnflag"
    val cdgEst = SqlEstimate.estimate(ens, cdgSql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val cdgExact = spark.sql(
      "SELECT l_returnflag, COUNT(DISTINCT l_linestatus) FROM lineitem " +
        "WHERE l_quantity < 3 OR l_quantity > 47 GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(cdgEst == cdgExact, s"grouped OR distinct: $cdgEst vs $cdgExact")
    // ± combination under the OR: per-term IE, conservative interval sum
    val comboSql = "SELECT SUM(l_extendedprice) - SUM(l_quantity) FROM lineitem " +
      "WHERE (l_quantity < 5) OR (l_quantity > 45)"
    assert(qerr(estScalar(comboSql), exactScalar(comboSql)) <= 1.5,
      s"OR combo: ${estScalar(comboSql)} vs ${exactScalar(comboSql)}")
    // GROUPED ± combination under the OR (r18 — the last flat-grouped
    // combo asymmetry vs the Catalyst ExprOut fold), with a DISTINCT
    // leaf: per-group branch-union set size minus the IE count
    val gcSql = "SELECT l_returnflag, COUNT(*) - COUNT(DISTINCT l_linestatus) " +
      "FROM lineitem WHERE (l_quantity < 5) OR (l_quantity > 45) GROUP BY l_returnflag"
    val gcEst = SqlEstimate.estimate(ens, gcSql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val gcExact = spark.sql(gcSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    (gcExact.keySet intersect gcEst.keySet).foreach { k =>
      assert(qerr(math.max(gcEst(k), 1.0), math.max(gcExact(k), 1.0)) <= 1.5,
        s"grouped OR combo $k: ${gcEst(k)} vs ${gcExact(k)}")
    }
    // and per BUCKET: a distinct leaf inside a ± combo under calendar
    // grouping (plainGroupTerm's distinct arm)
    val bcSql = """SELECT year(l_shipdate), COUNT(*) - COUNT(DISTINCT l_returnflag)
                   FROM lineitem WHERE l_quantity < 20
                   GROUP BY year(l_shipdate)"""
    val bcEst = SqlEstimate.estimate(ens, bcSql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val bcExact = spark.sql(
      """SELECT cast(year(l_shipdate) AS string), COUNT(*) - COUNT(DISTINCT l_returnflag)
         FROM lineitem WHERE l_quantity < 20 GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    (bcExact.keySet intersect bcEst.keySet).foreach { k =>
      assert(qerr(math.max(bcEst(k), 1.0), math.max(bcExact(k), 1.0)) <= 1.5,
        s"bucket combo-distinct $k: ${bcEst(k)} vs ${bcExact(k)}")
    }
    assert(bcEst.keySet == bcExact.keySet, s"${bcEst.keySet} vs ${bcExact.keySet}")
  }

  test("numeric dimension columns ride the calendar grouping on the text plane") {
    // r15 parity with the Catalyst fold's kind dispatch: the num-modeled
    // trailing dimension expands each calendar bucket by realized-value
    // pins, keys reassembled in the query's own group order
    views
    val sql = """SELECT year(l_shipdate), l_quantity, COUNT(*) FROM lineitem
                 WHERE l_quantity < 10 GROUP BY year(l_shipdate), l_quantity""".stripMargin
    val exact = spark.sql(sql).collect()
      .map(r => (r.getInt(0).toString, r.getDouble(1).toLong.toString) -> r.getLong(2).toDouble).toMap
    val est = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => (k(0), k(1)) -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"cal×num phantom cell $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"cal×num dropped cell $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"cal×num cell $k: ${est(k)} vs ${exact(k)}")
    }
    // a near-continuous numeric dimension fails loudly at the support cap
    assertThrows[IllegalArgumentException](SqlEstimate.estimate(ens,
      """SELECT year(o_orderdate), o_totalprice, COUNT(*) FROM orders
         GROUP BY year(o_orderdate), o_totalprice""".stripMargin))
  }

  test("num-modeled grouping columns ride ROLLUP/CUBE on the text plane") {
    // r15 parity with the Catalyst kind dispatch: numeric-bearing sets
    // answer through per-set realized-value pins, keys pad with None
    views
    val sql = """SELECT l_returnflag, l_quantity, COUNT(*) FROM lineitem
                 WHERE l_quantity < 8 GROUP BY ROLLUP(l_returnflag, l_quantity)""".stripMargin
    val est = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.GroupSets(rows) =>
        rows.map { case (g, e) =>
          (g(0).getOrElse("ALL"), g(1).getOrElse("ALL")) -> e.value
        }.toMap
      case other => fail(s"expected grouping sets, got $other")
    }
    val exact = spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL'),
                coalesce(cast(cast(l_quantity AS bigint) AS string), 'ALL'), COUNT(*)
         FROM lineitem WHERE l_quantity < 8
         GROUP BY ROLLUP(l_returnflag, l_quantity)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    (est.keySet diff exact.keySet).foreach { k =>
      assert(est(k) <= 5.0, s"num-rollup phantom set $k carries real mass: ${est(k)}")
    }
    (exact.keySet diff est.keySet).foreach { k =>
      assert(exact(k) <= 5.0, s"num-rollup dropped set $k has real rows: ${exact(k)}")
    }
    (est.keySet intersect exact.keySet).foreach { k =>
      assert(qerr(est(k), exact(k)) <= 3.0 || math.abs(est(k) - exact(k)) <= 10.0,
        s"num-rollup set $k: ${est(k)} vs ${exact(k)}")
    }
    // SUM per numeric set, and the near-continuous cap stays loud
    val sumSql = """SELECT l_quantity, SUM(l_extendedprice) FROM lineitem
                    WHERE l_quantity < 5 GROUP BY CUBE(l_quantity)""".stripMargin
    val sumEst = SqlEstimate.estimate(ens, sumSql) match {
      case SqlEstimate.GroupSets(rows) =>
        rows.map { case (g, e) => g.head.getOrElse("ALL") -> e.value }.toMap
      case other => fail(s"expected grouping sets, got $other")
    }
    val sumExact = spark.sql(
      """SELECT coalesce(cast(cast(l_quantity AS bigint) AS string), 'ALL'), SUM(l_extendedprice)
         FROM lineitem WHERE l_quantity < 5 GROUP BY CUBE(l_quantity)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sumEst.keySet == sumExact.keySet,
      s"numeric CUBE keys ${sumEst.keySet} vs ${sumExact.keySet}")
    sumExact.foreach { case (k, v) =>
      assert(qerr(math.max(sumEst(k), 1.0), math.max(v, 1.0)) <= 1.5,
        s"numeric CUBE SUM set $k: ${sumEst(k)} vs $v")
    }
    assertThrows[IllegalArgumentException](SqlEstimate.estimate(ens,
      "SELECT l_extendedprice, COUNT(*) FROM lineitem GROUP BY ROLLUP(l_extendedprice)"))
    // r16 (VERDICT item 8): a parenthesized OR composes with NUMERIC
    // grouping sets — per-set value pins conjoin both branches through
    // orTupleRows (supports union across branches), the () set answers
    // through the scalar inclusion-exclusion estimators
    val orSql = """SELECT l_returnflag, l_quantity, COUNT(*) FROM lineitem
                   WHERE (l_discount < 0.02 OR l_tax > 0.06) AND l_quantity < 8
                   GROUP BY ROLLUP(l_returnflag, l_quantity)""".stripMargin
    val orEst = SqlEstimate.estimate(ens, orSql) match {
      case SqlEstimate.GroupSets(rows) =>
        rows.map { case (g, e) =>
          (g(0).getOrElse("ALL"), g(1).getOrElse("ALL")) -> e.value
        }.toMap
      case other => fail(s"expected grouping sets, got $other")
    }
    val orExact = spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL'),
                coalesce(cast(cast(l_quantity AS bigint) AS string), 'ALL'), COUNT(*)
         FROM lineitem WHERE (l_discount < 0.02 OR l_tax > 0.06) AND l_quantity < 8
         GROUP BY ROLLUP(l_returnflag, l_quantity)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    (orEst.keySet diff orExact.keySet).foreach { k =>
      assert(orEst(k) <= 5.0, s"OR num-rollup phantom set $k carries real mass: ${orEst(k)}")
    }
    (orExact.keySet diff orEst.keySet).foreach { k =>
      assert(orExact(k) <= 5.0, s"OR num-rollup dropped set $k has real rows: ${orExact(k)}")
    }
    (orEst.keySet intersect orExact.keySet).foreach { k =>
      assert(qerr(orEst(k), orExact(k)) <= 3.0 || math.abs(orEst(k) - orExact(k)) <= 10.0,
        s"OR num-rollup set $k: ${orEst(k)} vs ${orExact(k)}")
    }
  }

  test("date-shaped NOT IN over a CATEGORICAL column resolves to the string complement") {
    // the parser classifies '2020-01-01' as a date literal; on a cat
    // column whose dictionary holds ISO-date-like STRINGS both planes must
    // resolve the complement by the column's KIND, not the literal's shape
    import org.apache.spark.sql.functions.{array, col, element_at, lit, pmod}
    val d = java.nio.file.Files.createTempDirectory("graft-sql-datecat-").toString
    spark.range(300).toDF("id")
      .withColumn("day_tag",
        element_at(array(lit("2020-01-01"), lit("2020-01-02"), lit("2020-01-03")),
          (pmod(col("id"), lit(3)) + 1).cast("int")))
      .withColumn("x", pmod(col("id"), lit(50)).cast("double"))
      .write.parquet(s"$d/evlog.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$d/graft_schema.json"),
      """{"tables": [{"name": "evlog", "primaryKey": ["id"]}],
        | "modeled": {"evlog": [{"col": "day_tag", "kind": "cat"},
        |                       {"col": "x", "kind": "num"}]}}""".stripMargin)
    val sql = "SELECT COUNT(*) FROM evlog WHERE day_tag NOT IN ('2020-01-01')"
    val exact = SqlExact.compile(spark, d, sql).head().getDouble(0)
    assert(exact == 200.0, s"exact plane must drop the matching third: $exact")
    val est = SqlEstimate.estimate(Ensemble.get(spark, d), sql,
      graft.schema.DatasetSpec.forDir(spark, d)) match {
      case SqlEstimate.Scalar(e) => e.value
      case other                 => fail(s"expected scalar, got $other")
    }
    assert(math.abs(est - 200.0) <= 5.0, s"estimate-plane string complement: $est")
  }

  test("time-of-day grouping and secs-resolved date predicates on the text plane") {
    // r16 late: hour(ts)/minute(ts) fold over the SECS-modeled stream
    // table (cyclic step slices), dayofmonth(d) over either date
    // encoding, year(ts) resolves the ×86 400 encoding, and date-SHAPED
    // predicate literals rescale to the column's modeled unit — without
    // that, `ts >= DATE'...'` would probe epoch-day bounds against an
    // epoch-second domain and estimate silently near-zero
    views
    schema.Tables(spark, sf, "events").createOrReplaceTempView("events")
    def estGroups(sql: String): Map[String, Double] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.mkString("|") -> e.value }.toMap
        case other                    => fail(s"expected groups, got $other")
      }
    def cellCheck(est: Map[String, Double], exact: Map[String, Double], what: String): Unit = {
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
    // the kind-resolved DATE predicate over the secs column (scalar)
    val pSql = """SELECT COUNT(*) FROM events
                  WHERE ts >= DATE '2024-01-08' AND ts < DATE '2024-01-15'""".stripMargin
    val pExact = spark.sql(pSql).head().getLong(0).toDouble
    val pEst = estScalar(pSql)
    assert(pExact > 100.0, s"the window must hold real rows: $pExact")
    assert(qerr(pEst, pExact) <= 1.5, s"secs-date predicate: est $pEst vs exact $pExact")
    // hour-of-day over the full stream table
    val hSql = "SELECT hour(ts), COUNT(*) FROM events GROUP BY hour(ts)"
    val hExact = spark.sql(hSql).collect()
      .map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    cellCheck(estGroups(hSql), hExact, "hour-of-day")
    // hour × dimension enumerates per key like any calendar bucket
    val dSql = """SELECT hour(ts), event_type, COUNT(*) FROM events
                  GROUP BY hour(ts), event_type""".stripMargin
    val dExact = spark.sql(dSql).collect()
      .map(r => s"${r.getInt(0)}|${r.getString(1)}" -> r.getLong(2).toDouble).toMap
    cellCheck(estGroups(dSql), dExact, "hour×dim")
    // minute-of-hour folds only under a predicate-narrowed span (the full
    // 30-day domain is 720 hour-periods — past the 400 cap)
    val mSql = """SELECT minute(ts), COUNT(*) FROM events
                  WHERE ts < DATE '2024-01-02' GROUP BY minute(ts)""".stripMargin
    val mExact = spark.sql(mSql).collect()
      .map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    cellCheck(estGroups(mSql), mExact, "minute-of-hour")
    intercept[Exception] {
      estGroups("SELECT minute(ts), COUNT(*) FROM events GROUP BY minute(ts)")
    }
    // year() over the secs column rides the same units dispatch
    val ySql = "SELECT year(ts), COUNT(*) FROM events GROUP BY year(ts)"
    val yExact = spark.sql(ySql).collect()
      .map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    cellCheck(estGroups(ySql), yExact, "year-over-secs")
    // dayofmonth over the days-modeled orders date
    val domSql = """SELECT dayofmonth(o_orderdate), COUNT(*) FROM orders
                    GROUP BY dayofmonth(o_orderdate)""".stripMargin
    val domExact = spark.sql(domSql).collect()
      .map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    cellCheck(estGroups(domSql), domExact, "dayofmonth")
    // hour over a DAYS-modeled column fails loudly at parse (kind gate)
    intercept[Exception] {
      estGroups("SELECT hour(o_orderdate), COUNT(*) FROM orders GROUP BY hour(o_orderdate)")
    }
  }

  test("± combinations and COUNT(DISTINCT) ride bucketed GROUP BY on the text plane") {
    // r16 late: the last bucket-plane asymmetries — `SUM(a) − COUNT(*)`
    // per calendar bucket (each linear term per bucket, combined with
    // interval-arithmetic CIs) and per-bucket distinct counts (dictionary
    // enumeration under the bucket's range atoms; under OR, the UNION of
    // both branches' enumerations — set semantics, never the IE sum)
    views
    def estGroups(sql: String): Map[String, Double] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.mkString("|") -> e.value }.toMap
        case other                    => fail(s"expected groups, got $other")
      }
    val cSql = """SELECT year(o_orderdate), SUM(o_totalprice) - COUNT(*) FROM orders
                  GROUP BY year(o_orderdate)""".stripMargin
    val cExact = spark.sql(cSql).collect()
      .map(r => r.getInt(0).toString -> r.getDouble(1)).toMap
    val cEst = estGroups(cSql)
    assert(cEst.keySet == cExact.keySet, s"combo keys ${cEst.keySet} vs ${cExact.keySet}")
    cExact.foreach { case (k, v) =>
      assert(qerr(cEst(k), v) <= 1.5, s"bucket ± cell $k: ${cEst(k)} vs $v")
    }
    // the same combination under a cross-column disjunction
    val coSql = """SELECT year(o_orderdate), SUM(o_totalprice) - COUNT(*) FROM orders
                   WHERE (o_orderpriority = '1-URGENT') OR (o_totalprice > 200000)
                   GROUP BY year(o_orderdate)""".stripMargin
    val coExact = spark.sql(coSql).collect()
      .map(r => r.getInt(0).toString -> r.getDouble(1)).toMap
    val coEst = estGroups(coSql)
    (coEst.keySet intersect coExact.keySet).foreach { k =>
      assert(qerr(coEst(k), coExact(k)) <= 1.5, s"OR ± cell $k: ${coEst(k)} vs ${coExact(k)}")
    }
    // per-bucket distinct counts, plain and disjunctive
    val dSql = """SELECT year(o_orderdate), COUNT(DISTINCT o_orderpriority) FROM orders
                  GROUP BY year(o_orderdate)""".stripMargin
    val dExact = spark.sql(dSql).collect()
      .map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    val dEst = estGroups(dSql)
    assert(dEst.keySet == dExact.keySet)
    dExact.foreach { case (k, v) =>
      assert(math.abs(dEst(k) - v) <= 1.0, s"bucket distinct cell $k: ${dEst(k)} vs $v")
    }
    val doSql = """SELECT year(o_orderdate), COUNT(DISTINCT o_orderpriority) FROM orders
                   WHERE (o_orderpriority = '1-URGENT') OR (o_totalprice > 300000)
                   GROUP BY year(o_orderdate)""".stripMargin
    val doExact = spark.sql(doSql).collect()
      .map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    val doEst = estGroups(doSql)
    (doEst.keySet intersect doExact.keySet).foreach { k =>
      assert(math.abs(doEst(k) - doExact(k)) <= 2.0,
        s"OR distinct cell $k: ${doEst(k)} vs ${doExact(k)}")
    }
    // bucket × dim × ± composes through the same tuple machinery
    val mSql = """SELECT year(o_orderdate), o_orderpriority, SUM(o_totalprice) - COUNT(*)
                  FROM orders GROUP BY year(o_orderdate), o_orderpriority""".stripMargin
    val mExact = spark.sql(mSql).collect()
      .map(r => s"${r.getInt(0)}|${r.getString(1)}" -> r.getDouble(2)).toMap
    val mEst = estGroups(mSql)
    (mEst.keySet intersect mExact.keySet).foreach { k =>
      assert(qerr(mEst(k), mExact(k)) <= 2.0, s"bucket×dim ± cell $k: ${mEst(k)} vs ${mExact(k)}")
    }
    assert((mExact.keySet diff mEst.keySet).isEmpty || mExact.size > mEst.size,
      "bucket×dim ± must enumerate the shared universe")
  }

  test("date_format grouping folds as merged daily buckets on the text plane") {
    // r16 late parity with the Catalyst date_format fold: keys evaluate
    // through SPARK'S own formatter (Catalyst DateFormatClass at each
    // day's UTC midnight), so they match the exact plane bit-for-bit;
    // equal keys merge their day ranges ('yyyy-MM' → months, 'EEEE' → 7)
    views
    schema.Tables(spark, sf, "events").createOrReplaceTempView("events")
    def estGroups(sql: String): Map[String, Double] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.mkString("|") -> e.value }.toMap
        case other                    => fail(s"expected groups, got $other")
      }
    val mSql = """SELECT date_format(o_orderdate, 'yyyy-MM'), COUNT(*) FROM orders
                  WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
                  GROUP BY date_format(o_orderdate, 'yyyy-MM')""".stripMargin
    val mExact = spark.sql(mSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val mEst = estGroups(mSql)
    assert(mEst.keySet == mExact.keySet, s"month keys ${mEst.keySet} vs ${mExact.keySet}")
    mExact.foreach { case (k, v) =>
      assert(qerr(mEst(k), v) <= 1.5, s"month $k: ${mEst(k)} vs $v")
    }
    // weekday merge over the secs-modeled stream column (units ×86 400)
    val wSql = """SELECT date_format(ts, 'EEEE'), SUM(value) FROM events
                  GROUP BY date_format(ts, 'EEEE')""".stripMargin
    val wExact = spark.sql(wSql).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val wEst = estGroups(wSql)
    assert(wEst.keySet == wExact.keySet, s"weekday keys ${wEst.keySet} vs ${wExact.keySet}")
    wExact.foreach { case (k, v) =>
      assert(qerr(wEst(k), v) <= 1.5, s"weekday $k: ${wEst(k)} vs $v")
    }
    // SqlExact compiles the same grouping; keys agree with spark.sql
    val gotExact = SqlExact.compile(spark, sf, mSql).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotExact.keySet == mExact.keySet)
    // r17 (VERDICT item 4): the SUB-DAY spelling answers as hour-step
    // buckets over the secs-modeled column, merged on equal keys —
    // text-plane parity with the Catalyst sub-day arm
    val subSql = """SELECT date_format(ts, 'yyyy-MM-dd HH'), COUNT(*) FROM events
                    WHERE ts < DATE '2024-01-08'
                    GROUP BY date_format(ts, 'yyyy-MM-dd HH')""".stripMargin
    val subExact = spark.sql(subSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val subEst = estGroups(subSql)
    assert(subEst.keySet.forall(_.matches("2024-01-0\\d \\d\\d")),
      s"sub-day keys: ${subEst.keySet.take(3)}")
    (subEst.keySet diff subExact.keySet).foreach { k =>
      assert(subEst(k) <= 5.0, s"sub-day phantom $k carries real mass: ${subEst(k)}")
    }
    (subExact.keySet diff subEst.keySet).foreach { k =>
      assert(subExact(k) <= 5.0, s"sub-day dropped $k has real rows: ${subExact(k)}")
    }
    (subEst.keySet intersect subExact.keySet).foreach { k =>
      assert(qerr(subEst(k), subExact(k)) <= 3.0 || math.abs(subEst(k) - subExact(k)) <= 10.0,
        s"sub-day cell $k: ${subEst(k)} vs ${subExact(k)}")
    }
    // r19: a SECOND-granular format folds when the predicate-narrowed
    // span fits the bucket cap at a 1-second step (numeric bounds are
    // epoch seconds — the secs model encoding; 1200 s = 1200 buckets).
    // The fixture is sparse (~1.4 events/hour) so cells sit under the
    // half-row emission gate — the pin is that the fold ANSWERS (the r18
    // posture was a blanket parse refusal) with well-formed keys and no
    // non-trivial divergence from exact.
    val secLo = 1704103200L // 2024-01-01 10:00:00 UTC
    val secSql = s"""SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss'), COUNT(*) FROM events
                     WHERE ts >= $secLo AND ts < ${secLo + 1200}
                     GROUP BY date_format(ts, 'yyyy-MM-dd HH:mm:ss')"""
    val secEst = estGroups(secSql)
    val secExact = spark.sql(
      s"""SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss'), COUNT(*) FROM events
          WHERE ts >= timestamp_seconds($secLo) AND ts < timestamp_seconds(${secLo + 1200})
          GROUP BY date_format(ts, 'yyyy-MM-dd HH:mm:ss')""")
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    secEst.keys.foreach(k => assert(k.matches("2024-01-01 10:[0-1]\\d:\\d\\d"), s"second key $k"))
    (secEst.keySet diff secExact.keySet).foreach { k =>
      assert(secEst(k) <= 5.0, s"second-bucket phantom $k carries real mass: ${secEst(k)}")
    }
    (secExact.keySet diff secEst.keySet).foreach { k =>
      assert(secExact(k) <= 5.0, s"second-bucket dropped $k has real rows: ${secExact(k)}")
    }
    // an UNCAPPED second-granular span still refuses loudly — now at the
    // bucket cap (the span), no longer at parse (the format)
    intercept[Exception] {
      estGroups("""SELECT date_format(ts, 'yyyy-MM-dd HH:mm:ss'), COUNT(*) FROM events
                   GROUP BY date_format(ts, 'yyyy-MM-dd HH:mm:ss')""".stripMargin)
    }
    intercept[Exception] {
      estGroups("""SELECT date_format(o_orderdate, 'yyyy-MM-dd HH'), COUNT(*) FROM orders
                   GROUP BY date_format(o_orderdate, 'yyyy-MM-dd HH')""".stripMargin)
    }
    // the uncapped 7-year orders span is past the 2000-day interval cap: loud
    intercept[Exception] {
      estGroups("""SELECT date_format(o_orderdate, 'yyyy-MM'), COUNT(*) FROM orders
                   GROUP BY date_format(o_orderdate, 'yyyy-MM')""".stripMargin)
    }
  }

  test("COUNT(DISTINCT <num-modeled>) answers via realized-value support on the text plane") {
    // r16 late parity with the Catalyst plane's CountDistinctNumOut: a
    // num-modeled column's distinct count enumerates its mass-filtered
    // realized support (at sf0.001 the training sample IS the table, so
    // same-column-predicate shapes are exact); under OR the branches
    // UNION. A column outside the model keeps failing loudly.
    views
    val sql = """SELECT COUNT(DISTINCT l_quantity) FROM lineitem
                 WHERE l_quantity >= 10 AND l_quantity < 30""".stripMargin
    val exact = spark.sql(sql).head().getLong(0).toDouble
    val est = estScalar(sql)
    assert(math.abs(est - exact) <= 2.0, s"num distinct: $est vs $exact")
    val orSql = """SELECT COUNT(DISTINCT l_quantity) FROM lineitem
                   WHERE (l_quantity < 5) OR (l_quantity >= 45)""".stripMargin
    val orExact = spark.sql(orSql).head().getLong(0).toDouble
    val orEst = estScalar(orSql)
    assert(math.abs(orEst - orExact) <= 2.0, s"num distinct OR: $orEst vs $orExact")
    // per calendar bucket, through the same orTupleRows scalar quadrant
    val bSql = """SELECT year(o_orderdate), COUNT(DISTINCT o_orderpriority) FROM orders
                  WHERE o_totalprice > 100000 GROUP BY year(o_orderdate)""".stripMargin
    val bExact = spark.sql(bSql).collect()
      .map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    val bEst = SqlEstimate.estimate(ens, bSql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.mkString("|") -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    (bEst.keySet intersect bExact.keySet).foreach { k =>
      assert(math.abs(bEst(k) - bExact(k)) <= 1.0,
        s"bucket distinct cell $k: ${bEst(k)} vs ${bExact(k)}")
    }
    // unmodeled columns stay loud
    intercept[Exception] {
      estScalar("SELECT COUNT(DISTINCT l_orderkey) FROM lineitem")
    }
  }

  test("tumbling and sliding window grouping on the text plane") {
    // r16 late: `GROUP BY window(ts, '<size>'[, '<slide>'])` — keys render
    // as the exact plane's struct Row.toString ("[start,end]" with
    // java.sql.Timestamp fields), so per-group grading pairs the planes'
    // cells verbatim; sliding buckets OVERLAP (each an independent range
    // query), exactly the Catalyst sliding fold's semantics
    views
    schema.Tables(spark, sf, "events").createOrReplaceTempView("events")
    def estGroups(sql: String): Map[String, Double] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.mkString("|") -> e.value }.toMap
        case other                    => fail(s"expected groups, got $other")
      }
    def cellCheck(est: Map[String, Double], exact: Map[String, Double], what: String): Unit = {
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
    // tumbling daily windows over the whole 30-day stream
    val tSql = """SELECT window(ts, '1 day'), COUNT(*) FROM events
                  GROUP BY window(ts, '1 day')""".stripMargin
    val tExact = spark.sql(tSql).collect()
      .map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    val tEst = estGroups(tSql)
    assert(tEst.nonEmpty && tEst.keySet.forall(_.startsWith("[2024-")),
      s"window keys must render as struct strings: ${tEst.keySet.take(3)}")
    cellCheck(tEst, tExact, "tumbling-daily")
    // sliding: 2-day span, 1-day slide — overlapping buckets
    val sSql = """SELECT window(ts, '2 days', '1 day'), COUNT(*) FROM events
                  GROUP BY window(ts, '2 days', '1 day')""".stripMargin
    val sExact = spark.sql(sSql).collect()
      .map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    cellCheck(estGroups(sSql), sExact, "sliding-2d1d")
    assert(sExact.size > tExact.size - 2 && sExact.size >= 30,
      s"sliding must emit ~one window per slide: ${sExact.size}")
    // window × dimension enumerates per bucket
    val dSql = """SELECT window(ts, '1 day'), event_type, COUNT(*) FROM events
                  WHERE ts < DATE '2024-01-15'
                  GROUP BY window(ts, '1 day'), event_type""".stripMargin
    val dExact = spark.sql(dSql).collect()
      .map(r => s"${r.getStruct(0)}|${r.getString(1)}" -> r.getLong(2).toDouble).toMap
    cellCheck(estGroups(dSql), dExact, "window×dim")
    // SUM rides the same bucket path (whole-bucket mass: ~33 rows/day at
    // this SF; the guard allows one row of value ≈ 500 on sparse days)
    val wSql = """SELECT window(ts, '1 day'), SUM(value) FROM events
                  GROUP BY window(ts, '1 day')""".stripMargin
    val wExact = spark.sql(wSql).collect()
      .map(r => r.getStruct(0).toString -> r.getDouble(1)).toMap
    val wEst = estGroups(wSql)
    (wEst.keySet intersect wExact.keySet).foreach { k =>
      assert(qerr(wEst(k), wExact(k)) <= 3.0 || math.abs(wEst(k) - wExact(k)) <= 500.0,
        s"window SUM cell $k: ${wEst(k)} vs ${wExact(k)}")
    }
    // the r16 bucket-plane closures compose with window buckets through
    // the SAME orTupleRows quadrants: per-window distinct counts and ±
    // combinations, incl. under a cross-column disjunction
    val cdSql = """SELECT window(ts, '1 day'), COUNT(DISTINCT event_type) FROM events
                   GROUP BY window(ts, '1 day')""".stripMargin
    val cdExact = spark.sql(cdSql).collect()
      .map(r => r.getStruct(0).toString -> r.getLong(1).toDouble).toMap
    val cdEst = estGroups(cdSql)
    assert(cdEst.keySet == cdExact.keySet)
    cdExact.foreach { case (k, v) =>
      assert(math.abs(cdEst(k) - v) <= 1.0, s"window distinct cell $k: ${cdEst(k)} vs $v")
    }
    val cbSql = """SELECT window(ts, '1 day'), SUM(value) - COUNT(*) FROM events
                   WHERE (event_type = 'purchase') OR (value > 400)
                   GROUP BY window(ts, '1 day')""".stripMargin
    val cbExact = spark.sql(cbSql).collect()
      .map(r => r.getStruct(0).toString -> r.getDouble(1)).toMap
    val cbEst = estGroups(cbSql)
    (cbEst.keySet intersect cbExact.keySet).foreach { k =>
      assert(qerr(cbEst(k), cbExact(k)) <= 3.0 || math.abs(cbEst(k) - cbExact(k)) <= 500.0,
        s"window OR ± cell $k: ${cbEst(k)} vs ${cbExact(k)}")
    }
    // r17: the full 30-day hourly series (720 windows) ANSWERS under the
    // pure-interval cap — the monthly hourly dashboard on the text plane
    val hourlyAll = estGroups(
      "SELECT window(ts, '1 hour'), COUNT(*) FROM events GROUP BY window(ts, '1 hour')")
    // sparse hours (~1.4 rows each at sf0.001) fold out through the
    // half-row gate; >400 emitted buckets proves the old cap is gone
    assert(hourlyAll.size > 400, s">400 hourly windows expected, got ${hourlyAll.size}")
    // a minute-level series (~43k windows) keeps the loud cap
    intercept[Exception] {
      estGroups("SELECT window(ts, '1 minute'), COUNT(*) FROM events GROUP BY window(ts, '1 minute')")
    }
    // windows need a secs-modeled column: days-modeled dates gate at parse
    intercept[Exception] {
      estGroups(
        """SELECT window(o_orderdate, '1 day'), COUNT(*) FROM orders
           GROUP BY window(o_orderdate, '1 day')""".stripMargin)
    }
    // Spark allows ONE window expression per query — the text plane must
    // fail the two-window shape, not answer what the exact plane throws on
    // (r16 ADVICE)
    val twoWin = intercept[IllegalArgumentException] {
      estGroups(
        """SELECT window(ts, '1 day'), window(ts, '2 days'), COUNT(*) FROM events
           GROUP BY window(ts, '1 day'), window(ts, '2 days')""".stripMargin)
    }
    assert(twoWin.getMessage.contains("multiple WINDOW"), twoWin.getMessage)
  }
  test("two independent OR groups compose on the text plane (signed 3^N expansion)") {
    // r17 (VERDICT item 3): (A∨B) AND (C∨D) answers through Ensemble's
    // signed expansion — Π_g (1_A + 1_B − 1_AB) distributed into ≤ 3^N
    // conjunctive terms, exact linearity for COUNT/SUM — closing the plane
    // divergence where Catalyst composed multiple disjunctions but the
    // text plane refused them. Scalar, flat GROUP BY, and numeric-bearing
    // ROLLUP all compose; buckets and 4+ groups stay loud.
    views
    def est(sql: String): Double = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Scalar(e) => e.value
      case other                 => fail(s"expected scalar, got $other")
    }
    def estGroups(sql: String): Map[String, Double] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Groups(rows) =>
          rows.map { case (k, e) => k.mkString("|") -> e.value }.toMap
        case other => fail(s"expected groups, got $other")
      }
    val where2 =
      """WHERE (l_discount < 0.02 OR l_tax > 0.06)
        |  AND (l_quantity < 15 OR l_quantity > 40)""".stripMargin
    // scalar COUNT / SUM / AVG
    val cSql = s"SELECT COUNT(*) FROM lineitem $where2"
    val cExact = spark.sql(cSql).head().getLong(0).toDouble
    assert(qerr(est(cSql), cExact) <= 1.3, s"2-OR COUNT: ${est(cSql)} vs $cExact")
    val sSql = s"SELECT SUM(l_extendedprice) FROM lineitem $where2"
    val sExact = spark.sql(sSql).head().getDouble(0)
    assert(qerr(est(sSql), sExact) <= 1.3, s"2-OR SUM: ${est(sSql)} vs $sExact")
    val aSql = s"SELECT AVG(l_extendedprice) FROM lineitem $where2"
    val aExact = spark.sql(aSql).head().getDouble(0)
    assert(qerr(est(aSql), aExact) <= 1.3, s"2-OR AVG: ${est(aSql)} vs $aExact")
    // ± combination rides the signed expansion
    val pmSql = s"SELECT SUM(l_extendedprice) - SUM(l_quantity) FROM lineitem $where2"
    val pmExact = spark.sql(pmSql).head().getDouble(0)
    assert(qerr(est(pmSql), pmExact) <= 1.3, s"2-OR ±: ${est(pmSql)} vs $pmExact")
    // flat GROUP BY over a dictionary column
    val gSql = s"SELECT l_returnflag, COUNT(*) FROM lineitem $where2 GROUP BY l_returnflag"
    val gExact = spark.sql(gSql).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val gEst = estGroups(gSql)
    (gExact.keySet intersect gEst.keySet).foreach { k =>
      assert(qerr(gEst(k), gExact(k)) <= 2.0 || math.abs(gEst(k) - gExact(k)) <= 10.0,
        s"2-OR group $k: ${gEst(k)} vs ${gExact(k)}")
    }
    (gExact.keySet diff gEst.keySet).foreach { k =>
      assert(gExact(k) <= 5.0, s"2-OR dropped group $k has real rows: ${gExact(k)}")
    }
    // numeric-bearing ROLLUP under two OR groups (the verdict's pin shape)
    val rSql = s"""SELECT l_returnflag, l_quantity, COUNT(*) FROM lineitem
                   WHERE (l_discount < 0.02 OR l_tax > 0.06)
                     AND (l_quantity < 8 OR l_quantity > 48)
                   GROUP BY ROLLUP(l_returnflag, l_quantity)"""
    val rEst = SqlEstimate.estimate(ens, rSql) match {
      case SqlEstimate.GroupSets(rows) =>
        rows.map { case (g, e) =>
          (g(0).getOrElse("ALL"), g(1).getOrElse("ALL")) -> e.value
        }.toMap
      case other => fail(s"expected grouping sets, got $other")
    }
    val rExact = spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL'),
                coalesce(cast(cast(l_quantity AS bigint) AS string), 'ALL'), COUNT(*)
         FROM lineitem
         WHERE (l_discount < 0.02 OR l_tax > 0.06)
           AND (l_quantity < 8 OR l_quantity > 48)
         GROUP BY ROLLUP(l_returnflag, l_quantity)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toDouble).toMap
    (rEst.keySet diff rExact.keySet).foreach { k =>
      assert(rEst(k) <= 5.0, s"2-OR num-rollup phantom set $k carries real mass: ${rEst(k)}")
    }
    (rExact.keySet diff rEst.keySet).foreach { k =>
      assert(rExact(k) <= 5.0, s"2-OR num-rollup dropped set $k has real rows: ${rExact(k)}")
    }
    (rEst.keySet intersect rExact.keySet).foreach { k =>
      assert(qerr(rEst(k), rExact(k)) <= 3.0 || math.abs(rEst(k) - rExact(k)) <= 10.0,
        s"2-OR num-rollup set $k: ${rEst(k)} vs ${rExact(k)}")
    }
    // three groups still answer; FOUR fail loudly at parse (the 3^N cap)
    val c3Sql = """SELECT COUNT(*) FROM lineitem
                   WHERE (l_discount < 0.02 OR l_tax > 0.06)
                     AND (l_quantity < 15 OR l_quantity > 40)
                     AND (l_returnflag IN ('A') OR l_linestatus IN ('O'))"""
    val c3Exact = spark.sql(c3Sql).head().getLong(0).toDouble
    assert(qerr(math.max(est(c3Sql), 1.0), math.max(c3Exact, 1.0)) <= 1.5,
      s"3-OR COUNT: ${est(c3Sql)} vs $c3Exact")
    // four GENUINE (cross-column) groups fail loudly; note the r18 CNF
    // absorption means a same-column group no longer counts toward the cap
    intercept[IllegalArgumentException] {
      est("""SELECT COUNT(*) FROM lineitem
             WHERE (l_discount < 0.02 OR l_tax > 0.06)
               AND (l_quantity < 15 OR l_extendedprice > 50000)
               AND (l_returnflag IN ('A') OR l_linestatus IN ('O'))
               AND (l_tax < 0.01 OR l_discount > 0.09)""")
    }
    // bucket GROUP BY composes with two OR groups through the same signed
    // expansion (each bucket range conjoins every group's branches)
    val bSql = """SELECT year(l_shipdate), COUNT(*) FROM lineitem
                  WHERE (l_discount < 0.02 OR l_tax > 0.06)
                    AND (l_quantity < 15 OR l_quantity > 40)
                  GROUP BY year(l_shipdate)"""
    val bExact = spark.sql(bSql).collect()
      .map(r => r.getInt(0).toString -> r.getLong(1).toDouble).toMap
    val bEst = estGroups(bSql)
    (bExact.keySet intersect bEst.keySet).foreach { k =>
      assert(qerr(bEst(k), bExact(k)) <= 2.0 || math.abs(bEst(k) - bExact(k)) <= 10.0,
        s"2-OR year bucket $k: ${bEst(k)} vs ${bExact(k)}")
    }
    (bExact.keySet diff bEst.keySet).foreach { k =>
      assert(bExact(k) <= 5.0, s"2-OR dropped bucket $k has real rows: ${bExact(k)}")
    }
    // bin buckets × dims × two ORs through the same tuple machinery
    val binSql = """SELECT floor(l_extendedprice/20000), l_returnflag, COUNT(*) FROM lineitem
                    WHERE (l_discount < 0.02 OR l_tax > 0.06)
                      AND (l_quantity < 15 OR l_quantity > 40)
                    GROUP BY floor(l_extendedprice/20000), l_returnflag"""
    val binExact = spark.sql(binSql).collect()
      .map(r => s"${r.getLong(0)}|${r.getString(1)}" -> r.getLong(2).toDouble).toMap
    val binEst = estGroups(binSql)
    (binExact.keySet intersect binEst.keySet).foreach { k =>
      assert(qerr(binEst(k), binExact(k)) <= 3.0 || math.abs(binEst(k) - binExact(k)) <= 10.0,
        s"2-OR bin×dim cell $k: ${binEst(k)} vs ${binExact(k)}")
    }
  }
  test("signed-expansion sweep: a deterministic two-OR grid agrees with the exact plane") {
    // r17 wrong-answer protection for the multi-OR surface: a fixed grid
    // of 48 two-group WHERE clauses (numeric ranges × dictionary points ×
    // same-column unions, crossing selectivities) — every cell's signed
    // 3^N COUNT must track the exact plane. Deterministic, so the gate
    // can never flake; failures name the exact clause.
    views
    val g1 = Seq(
      "(l_quantity < 10 OR l_quantity > 40)",
      "(l_quantity < 25 OR l_discount > 0.05)",
      "(l_returnflag = 'A' OR l_linestatus = 'O')",
      "(l_discount < 0.02 OR l_tax > 0.06)",
      "(l_extendedprice < 20000 OR l_extendedprice > 80000)",
      "(l_returnflag = 'R' OR l_quantity > 45)")
    val g2 = Seq(
      "(l_tax < 0.01 OR l_tax > 0.07)",
      "(l_linestatus = 'F' OR l_discount < 0.03)",
      "(l_quantity BETWEEN 20 AND 30 OR l_extendedprice > 60000)",
      "(l_returnflag = 'N' OR l_quantity < 15)",
      "(l_discount > 0.08 OR l_extendedprice < 10000)",
      "(l_quantity > 35 OR l_linestatus = 'O')",
      "(l_tax BETWEEN 0.02 AND 0.05 OR l_returnflag = 'A')",
      "(l_extendedprice BETWEEN 30000 AND 50000 OR l_discount < 0.01)")
    var worst = (0.0, "")
    for (a <- g1; b <- g2) {
      val sql = s"SELECT COUNT(*) FROM lineitem WHERE $a AND $b"
      val exact = spark.sql(sql).head().getLong(0).toDouble
      val est = SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.Scalar(e) => e.value
        case other                 => fail(s"expected scalar for [$sql], got $other")
      }
      assert(est >= 0.0, s"signed COUNT must clamp at zero for [$sql]: $est")
      val q = qerr(math.max(est, 1.0), math.max(exact, 1.0))
      if (q > worst._1) worst = (q, sql)
      assert(q <= 2.0 || math.abs(est - exact) <= 15.0,
        s"signed-expansion cell [$sql]: est $est vs exact $exact (qerr $q)")
    }
    info(f"48-cell sweep worst qerr ${worst._1}%.3f (${worst._2.take(100)})")
  }
  test("AVG-bearing ± combos ride calendar buckets on the text plane") {
    // r18 (VERDICT item 6, text-plane parity): per-bucket AVG terms go
    // through the same ratio machinery as the flat grouped combo
    views
    val sql = """SELECT year(l_shipdate), AVG(l_extendedprice) - AVG(l_quantity)
                 FROM lineitem GROUP BY year(l_shipdate)"""
    val est = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val exact = spark.sql(sql).collect()
      .map(r => r.getInt(0).toString -> r.getDouble(1)).toMap
    assert(est.keySet == exact.keySet, s"${est.keySet} vs ${exact.keySet}")
    exact.foreach { case (k, x) =>
      assert(qerr(math.max(est(k), 1.0), math.max(x, 1.0)) <= 1.3,
        s"year AVG± bucket $k: ${est(k)} vs $x")
    }
    // under a disjunction too (the or-branch bucket body's AVG term arm)
    val orSql = """SELECT year(l_shipdate), AVG(l_extendedprice) + AVG(l_tax)
                   FROM lineitem WHERE (l_quantity < 15 OR l_tax > 0.05)
                   GROUP BY year(l_shipdate)"""
    val orEst = SqlEstimate.estimate(ens, orSql) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val orExact = spark.sql(orSql).collect()
      .map(r => r.getInt(0).toString -> r.getDouble(1)).toMap
    (orExact.keySet intersect orEst.keySet).foreach { k =>
      assert(qerr(math.max(orEst(k), 1.0), math.max(orExact(k), 1.0)) <= 1.5,
        s"year OR AVG± bucket $k: ${orEst(k)} vs ${orExact(k)}")
    }
  }

  test("CNF pre-simplification: same-column disjunctions absorb before the group count") {
    // r18 (VERDICT missing #1): a parenthesized OR group whose branches
    // predicate the SAME column collapses to one plain conjunct (range
    // union / value-set union) BEFORE the 3^N cap counts groups.
    views
    // structural pins, via the parser itself
    def p(where: String) = SqlParser.parseQuery(s"SELECT COUNT(*) FROM lineitem WHERE $where")
    // two-branch value union → one StrIn conjunct, zero OR slots
    val vu = p("(l_returnflag = 'A' OR l_returnflag = 'R')")
    assert(vu.orPreds.isEmpty && vu.orGroupsN.isEmpty)
    assert(vu.preds == Seq(Pred("lineitem", "l_returnflag", StrIn(Seq("A", "R")))))
    // three-way same-column disjunction absorbs too (previously a loud
    // two-branches-only failure)
    val v3 = p("(l_returnflag = 'A' OR l_returnflag = 'R' OR l_returnflag = 'N')")
    assert(v3.preds == Seq(Pred("lineitem", "l_returnflag", StrIn(Seq("A", "R", "N")))))
    // disjoint range union → NumUnion, zero OR slots
    val ru = p("(l_quantity < 10 OR l_quantity > 40)")
    assert(ru.orPreds.isEmpty && ru.orGroupsN.isEmpty)
    assert(ru.preds.map(_.range).forall(_.isInstanceOf[NumUnion]))
    // IS NOT NULL absorbs any same-column branch (every RangeSpec is
    // non-NULL-only under SQL 3VL)
    val nn = p("(l_quantity IS NOT NULL OR l_quantity < 10)")
    assert(nn.preds == Seq(Pred("lineitem", "l_quantity", NotNull)))
    // branch subsumption: (A AND B) OR A ≡ A
    val sub = p("(l_quantity < 10 AND l_discount < 0.05 OR l_quantity < 10)")
    assert(sub.preds == Seq(Pred("lineitem", "l_quantity",
      NumR(Double.NegativeInfinity, 10.0, loIncl = true, hiIncl = false))))
    // FOUR written disjunctions, two of them same-column → 2 effective
    // groups: answers on both planes, and tracks the exact plane
    val four = """SELECT COUNT(*) FROM lineitem
                  WHERE (l_quantity < 10 OR l_quantity > 40)
                    AND (l_returnflag = 'A' OR l_returnflag = 'R')
                    AND (l_discount < 0.02 OR l_tax > 0.06)
                    AND (l_linestatus = 'F' OR l_extendedprice > 60000)"""
    val est = SqlEstimate.estimate(ens, four) match {
      case SqlEstimate.Scalar(e) => e.value
      case other                 => fail(s"expected scalar, got $other")
    }
    val exact = spark.sql(four).head().getLong(0).toDouble
    assert(qerr(math.max(est, 1.0), math.max(exact, 1.0)) <= 2.0,
      s"CNF 4-written/2-effective: est $est vs exact $exact")
    // the absorbed NumUnion also compiles on the ParsedQuery exact plane
    val exactPlane = SqlExact.compile(spark, sf, four).head().getDouble(0)
    assert(exactPlane == exact, s"SqlExact NumUnion parity: $exactPlane vs $exact")
    // absorbed union answers match the unabsorbed spelling (IN-list)
    val inEst = estScalar("SELECT COUNT(*) FROM lineitem WHERE l_returnflag IN ('A','R')")
    val orEst = estScalar("SELECT COUNT(*) FROM lineitem WHERE (l_returnflag = 'A' OR l_returnflag = 'R')")
    assert(math.abs(inEst - orEst) < 1e-6, s"IN vs absorbed OR: $inEst vs $orEst")
  }

  test("± combos ride ROLLUP/CUBE on the text plane (plain and under an OR)") {
    // r18: the grouping-sets paths accept Combo — each term per nonempty
    // set through the per-group builders (the () set through the scalar
    // term builders), distinct leaves via the per-set enumeration — the
    // Catalyst grouping-sets ExprOut fold's shape on the text plane
    views
    def setsOf(sql: String): Map[String, Double] =
      SqlEstimate.estimate(ens, sql) match {
        case SqlEstimate.GroupSets(rows) =>
          rows.map { case (g, e) => g.map(_.getOrElse("ALL")).mkString("|") -> e.value }.toMap
        case other => fail(s"expected grouping sets, got $other")
      }
    val plain = """SELECT l_returnflag, SUM(l_extendedprice) - COUNT(*) FROM lineitem
                   WHERE l_quantity < 30 GROUP BY ROLLUP(l_returnflag)"""
    val plainExact = spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL'), SUM(l_extendedprice) - COUNT(*) FROM lineitem
         WHERE l_quantity < 30 GROUP BY ROLLUP(l_returnflag)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plainEst = setsOf(plain)
    assert(plainEst.keySet == plainExact.keySet)
    plainExact.foreach { case (k, v) =>
      assert(qerr(math.max(plainEst(k), 1.0), math.max(v, 1.0)) <= 1.5,
        s"rollup combo set $k: ${plainEst(k)} vs $v")
    }
    // under a single OR, with a DISTINCT leaf, over CUBE
    val orCube = """SELECT l_linestatus, COUNT(*) - COUNT(DISTINCT l_returnflag) FROM lineitem
                    WHERE (l_quantity < 5) OR (l_quantity > 45) GROUP BY CUBE(l_linestatus)"""
    val orExact = spark.sql(
      """SELECT coalesce(l_linestatus, 'ALL'), COUNT(*) - COUNT(DISTINCT l_returnflag)
         FROM lineitem WHERE l_quantity < 5 OR l_quantity > 45
         GROUP BY CUBE(l_linestatus)""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val orEst = setsOf(orCube)
    assert(orEst.keySet == orExact.keySet, s"${orEst.keySet} vs ${orExact.keySet}")
    orExact.foreach { case (k, v) =>
      assert(qerr(math.max(orEst(k), 1.0), math.max(v, 1.0)) <= 1.5,
        s"cube OR combo-distinct set $k: ${orEst(k)} vs $v")
    }
  }

  test("n-branch disjunctions answer by full inclusion-exclusion on the text plane") {
    // r18: a single parenthesized disjunction may hold MORE than two
    // branches — mixed columns, each branch itself a conjunction (the
    // TPC-H Q19 shape) — expanded per group by full inclusion–exclusion
    // (2^k−1 signed terms) under the total-term-product ≤ 27 cap that
    // generalizes the r17 three-2-branch-group 3^N bound.
    views
    def est(sql: String): Double = SqlEstimate.estimate(ens, sql) match {
      case SqlEstimate.Scalar(e) => e.value
      case other                 => fail(s"expected scalar, got $other")
    }
    // 3-branch mixed-column disjunction (7 signed terms)
    val tri = """SELECT COUNT(*) FROM lineitem
                 WHERE (l_quantity < 5 OR l_discount > 0.08 OR l_returnflag = 'R')"""
    val triExact = spark.sql(tri).head().getLong(0).toDouble
    assert(qerr(est(tri), triExact) <= 1.3, s"3-branch COUNT: ${est(tri)} vs $triExact")
    // Q19 shape: disjunction of three CONJUNCTIONS, SUM aggregate
    val q19ish = """SELECT SUM(l_extendedprice) FROM lineitem
                    WHERE (l_quantity < 10 AND l_returnflag = 'A'
                       OR l_quantity > 40 AND l_linestatus = 'F'
                       OR l_discount > 0.08 AND l_returnflag = 'N')"""
    val q19Exact = spark.sql(q19ish).head().getDouble(0)
    assert(qerr(est(q19ish), q19Exact) <= 1.5,
      s"3-conjunction-branch SUM: ${est(q19ish)} vs $q19Exact")
    // 4-branch disjunction (15 terms, still under the cap)
    val quad = """SELECT COUNT(*) FROM lineitem
                  WHERE (l_quantity < 3 OR l_discount > 0.09 OR
                         l_returnflag = 'R' OR l_tax < 0.01)"""
    val quadExact = spark.sql(quad).head().getLong(0).toDouble
    assert(qerr(est(quad), quadExact) <= 1.3, s"4-branch COUNT: ${est(quad)} vs $quadExact")
    // 3-branch × 2-branch groups (7×3 = 21 terms ≤ 27): compose, with AVG
    val mix = """SELECT AVG(l_extendedprice) FROM lineitem
                 WHERE (l_quantity < 10 OR l_discount > 0.07 OR l_returnflag = 'R')
                   AND (l_linestatus = 'F' OR l_tax > 0.05)"""
    val mixExact = spark.sql(mix).head().getDouble(0)
    assert(qerr(est(mix), mixExact) <= 1.5, s"3x2 AVG: ${est(mix)} vs $mixExact")
    // GROUP BY under a 3-branch group: per-group parity
    val g = """SELECT l_returnflag, COUNT(*) FROM lineitem
               WHERE (l_quantity < 8 OR l_discount > 0.08 OR l_tax < 0.01)
               GROUP BY l_returnflag"""
    val gEst = SqlEstimate.estimate(ens, g) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val gExact = spark.sql(g).collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    (gExact.keySet intersect gEst.keySet).foreach { k =>
      assert(qerr(gEst(k), gExact(k)) <= 2.0 || math.abs(gEst(k) - gExact(k)) <= 10.0,
        s"3-branch group $k: ${gEst(k)} vs ${gExact(k)}")
    }
    // the exact ParsedQuery plane renders n-branch groups identically
    val exactPlane = SqlExact.compile(spark, sf, tri).head().getDouble(0)
    assert(exactPlane == triExact, s"SqlExact 3-branch parity: $exactPlane vs $triExact")
    // ± combo with a DISTINCT leaf per group under n-branch groups (r18:
    // multiGroupTerm's distinct arm — the set unions over the positive
    // quadrants, the count term rides the signed expansion)
    val cd = """SELECT l_returnflag, COUNT(*) - COUNT(DISTINCT l_linestatus) AS d
                FROM lineitem
                WHERE (l_quantity < 8 OR l_discount > 0.08 OR l_tax < 0.01)
                  AND (l_linestatus = 'F' OR l_tax > 0.05)
                GROUP BY l_returnflag"""
    val cdEst = SqlEstimate.estimate(ens, cd) match {
      case SqlEstimate.Groups(rows) => rows.map { case (k, e) => k.head -> e.value }.toMap
      case other                    => fail(s"expected groups, got $other")
    }
    val cdExact = spark.sql(cd).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    (cdExact.keySet intersect cdEst.keySet).foreach { k =>
      assert(qerr(math.max(cdEst(k), 1.0), math.max(cdExact(k), 1.0)) <= 1.5,
        s"n-branch combo-distinct $k: ${cdEst(k)} vs ${cdExact(k)}")
    }
    // past the cap stays loud: 5 branches (31 terms), two 3-branch groups
    // (49), four 2-branch groups (81)
    def loud(sql: String): Unit = {
      val e = intercept[IllegalArgumentException](SqlEstimate.estimate(ens, sql))
      assert(e.getMessage.contains("signed expansion terms"), e.getMessage)
    }
    loud("""SELECT COUNT(*) FROM lineitem
            WHERE (l_quantity < 3 OR l_discount > 0.09 OR l_returnflag = 'R'
               OR l_tax < 0.01 OR l_extendedprice > 90000)""")
    loud("""SELECT COUNT(*) FROM lineitem
            WHERE (l_quantity < 10 OR l_discount > 0.07 OR l_returnflag = 'R')
              AND (l_linestatus = 'F' OR l_tax > 0.05 OR l_extendedprice > 80000)""")
    loud("""SELECT COUNT(*) FROM lineitem
            WHERE (l_quantity < 10 OR l_tax > 0.07)
              AND (l_returnflag = 'A' OR l_linestatus = 'O')
              AND (l_discount < 0.02 OR l_tax > 0.06)
              AND (l_extendedprice < 2000 OR l_quantity > 45)""")
  }
}
