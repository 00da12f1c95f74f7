package graft.rspn

import graft.Op
import graft.schema.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.time.LocalDate

/** Model-plane operators (SURVEY §2.9, M1–M11) exposed through the driver
  * contract. All are *no-oracle*: results are model estimates, checked
  * instead by the accuracy specs (q-error vs the exact plane — the
  * reference's own evaluation methodology, evaluation/aqp_evaluation.py).
  *
  * Estimates are deterministic: seeded sampling, seeded learning, driver-side
  * inference.
  */
object ModelQueries {

  private def days(d: String): Double = LocalDate.parse(d).toEpochDay.toDouble

  /** Shared encode-and-sample harness of the update ops (`spn_update`,
    * `spn_update_delete`): the (event_type, value) encoding, column kinds,
    * the 'view' count predicate, and bounded deterministic sampling — ONE
    * definition so the insert and delete evaluation protocols cannot
    * diverge in sampling fraction, seed, or encoding.
    */
  private final case class EventHarness(
      kinds: Array[Learn.ColKind],
      viewRanges: Array[ColRange],
      sample: DataFrame => (Array[Array[Double]], Long))

  private def eventHarness(s: SparkSession, d: String): EventHarness = {
    val ev = Tables(s, d, "events")
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).sorted
    val typeCode = map(types.zipWithIndex.flatMap { case (v, i) => Seq(lit(v), lit(i.toDouble)) }: _*)
    val enc = Seq(element_at(typeCode, col("event_type")), col("value").cast("double"))
    val cap = Ensemble.sampleCap
    def sample(df: DataFrame): (Array[Array[Double]], Long) = {
      val total = df.count()
      val frac = math.min(1.0, cap * 1.2 / math.max(total, 1L))
      val rows = df.select(enc: _*).sample(withReplacement = false, frac, 42L).limit(cap).collect()
        .map(r => Array.tabulate(2)(i => if (r.isNullAt(i)) Double.NaN else r.getDouble(i)))
      (rows, total)
    }
    EventHarness(
      Array(Learn.CategoricalCol(types.length), Learn.NumericCol),
      Array(NominalSet(Array(types.indexOf("view").toDouble)), null),
      sample)
  }

  private def resultDf(s: SparkSession, rows: Seq[(String, Double, Double, Double)]): DataFrame = {
    import s.implicits._
    rows.toDF("query", "est", "ci95_lo", "ci95_hi").orderBy("query")
  }

  val ops: Seq[Op] = Seq(
    // M1: pairwise RDC dependence matrix over lineitem's modeled columns
    // (drives Product splits + ensemble ranking; rdc_based.py).
    Op.noOracle("rdc_matrix") { (s, d) =>
      import s.implicits._
      val data = {
        // re-collect the training sample deterministically for the matrix
        val df = Tables(s, d, "lineitem")
        val exprs = Seq(
          col("l_quantity").cast("double"), col("l_extendedprice").cast("double"),
          col("l_discount").cast("double"), col("l_tax").cast("double"),
          datediff(to_date(col("l_shipdate")), to_date(lit("1970-01-01"))).cast("double"))
        val frac = math.min(1.0, 5000.0 / math.max(df.count(), 1L))
        df.select(exprs: _*).sample(withReplacement = false, frac, 42L).limit(5000)
          .collect().map(r => Array.tabulate(5)(i => if (r.isNullAt(i)) Double.NaN else r.getDouble(i)))
      }
      val names = Array("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
      Learn.rdcMatrix(data, names.indices.toArray)
        .map { case (i, j, r) => (names(i), names(j), math.rint(r * 1000) / 1000) }
        .toSeq.toDF("col_a", "col_b", "rdc")
        .orderBy("col_a", "col_b")
    },

    // M3: structure-learning summary — proof the ensemble trains, plus its
    // footprint (reference SPNEnsemble.save telemetry).
    Op.noOracle("spn_train") { (s, d) =>
      import s.implicits._
      Ensemble.get(s, d).values.toSeq
        .map { t =>
          val (nodes, leaves) = Spn.countNodes(t.root)
          (t.name, t.tables.toSeq.sorted.mkString(","), nodes, leaves, t.sampleRows, t.scaleRows)
        }
        .toDF("spn", "tables", "nodes", "leaves", "sample_rows", "scale_rows")
        .orderBy("spn")
    },

    // M9: RDC-budgeted join-SPN candidate ranking (reference
    // ensemble_creation/rdc_based.py::candidate_evaluation) — every PK–FK
    // edge scored by max cross-table RDC; top-budget (plus workload-required
    // edges) get trained.
    Op.noOracle("spn_candidates") { (s, d) =>
      import s.implicits._
      Ensemble.state(s, d).candidates
        .map(c => (c.name, s"${c.rel.many}.${c.rel.fk}=${c.rel.one}.${c.rel.pk}",
          math.rint(c.score * 1000) / 1000, c.trained))
        .toDF("candidate", "edge", "max_cross_rdc", "trained")
        .orderBy("candidate")
    },

    // M10 transparency: WHICH model answers each query — the reference
    // prints the chosen SPN per query in verbose mode (spn_ensemble.py
    // _greedily_select_first_cardinality_spn's pick is user-visible); a
    // user debugging a bad estimate needs the same visibility here. One
    // row per canned query shape: the covering-variant count, the winner
    // under the RDC-aware selection, and whether the set needs the
    // factored (multi-model) path.
    Op.noOracle("spn_explain") { (s, d) =>
      import s.implicits._
      val e = Ensemble.get(s, d)
      val shapes: Seq[(String, Set[String], Set[(String, String)])] = Seq(
        ("single_lineitem", Set("lineitem"),
          Set(("lineitem", "l_quantity"), ("lineitem", "l_shipdate"))),
        ("join_orders_lineitem", Set("orders", "lineitem"),
          Set(("orders", "o_orderstatus"), ("lineitem", "l_quantity"))),
        ("join_customer_orders", Set("customer", "orders"),
          Set(("customer", "c_mktsegment"))),
        ("three_way", Set("customer", "orders", "lineitem"),
          Set(("customer", "c_mktsegment"), ("lineitem", "l_quantity"))))
      shapes.map { case (name, tables, predCols) =>
        val covering = e.values.filter(sp => tables.subsetOf(sp.tables))
        val chosen = Ensemble.selectFor(e, tables, predCols)
        (name, tables.toSeq.sorted.mkString(","), covering.size.toLong,
          chosen.map(_.name).getOrElse("(factored)"), chosen.isEmpty)
      }.toDF("query", "tables", "covering_variants", "chosen_model", "factored")
        .orderBy("query")
    },

    // A1/M6/M10: COUNT estimates — single table, with predicates, and over
    // the join with fanout/nn corrections.
    Op.noOracle("est_count") { (s, d) =>
      val e = Ensemble.get(s, d)
      def q(name: String, tables: Set[String], preds: Map[(String, String), ColRange]) = {
        val est = Ensemble.estCount(e, tables, preds)
        (name, math.rint(est.value), math.rint(est.ci95Lo), math.rint(est.ci95Hi))
      }
      resultDf(s, Seq(
        q("li_all", Set("lineitem"), Map.empty),
        q("li_flag_A", Set("lineitem"), Map(("lineitem", "l_returnflag") -> flag(e, "A"))),
        q("li_qty_lt10_disc", Set("lineitem"), Map(
          ("lineitem", "l_quantity") -> NumRange(Double.NegativeInfinity, 10.0, hiIncl = false),
          ("lineitem", "l_discount") -> NumRange(0.02, 0.06))),
        q("li_ship_1996", Set("lineitem"), Map(
          ("lineitem", "l_shipdate") -> NumRange(days("1996-01-01"), days("1997-01-01"), hiIncl = false))),
        q("join_status_F", Set("orders", "lineitem"), Map(
          ("orders", "o_orderstatus") -> status(e, "F"))),
        q("orders_via_join_spn", Set("orders"), Map(
          ("orders", "o_totalprice") -> NumRange(100000.0, Double.PositiveInfinity))),
        // M10: no single SPN covers these — factor decomposition across the
        // ensemble (customer_orders × orders_lineitem, + part_lineitem).
        q("cust_orders_lineitem", Set("customer", "orders", "lineitem"), Map(
          ("customer", "c_mktsegment") -> seg(e, "BUILDING"),
          ("lineitem", "l_quantity") -> NumRange(Double.NegativeInfinity, 25.0, hiIncl = false))),
        q("cust_orders_lineitem_part", Set("customer", "orders", "lineitem", "part"), Map(
          ("customer", "c_mktsegment") -> seg(e, "BUILDING"),
          ("part", "p_size") -> NumRange(Double.NegativeInfinity, 25.0)))) :+ {
        // OR by inclusion-exclusion (extension beyond the reference's class)
        val est = Ensemble.estCountOr(e, Set("lineitem"),
          Map(("lineitem", "l_returnflag") -> flag(e, "A")),
          Map(("lineitem", "l_quantity") -> NumRange(45.0, Double.PositiveInfinity, loIncl = false)))
        ("or_flagA_qty_gt45", math.rint(est.value), math.rint(est.ci95Lo), math.rint(est.ci95Hi))
      })
    },

    // A2: SUM estimates (expectation of the feature column under predicates).
    Op.noOracle("est_sum") { (s, d) =>
      val e = Ensemble.get(s, d)
      def q(name: String, tables: Set[String], c: (String, String), preds: Map[(String, String), ColRange]) = {
        val est = Ensemble.estSum(e, tables, c, preds)
        (name, math.rint(est.value), math.rint(est.ci95Lo), math.rint(est.ci95Hi))
      }
      resultDf(s, Seq(
        q("sum_qty_all", Set("lineitem"), ("lineitem", "l_quantity"), Map.empty),
        q("sum_price_1996", Set("lineitem"), ("lineitem", "l_extendedprice"), Map(
          ("lineitem", "l_shipdate") -> NumRange(days("1996-01-01"), days("1997-01-01"), hiIncl = false))),
        q("sum_total_join_F", Set("orders", "lineitem"), ("orders", "o_totalprice"), Map(
          ("orders", "o_orderstatus") -> status(e, "F")))))
    },

    // A4: SUM(a*b) — multi-scope feature expectation (SSB-style revenue).
    Op.noOracle("est_sum_product") { (s, d) =>
      val e = Ensemble.get(s, d)
      def q(name: String, preds: Map[(String, String), ColRange]) = {
        val est = Ensemble.estSumProduct(e, Set("lineitem"),
          Seq(("lineitem", "l_extendedprice"), ("lineitem", "l_discount")), preds)
        (name, math.rint(est.value), math.rint(est.ci95Lo), math.rint(est.ci95Hi))
      }
      resultDf(s, Seq(
        q("revenue_all", Map.empty),
        q("revenue_1996", Map(
          ("lineitem", "l_shipdate") -> NumRange(days("1996-01-01"), days("1997-01-01"), hiIncl = false)))))
    },

    // A3: AVG = ratio of expectations, delta-method CI.
    Op.noOracle("est_avg") { (s, d) =>
      val e = Ensemble.get(s, d)
      def q(name: String, tables: Set[String], c: (String, String), preds: Map[(String, String), ColRange]) = {
        val est = Ensemble.estAvg(e, tables, c, preds)
        (name, math.rint(est.value * 100) / 100,
          math.rint(est.ci95Lo * 100) / 100, math.rint(est.ci95Hi * 100) / 100)
      }
      resultDf(s, Seq(
        q("avg_qty", Set("lineitem"), ("lineitem", "l_quantity"), Map.empty),
        q("avg_price_flag_A", Set("lineitem"), ("lineitem", "l_extendedprice"),
          Map(("lineitem", "l_returnflag") -> flag(e, "A")))))
    },

    // A6/M7: model-enumerated GROUP BY (zero-prob groups pruned).
    Op.noOracle("est_groupby") { (s, d) =>
      import s.implicits._
      val e = Ensemble.get(s, d)
      // per-group CI: the reference's group-by AQP path reports bounds per
      // group, not just point estimates — same delta-method interval as the
      // scalar surface, shared memo across the enumeration
      Ensemble.estGroupByMulti(e, Set("lineitem"), Seq(("lineitem", "l_returnflag")), Map.empty)
        .map { case (gs, est) =>
          (gs.head, math.rint(est.value), math.rint(est.ci95Lo), math.rint(est.ci95Hi))
        }
        .toDF("l_returnflag", "est_count", "ci95_lo", "ci95_hi")
        .orderBy("l_returnflag")
    },

    // S4: model store round-trip — save the trained ensemble, reload it in a
    // fresh registry, and prove estimates are bit-identical (reference
    // SPNEnsemble.save / read_ensemble: train offline, query online).
    Op.noOracle("spn_store") { (s, d) =>
      import s.implicits._
      val ens = Ensemble.get(s, d)
      val dir = java.nio.file.Files.createTempDirectory("graft-models").toString
      Store.save(dir, ens)
      val reloaded = Store.load(dir)
      ens.keys.toSeq.sorted.map { name =>
        val spn = ens(name)
        val before = Ensemble.estCount(ens, spn.tables, Map.empty).value
        val after = Ensemble.estCount(reloaded, spn.tables, Map.empty).value
        (name, math.rint(before), math.rint(after), before == after)
      }.toDF("spn", "est_before", "est_after", "roundtrip_ok")
        .orderBy("spn")
    },

    // A6/M7 multi-attribute: TPC-H Q1-shaped group enumeration
    // (returnflag × linestatus, prefix-pruned).
    Op.noOracle("est_groupby2") { (s, d) =>
      import s.implicits._
      val e = Ensemble.get(s, d)
      Ensemble.estGroupByMulti(e, Set("lineitem"),
        Seq(("lineitem", "l_returnflag"), ("lineitem", "l_linestatus")), Map.empty)
        .map { case (gs, est) =>
          (gs.head, gs(1), math.rint(est.value), math.rint(est.ci95Lo), math.rint(est.ci95Hi))
        }
        .toDF("l_returnflag", "l_linestatus", "est_count", "ci95_lo", "ci95_hi")
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Grouping sets on the model plane (estimator analog of groupby_rollup/
    // groupby_cube): every subset enumeration shares one expectation memo,
    // so the coarser sets reuse the finer sets' prefix folds.
    Op.noOracle("est_rollup") { (s, d) =>
      import s.implicits._
      val e = Ensemble.get(s, d)
      Ensemble.estRollup(e, Set("lineitem"),
        Seq(("lineitem", "l_returnflag"), ("lineitem", "l_linestatus")), Map.empty)
        .map { case (ks, est) =>
          (ks.map(_.getOrElse("(all)")).mkString("|"),
            math.rint(est.value), math.rint(est.ci95Lo), math.rint(est.ci95Hi))
        }
        .toDF("grp", "est_count", "ci95_lo", "ci95_hi")
        .orderBy("grp")
    },

    // M6 at scale: executor-side batch scoring — the immutable tree is
    // broadcast and every row's likelihood is evaluated where the data
    // lives (narrow, no shuffle until the final small groupBy).
    Op.noOracle("spn_score") { (s, d) =>
      val e = Ensemble.get(s, d)
      val spn = e("lineitem")
      val bc = s.sparkContext.broadcast(spn.root)
      val (_, exprs) = Ensemble.encoded(s, d, "lineitem")
      val toRow = udf { xs: Seq[java.lang.Double] =>
        val row = Array.tabulate(xs.length)(i => if (xs(i) == null) Double.NaN else xs(i).doubleValue())
        math.log(math.max(Spn.likelihood(bc.value, row), 1e-300))
      }
      Tables(s, d, "lineitem")
        .withColumn("loglik", toRow(array(exprs: _*)))
        .groupBy("l_returnflag")
        .agg(round(avg("loglik"), 2).as("avg_loglik"), count(lit(1)).as("rows"))
        .orderBy("l_returnflag")
    },

    // A8: confidence intervals for a COUNT (CLT over the training sample).
    Op.noOracle("est_ci") { (s, d) =>
      val e = Ensemble.get(s, d)
      val est = Ensemble.estCount(e, Set("lineitem"),
        Map(("lineitem", "l_quantity") -> NumRange(Double.NegativeInfinity, 25.0, hiIncl = false)))
      resultDf(s, Seq(("count_qty_lt25", math.rint(est.value), math.rint(est.ci95Lo), math.rint(est.ci95Hi))))
    },

    // SQL-text entry (evaluation/utils.py::parse_query analog): the
    // reference's benchmark-SQL surface — text in, model estimate out,
    // zero data scans per query.
    Op.noOracle("sql_estimate") { (s, d) =>
      import s.implicits._
      val ens = Ensemble.get(s, d)
      val sqls = Seq(
        "q01_count_li" -> "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 25",
        "q02_count_join" ->
          "SELECT COUNT(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'",
        "q03_count_3way" ->
          ("SELECT COUNT(*) FROM customer JOIN orders ON o_custkey = c_custkey " +
            "JOIN lineitem ON l_orderkey = o_orderkey WHERE c_mktsegment = 'BUILDING'"),
        "q04_sum_revenue" ->
          "SELECT SUM(l_extendedprice) FROM lineitem WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'",
        "q05_avg_price" -> "SELECT AVG(l_extendedprice) FROM lineitem WHERE l_returnflag IN ('A', 'R')",
        "q06_groupby" -> "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag",
        // round-4 surface: parenthesized OR (inclusion–exclusion),
        // SUM(a*b) (SSB revenue form), multi-column GROUP BY
        "q07_count_or" ->
          "SELECT COUNT(*) FROM lineitem WHERE (l_quantity < 5) OR (l_quantity > 45)",
        "q08_sum_product" ->
          ("SELECT SUM(l_extendedprice * l_discount) FROM lineitem " +
            "WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'"),
        "q09_groupby2" -> "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag, l_linestatus",
        "q10_like" -> "SELECT COUNT(*) FROM part WHERE p_type LIKE '%BRASS'",
        "q11_groupby_sum" -> "SELECT SUM(l_extendedprice) FROM lineitem GROUP BY l_returnflag",
        "q12_not_in" ->
          "SELECT COUNT(*) FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')",
        // round-5 surface: ROLLUP/CUBE grouping-set sugar (model plane
        // enumerates every subset from ONE shared expectation memo)
        "q13_rollup" ->
          "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 30 GROUP BY ROLLUP(l_returnflag, l_linestatus)",
        "q14_cube" ->
          "SELECT COUNT(*) FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)",
        // round-6 surface: JOB-light comma-join form with aliases (the
        // reference's benchmark SQL shape, benchmarks/job-light/sql) —
        // desugared into the canonical JOIN tree by SqlParser
        "q15_joblight" ->
          ("SELECT COUNT(*) FROM customer c, orders o, lineitem l " +
            "WHERE o.o_custkey = c.c_custkey AND l.l_orderkey = o.o_orderkey " +
            "AND c.c_mktsegment = 'BUILDING' AND l.l_quantity < 30"),
        // reference AggregationOperationType.MINUS: difference of aggregates
        "q16_plus_minus" ->
          "SELECT SUM(l_extendedprice) - SUM(l_quantity) FROM lineitem WHERE l_quantity < 30",
        // round-7: COUNT(DISTINCT) = size of the nonzero-support enumeration
        "q17_count_distinct" ->
          "SELECT COUNT(DISTINCT o_orderpriority) FROM orders WHERE o_orderstatus = 'F'",
        // round-7: estimate-plane top-k — ORDER BY/LIMIT applied to the
        // estimated group rows
        "q18_topk" ->
          ("SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag " +
            "ORDER BY COUNT(*) DESC, l_returnflag LIMIT 2"),
        // round-17: TWO independent OR groups — the signed 3^N expansion
        // (scalar, grouped, and through a numeric-bearing ROLLUP)
        "q19_two_or" ->
          ("SELECT COUNT(*) FROM lineitem WHERE (l_quantity < 10 OR l_quantity > 40) " +
            "AND (l_discount < 0.03 OR l_tax > 0.05)"),
        "q20_two_or_rollup" ->
          ("SELECT COUNT(*) FROM lineitem WHERE (l_discount < 0.02 OR l_tax > 0.06) " +
            "AND (l_quantity < 8 OR l_quantity > 48) GROUP BY ROLLUP(l_returnflag)"),
        // round-17: AVG rides ± combinations (two linear ratios)
        "q21_avg_minus" ->
          "SELECT AVG(l_extendedprice) - AVG(l_quantity) FROM lineitem WHERE l_quantity < 30")
      sqls.flatMap { case (id, sql) =>
        SqlEstimate.estimate(ens, sql) match {
          case SqlEstimate.Scalar(e) =>
            Seq((id, "", math.rint(e.value), math.rint(e.ci95Lo), math.rint(e.ci95Hi)))
          case SqlEstimate.Groups(rows) =>
            rows.map { case (g, e) =>
              (id, g.mkString("|"), math.rint(e.value), math.rint(e.ci95Lo), math.rint(e.ci95Hi))
            }
          case SqlEstimate.GroupSets(rows) =>
            rows.map { case (g, e) =>
              (id, g.map(_.getOrElse("ALL")).mkString("|"),
                math.rint(e.value), math.rint(e.ci95Lo), math.rint(e.ci95Hi))
            }
        }
      }.toDF("query", "grp", "est", "ci95_lo", "ci95_hi")
        .orderBy("query", "grp")
    },

    // SQL-text → exact plane: the same restricted class compiled to a
    // DataFrame plan (Catalyst pushes the filters, broadcasts the dims) and
    // hash-checked against DuckDB running the equivalent SQL.
    Op(
      "sql_exact",
      """WITH s AS (
        |  SELECT 'q1' AS query, '' AS grp, CAST(COUNT(*) AS DOUBLE) AS val
        |    FROM lineitem WHERE l_quantity < 25
        |  UNION ALL
        |  SELECT 'q2', '', CAST(COUNT(*) AS DOUBLE)
        |    FROM orders JOIN lineitem ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT 'q3', '', CAST(COUNT(*) AS DOUBLE)
        |    FROM customer JOIN orders ON o_custkey = c_custkey
        |    JOIN lineitem ON l_orderkey = o_orderkey WHERE c_mktsegment = 'BUILDING'
        |  UNION ALL
        |  SELECT 'q4', '', CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,12))), 2) AS DOUBLE)
        |    FROM lineitem
        |    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
        |  UNION ALL
        |  SELECT 'q5', l_returnflag, CAST(COUNT(*) AS DOUBLE)
        |    FROM lineitem GROUP BY l_returnflag
        |  UNION ALL
        |  SELECT 'q6', l_returnflag || '|' || l_linestatus, CAST(COUNT(*) AS DOUBLE)
        |    FROM lineitem GROUP BY l_returnflag, l_linestatus
        |  UNION ALL
        |  SELECT 'q7', '', CAST(COUNT(*) AS DOUBLE)
        |    FROM lineitem WHERE l_quantity < 5 OR l_quantity > 45
        |  UNION ALL
        |  SELECT 'q8', '', CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
        |    FROM lineitem
        |    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
        |  UNION ALL
        |  SELECT 'q9', '', CAST(COUNT(*) AS DOUBLE)
        |    FROM part WHERE p_type LIKE '%BRASS'
        |  UNION ALL
        |  SELECT 'q10', '', CAST(COUNT(*) AS DOUBLE)
        |    FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |  UNION ALL
        |  SELECT 'q11', '', CAST(COUNT(*) AS DOUBLE)
        |    FROM customer c, orders o, lineitem l
        |    WHERE o.o_custkey = c.c_custkey AND l.l_orderkey = o.o_orderkey
        |      AND c.c_mktsegment = 'BUILDING' AND l.l_quantity < 30
        |  UNION ALL
        |  SELECT 'q12', '', CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,12)))
        |                               - SUM(CAST(l_quantity AS DECIMAL(38,12))), 2) AS DOUBLE)
        |    FROM lineitem WHERE l_quantity < 30
        |  UNION ALL
        |  SELECT 'q13', grp, val FROM (
        |    SELECT o_orderpriority AS grp, CAST(COUNT(*) AS DOUBLE) AS val
        |    FROM orders GROUP BY o_orderpriority
        |    ORDER BY COUNT(*) DESC, o_orderpriority LIMIT 3) t13
        |  UNION ALL
        |  SELECT 'q14', l_returnflag, CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,12))), 2) AS DOUBLE)
        |    FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 20000
        |  UNION ALL
        |  SELECT 'q15', grp, val FROM (
        |    SELECT l_linestatus || '|' || l_returnflag AS grp, CAST(COUNT(*) AS DOUBLE) AS val
        |    FROM lineitem GROUP BY l_linestatus, l_returnflag
        |    HAVING COUNT(*) > 9950
        |    ORDER BY COUNT(*) DESC, l_linestatus, l_returnflag LIMIT 4) t15
        |  UNION ALL
        |  SELECT 'q16', '', CAST(COUNT(DISTINCT o_orderpriority) AS DOUBLE)
        |    FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT 'q17', l_returnflag, CAST(COUNT(DISTINCT l_linestatus) AS DOUBLE)
        |    FROM lineitem GROUP BY l_returnflag
        |) SELECT query, grp, val FROM s ORDER BY query, grp""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.functions.{col, concat_ws, lit}
      val qs = Seq(
        "q1" -> "SELECT COUNT(*) FROM lineitem WHERE l_quantity < 25",
        "q2" -> "SELECT COUNT(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey WHERE o_orderstatus = 'F'",
        "q3" -> ("SELECT COUNT(*) FROM customer JOIN orders ON o_custkey = c_custkey " +
          "JOIN lineitem ON l_orderkey = o_orderkey WHERE c_mktsegment = 'BUILDING'"),
        "q4" -> ("SELECT SUM(l_extendedprice) FROM lineitem " +
          "WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'"),
        "q5" -> "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag",
        "q6" -> "SELECT COUNT(*) FROM lineitem GROUP BY l_returnflag, l_linestatus",
        "q7" -> "SELECT COUNT(*) FROM lineitem WHERE (l_quantity < 5) OR (l_quantity > 45)",
        "q8" -> ("SELECT SUM(l_extendedprice * l_discount) FROM lineitem " +
          "WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'"),
        "q9" -> "SELECT COUNT(*) FROM part WHERE p_type LIKE '%BRASS'",
        "q10" -> "SELECT COUNT(*) FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')",
        // JOB-light comma-join form (the reference's benchmark SQL shape:
        // benchmarks/job-light/sql, parsed by evaluation/utils.py) —
        // desugared by SqlParser into the canonical JOIN tree
        "q11" -> ("SELECT COUNT(*) FROM customer c, orders o, lineitem l " +
          "WHERE o.o_custkey = c.c_custkey AND l.l_orderkey = o.o_orderkey " +
          "AND c.c_mktsegment = 'BUILDING' AND l.l_quantity < 30"),
        // reference AggregationOperationType.MINUS: difference of aggregates
        "q12" -> "SELECT SUM(l_extendedprice) - SUM(l_quantity) FROM lineitem WHERE l_quantity < 30",
        // round-7 surface: ORDER BY / LIMIT / HAVING — the shapes every real
        // user's first query has. ORDER BY carries group-column tiebreaks so
        // the LIMIT cut is a total order (two priorities tie at 3003 rows)
        "q13" -> ("SELECT COUNT(*) FROM orders GROUP BY o_orderpriority " +
          "ORDER BY COUNT(*) DESC, o_orderpriority LIMIT 3"),
        "q14" -> "SELECT SUM(l_quantity) FROM lineitem GROUP BY l_returnflag HAVING COUNT(*) > 20000",
        "q15" -> ("SELECT COUNT(*) FROM lineitem GROUP BY l_linestatus, l_returnflag " +
          "HAVING COUNT(*) > 9950 ORDER BY COUNT(*) DESC, l_linestatus, l_returnflag LIMIT 4"),
        // COUNT(DISTINCT): scalar under a filter, and per-group
        "q16" -> "SELECT COUNT(DISTINCT o_orderpriority) FROM orders WHERE o_orderstatus = 'F'",
        "q17" -> "SELECT COUNT(DISTINCT l_linestatus) FROM lineitem GROUP BY l_returnflag")
      qs.map { case (id, sql) =>
        val df = SqlExact.compile(s, d, sql)
        val gcols = df.columns.filter(_.startsWith("grp"))
        val grp = if (gcols.isEmpty) lit("") else concat_ws("|", gcols.map(col): _*)
        df.select(lit(id).as("query"), grp.as("grp"), col("val"))
      }.reduce(_.unionAll(_)).orderBy("query", "grp")
    },

    // M11: incremental update — train on the first half of the events
    // stream, batch-insert the second half (single routed pass, copy-on-
    // write), and show the estimate tracking the grown table. Both halves
    // are sampled under sampleCap so driver memory is bounded at any SF;
    // the estimate scales by the TRUE row counts, not the sample sizes.
    Op.noOracle("spn_update") { (s, d) =>
      import s.implicits._
      val ev = Tables(s, d, "events")
      val cut = lit("2024-01-16").cast("timestamp")
      val h = eventHarness(s, d)
      val (before, nBefore) = h.sample(ev.filter(col("ts") < cut))
      val (after, nAfter) = h.sample(ev.filter(col("ts") >= cut))
      val root0 = Learn.learn(before, h.kinds)
      val est0 = nBefore * Spn.prob(root0, h.viewRanges)
      val root1 = Update.insertBatch(root0, after)
      val est1 = (nBefore + nAfter) * Spn.prob(root1, h.viewRanges)
      Seq(
        ("before_update", math.rint(est0), nBefore),
        ("after_update", math.rint(est1), nBefore + nAfter))
        .toDF("phase", "est_views", "modeled_rows")
        .orderBy("phase")
    },

    // M11c: incremental update fed by a STREAM — the SpnStreamUpdater
    // (foreachBatch contract: in-order batchIds, idempotent re-delivery,
    // copy-on-write snapshots) replayed here over three timestamp-sliced
    // micro-batches of the events table. The final streamed model must be
    // BIT-IDENTICAL to sequentially batch-inserting the same slices — the
    // updater adds delivery discipline, never new math. StreamingSpec
    // drives the same updater from a real MemoryStream query.
    Op.noOracle("spn_update_stream") { (s, d) =>
      import s.implicits._
      val ev = Tables(s, d, "events")
      val h = eventHarness(s, d)
      val cuts = Seq("2024-01-11", "2024-01-21")
      val slices = Seq(
        ev.filter(col("ts") < lit(cuts.head).cast("timestamp")),
        ev.filter(col("ts") >= lit(cuts.head).cast("timestamp") &&
          col("ts") < lit(cuts(1)).cast("timestamp")),
        ev.filter(col("ts") >= lit(cuts(1)).cast("timestamp")))
      val (seed, nSeed) = h.sample(slices.head)
      val root0 = Learn.learn(seed, h.kinds)
      val enc = Seq(
        element_at(map(ev.select("event_type").distinct().collect().map(_.getString(0)).sorted
          .zipWithIndex.flatMap { case (v, i) => Seq(lit(v), lit(i.toDouble)) }: _*),
          col("event_type")),
        col("value").cast("double"))
      val up = new SpnStreamUpdater(root0,
        r => Array.tabulate(2)(i => if (r.isNullAt(i)) Double.NaN else r.getDouble(i)),
        initRows = nSeed)
      var ref = root0
      val phases = slices.tail.zipWithIndex.map { case (slice, i) =>
        val encoded = slice.select(enc: _*)
        up(encoded, i.toLong)
        up(encoded, i.toLong) // re-delivery of the same batchId: must no-op
        ref = Update.insertBatch(ref,
          encoded.collect().map(r => Array.tabulate(2)(j =>
            if (r.isNullAt(j)) Double.NaN else r.getDouble(j))))
        (s"batch_$i", math.rint(up.nRows * Spn.prob(up.root, h.viewRanges)), up.nRows)
      }
      // case-class equality over Array fields is referential; bit-identity
      // is asserted on the estimates the trees produce (the observable)
      val identical = Spn.prob(up.root, h.viewRanges) == Spn.prob(ref, h.viewRanges) &&
        up.root.n == ref.n
      (("seed", math.rint(nSeed * Spn.prob(root0, h.viewRanges)), nSeed) +: phases)
        .toDF("phase", "est_views", "modeled_rows")
        .withColumn("matches_batch_path", lit(identical))
        .orderBy("phase")
    },

    // M11b: incremental DELETION — the retention/CDC half of model
    // maintenance the insert-only path can't express. Train on the whole
    // events window, batch-delete the post-cut slice (same one-pass
    // max-likelihood routing, counts clamped and renormalized), and show
    // the estimate falling back toward the pre-cut table; a fresh model
    // trained on only the pre-cut slice rides along as the reference
    // point, so the delete path is graded against retraining in the op's
    // own output (reference: aqp_spn.py::learn_incremental, extended to
    // the forget direction).
    Op.noOracle("spn_update_delete") { (s, d) =>
      import s.implicits._
      val ev = Tables(s, d, "events")
      val cut = lit("2024-01-16").cast("timestamp")
      val h = eventHarness(s, d)
      val (keep, nKeep) = h.sample(ev.filter(col("ts") < cut))
      val (drop, nDrop) = h.sample(ev.filter(col("ts") >= cut))
      val rootAll = Learn.learn(keep ++ drop, h.kinds)
      val estAll = (nKeep + nDrop) * Spn.prob(rootAll, h.viewRanges)
      val rootDel = Update.deleteBatch(rootAll, drop)
      val estDel = nKeep * Spn.prob(rootDel, h.viewRanges)
      val rootFresh = Learn.learn(keep, h.kinds)
      val estFresh = nKeep * Spn.prob(rootFresh, h.viewRanges)
      Seq(
        ("all_rows", math.rint(estAll), nKeep + nDrop),
        ("after_delete", math.rint(estDel), nKeep),
        ("retrained_reference", math.rint(estFresh), nKeep))
        .toDF("phase", "est_views", "modeled_rows")
        .orderBy("phase")
    },

    // §7.6: `spn_count(...)` registered as a Spark SQL FUNCTION
    // (plans/SpnFunctions.scala via GraftExtensions) — the reference's
    // maqp.py answers benchmark SQL strings from the model; here arbitrary
    // SQL text composes over the estimator (the call folds to a literal at
    // analysis time; no data is scanned). Runs on an isolated child session
    // so the sfDir opt-in conf never leaks into sibling queries' planning.
    Op.noOracle("spn_count_sql") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.sql("""
        SELECT 'join_bldg' AS query,
               round(spn_count('orders,customer', "c_mktsegment = 'BUILDING'")) AS est
        UNION ALL
        SELECT 'li_qty_10_20', round(spn_count('lineitem', 'l_quantity BETWEEN 10 AND 20'))
        UNION ALL
        SELECT 'ord_lowprice_F',
               round(spn_count('orders', "o_totalprice < 2000 AND o_orderstatus = 'F'"))
        UNION ALL
        SELECT 'ord_selectivity',
               round(spn_count('orders', 'o_totalprice < 2000') / spn_count('orders'), 4)
        ORDER BY query""")
    },

    // table-valued companion: model-answered GROUP BY as a FROM source that
    // plain SQL composes over (filter + aggregate over the estimate rows).
    Op.noOracle("spn_groupby_sql") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.sql("""
        SELECT l_returnflag, round(est) AS est_rows
        FROM spn_groupby('lineitem', 'l_returnflag', 'l_quantity < 10')
        WHERE est > 0
        ORDER BY l_returnflag""")
    },

    // model-store introspection (round 9): `spn_models()` lists the trained
    // ensemble — name, covered tables, calibrated rows, sample size, tree
    // shape — as a SQL table source. The reference's ensemble is an opaque
    // pickle; here a SQL user can ASK what models back their estimates and
    // filter/join over the listing like any other relation.
    Op.noOracle("spn_models_sql") { (s, d) =>
      val s2 = s.newSession()
      s2.conf.set("spark.graft.spn.sfDir", d)
      s2.sql("""
        SELECT name, tables, n_columns, scale_rows, n_nodes, depth
        FROM spn_models() ORDER BY name""")
    }
  )

  private def flag(e: Map[String, Ensemble.TrainedSpn], v: String): ColRange = {
    val mc = e("lineitem").cols(e("lineitem").colIdx("lineitem", "l_returnflag"))
    NominalSet(Array(mc.code(v)))
  }
  private def status(e: Map[String, Ensemble.TrainedSpn], v: String): ColRange = {
    val spn = e("orders_lineitem")
    val mc = spn.cols(spn.colIdx("orders", "o_orderstatus"))
    NominalSet(Array(mc.code(v)))
  }
  private def seg(e: Map[String, Ensemble.TrainedSpn], v: String): ColRange = {
    val mc = e("customer").cols(e("customer").colIdx("customer", "c_mktsegment"))
    NominalSet(Array(mc.code(v)))
  }
}
