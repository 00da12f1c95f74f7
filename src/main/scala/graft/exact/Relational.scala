package graft.exact

import graft.Op
import graft.schema.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact relational plane (SURVEY §2.1–§2.8).
  *
  * These are the operators the reference exercises through its data-prep /
  * ground-truth path (DataManagementLab/deepdb-public:
  * data_preparation/prepare_single_tables.py, join_data_preparation.py,
  * ensemble_compilation/physical_db.py) re-expressed as declarative Spark
  * DataFrame plans so Catalyst handles pushdown/pruning/join selection.
  *
  * Determinism for the DuckDB hash gate: every multi-row result ends in a
  * total ORDER BY; float aggregates go through exact DECIMAL arithmetic and
  * are only then cast to DOUBLE (summation-order independent on both
  * engines); computed ints are BIGINT on both sides.
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** Exact, order-independent SUM of a double column: decimal-cast per value,
    * exact decimal sum, single cast back to double. Shared across the exact
    * plane (Extended, Composite) — ONE definition of the decimal-exact-sum
    * contract, so a precision change cannot silently diverge the oracles.
    */
  private[exact] def dsum(c: Column): Column =
    round(sum(c.cast("decimal(18,6)")), 2).cast("double")
  private def dec(c: Column): Column = c.cast("decimal(18,6)")

  val ops: Seq[Op] = Seq(
    // ---- S1: scans / sources -------------------------------------------
    Op(
      "scan_parquet",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
    )((s, d) => t(s, d, "region").select("r_regionkey", "r_name").orderBy("r_regionkey")),

    // S2: prepared table — deterministic dictionary encoding of categoricals
    // (reference: prepare_single_tables.py categorical value dicts). Spark
    // side builds the tiny dictionary with a rank over *distinct* values and
    // broadcast-joins it back (never a global window over the fact table).
    Op(
      "prep_table",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(DENSE_RANK() OVER (ORDER BY l_returnflag) - 1 AS BIGINT) AS rf_code,
        |       CAST(DENSE_RANK() OVER (ORDER BY l_linestatus) - 1 AS BIGINT) AS ls_code
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, rf_code, ls_code""".stripMargin
    ) { (s, d) =>
      val li = t(s, d, "lineitem")
      def dict(col0: String, code: String): DataFrame =
        li.select(col0).distinct()
          .withColumn(code, (dense_rank().over(Window.orderBy(col0)) - 1).cast("bigint"))
      li.join(broadcast(dict("l_returnflag", "rf_code")), "l_returnflag")
        .join(broadcast(dict("l_linestatus", "ls_code")), "l_linestatus")
        .select("l_orderkey", "l_linenumber", "rf_code", "ls_code")
        .orderBy("l_orderkey", "l_linenumber", "rf_code", "ls_code")
    },

    // S3: deterministic systematic sample (seeded random sampling is not
    // oracle-able; modulo-of-key is, and is what the sampled-HDF sink is for).
    Op(
      "sample_table",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey % 10 = 3 ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") % 10 === 3)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // ---- P: projections / predicates -----------------------------------
    Op(
      "project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),

    Op(
      "filter_conj",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.02, 0.06) && col("l_quantity") < 25)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    Op(
      "filter_in",
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') AND l_linestatus = 'F'
        |ORDER BY l_orderkey, l_linenumber, l_returnflag""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag").isin("A", "R") && col("l_linestatus") === "F")
        .select("l_orderkey", "l_linenumber", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag")),

    Op(
      "filter_date_range",
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS yr, COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY 1 ORDER BY yr""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .groupBy(year(col("l_shipdate")).cast("bigint").as("yr"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("yr")),

    // P5: null-indicator predicate — the testdata has no NULLs, so nulls are
    // manufactured the same way the reference does: an outer join leaves
    // childless orders without a partner (join_data_preparation.py nn cols).
    Op(
      "filter_notnull",
      """SELECT o.o_orderkey FROM orders o
        |LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
        |  ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_orderkey IS NULL ORDER BY o.o_orderkey""".stripMargin
    ) { (s, d) =>
      val o = t(s, d, "orders")
      val lk = t(s, d, "lineitem").select("l_orderkey").distinct()
      o.join(lk, o("o_orderkey") === lk("l_orderkey"), "left")
        .filter(col("l_orderkey").isNull)
        .select("o_orderkey")
        .orderBy("o_orderkey")
    },

    // ---- J: joins -------------------------------------------------------
    Op(
      "join_fk_inner",
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("o_orderpriority")),

    // S ext: multi-format sources (see Formats) — CSV mirrors the
    // reference's prepare_single_tables.py ingestion; JSON-lines and ORC
    // come free from the same DataSource surface. Each reads a round-
    // tripped copy with the parquet schema applied explicitly and must
    // hash-match the original rows.
    Op(
      "scan_csv",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
    )((s, d) =>
      Formats.roundTrip(s, d, "region", "csv")
        .select("r_regionkey", "r_name").orderBy("r_regionkey")),

    Op(
      "scan_json",
      "SELECT n_nationkey, n_regionkey, n_name FROM nation ORDER BY n_nationkey"
    )((s, d) =>
      Formats.roundTrip(s, d, "nation", "json")
        .select("n_nationkey", "n_regionkey", "n_name").orderBy("n_nationkey")),

    Op(
      "scan_orc",
      "SELECT s_suppkey, s_name, CAST(ROUND(CAST(s_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS bal FROM supplier ORDER BY s_suppkey"
    )((s, d) =>
      Formats.roundTrip(s, d, "supplier", "orc")
        .select(col("s_suppkey"), col("s_name"),
          round(col("s_acctbal").cast("decimal(18,6)"), 2).cast("double").as("bal"))
        .orderBy("s_suppkey")),

    // S ext: temporal predicate over the date-partitioned layout (see
    // Partitioned) — the filter prunes whole year-directories at planning
    // time (PartitionFilters, PlanSpec-asserted); the oracle runs the same
    // query on the unpartitioned table, so layout changing answers would
    // hash-mismatch.
    Op(
      "scan_partition_pruned",
      """SELECT CAST(MONTH(l_shipdate) AS INT) AS m, COUNT(*) AS cnt
        |FROM lineitem WHERE YEAR(l_shipdate) = 1996
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      Partitioned.lineitemByYear(s, d)
        .filter(col("l_year") === 1996)
        .groupBy(month(col("l_shipdate")).cast("int").as("m"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("m")
    },

    // J ext: the same PK–FK join over bucketed tables (see Bucketed) — the
    // plan has no join-side Exchange/Sort (spec-asserted); results must be
    // identical to the raw-table join, which is what the oracle checks.
    Op(
      "join_bucketed",
      """SELECT o_orderstatus, COUNT(*) AS cnt
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    ) { (s, d) =>
      val (o, l) = Bucketed.orderKeyTables(s, d)
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    },

    Op(
      "join_3way",
      """SELECT n_name, COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) - SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("cnt"),
          round(
            sum(dec(col("l_extendedprice"))) -
              sum(dec(col("l_extendedprice")) * dec(col("l_discount"))), 2)
            .cast("double").as("revenue"))
        .orderBy("n_name")),

    // J2: outer join + per-key fanout (the multiplier column the reference's
    // join sampler materializes; see graft.fanout.JoinSample for the
    // training-side version that keeps per-row multiplier/nn columns).
    Op(
      "join_full_outer_fanout",
      """SELECT COALESCE(o_orderkey, l_orderkey) AS okey, COUNT(l_orderkey) AS fanout
        |FROM orders FULL OUTER JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY okey""".stripMargin
    ) { (s, d) =>
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "full_outer")
        .groupBy(coalesce(col("o_orderkey"), col("l_orderkey")).as("okey"))
        .agg(count(col("l_orderkey")).as("fanout"))
        .orderBy("okey")
    },

    Op(
      "join_semi",
      """SELECT c_custkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin
    )((s, d) =>
      t(s, d, "customer")
        .join(
          t(s, d, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"),
          "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")),

    Op(
      "join_anti",
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin
    )((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
        .orderBy("c_custkey")),

    // ---- A: aggregations -------------------------------------------------
    Op(
      "agg_count",
      """SELECT COUNT(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F' AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("cnt"))),

    Op(
      "agg_sum",
      """SELECT l_returnflag,
        |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")),

    Op(
      "agg_avg",
      """SELECT l_linestatus,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .agg((dsum(col("l_extendedprice")) / count(col("l_extendedprice"))).as("avg_price"))
        .orderBy("l_linestatus")),

    // A4 — the SURVEY §7.3 minimum slice (SSB-Q1-style revenue).
    Op(
      "agg_sum_product",
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 25""".stripMargin
    )((s, d) => Flagship.revenue(t(s, d, "lineitem"))),

    Op(
      "agg_plus_minus",
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS gross,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) - SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS net
        |FROM lineitem WHERE l_returnflag = 'A'""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "A")
        .agg(
          round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("gross"),
          round(
            sum(dec(col("l_extendedprice"))) -
              sum(dec(col("l_extendedprice")) * dec(col("l_discount"))), 2)
            .cast("double").as("net"))),

    // A6 — TPC-H Q1 shape.
    Op(
      "groupby_agg",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) - SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
        |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          round(
            sum(dec(col("l_extendedprice"))) -
              sum(dec(col("l_extendedprice")) * dec(col("l_discount"))), 2)
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    Op(
      "distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // A9 extension surface (ABSENT in reference, free in Spark): cube /
    // rollup / distinct aggregates. Grouping-null markers are coalesced to a
    // sentinel so NULL ordering differences between engines can't flip rows.
    Op(
      "groupby_cube",
      """SELECT COALESCE(l_returnflag, '(all)') AS rf, COALESCE(l_linestatus, '(all)') AS ls,
        |       COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy("rf", "ls")),

    Op(
      "groupby_rollup",
      """SELECT COALESCE(l_returnflag, '(all)') AS rf, COALESCE(l_linestatus, '(all)') AS ls,
        |       COUNT(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("cnt"))
        .orderBy("rf", "ls")),

    Op(
      "agg_count_distinct",
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts, COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))),

    // Exact interpolated percentile: Spark `percentile` and DuckDB
    // `quantile_cont` share the definition, so this is oracle-checkable —
    // the per-group form is the classic "p50/p95 latency" shape.
    Op(
      "agg_percentile",
      """SELECT l_returnflag,
        |       CAST(ROUND(CAST(quantile_cont(l_extendedprice, 0.5) AS DECIMAL(18,6)), 2) AS DOUBLE) AS p50,
        |       CAST(ROUND(CAST(quantile_cont(l_extendedprice, 0.95) AS DECIMAL(18,6)), 2) AS DOUBLE) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)").cast("decimal(18,6)"), 2)
            .cast("double").as("p50"),
          round(expr("percentile(l_extendedprice, 0.95)").cast("decimal(18,6)"), 2)
            .cast("double").as("p95"))
        .orderBy("l_returnflag")),

    // Sketch plane (the 100 TB shapes: one pass, bounded memory, mergeable
    // partial states — exact distinct/percentile need a shuffle-wide exact
    // state that stops scaling first). Approximate results are checked by
    // spec against exact values, not the hash oracle.
    Op.noOracle("agg_sketches") { (s, d) =>
      t(s, d, "lineitem")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("apx_parts"),
          approx_count_distinct(col("l_suppkey"), 0.01).as("apx_supps"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("apx_p50"))
    },

    // P6/P7 extension surface (ABSENT in reference's conjunctive class,
    // free on the exact plane): LIKE prefix match, OR / NOT / <>.
    Op(
      "filter_like",
      """SELECT doc_id, source FROM documents WHERE source LIKE 'src1%'
        |ORDER BY doc_id""".stripMargin
    )((s, d) =>
      t(s, d, "documents")
        .filter(col("source").like("src1%"))
        .select("doc_id", "source")
        .orderBy("doc_id")),

    Op(
      "filter_or_not",
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE (l_quantity < 5 OR l_quantity > 45) AND l_returnflag <> 'N'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .filter((col("l_quantity") < 5 || col("l_quantity") > 45) && col("l_returnflag") =!= "N")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- Window functions (§2.5) ----------------------------------------
    Op(
      "window_fanout",
      """SELECT l_orderkey, l_linenumber,
        |       COUNT(*) OVER (PARTITION BY l_orderkey) AS fanout
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin
    )((s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          count(lit(1)).over(Window.partitionBy("l_orderkey")).as("fanout"))
        .orderBy("l_orderkey", "l_linenumber")),

    Op(
      "window_rank",
      """SELECT user_id, event_id,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
        |FROM events ORDER BY user_id, rn""".stripMargin
    )((s, d) =>
      t(s, d, "events")
        .select(
          col("user_id"),
          col("event_id"),
          row_number()
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .cast("bigint").as("rn"))
        .orderBy("user_id", "rn")),

    // lead/lag/running-sum per key — the sessionization/telemetry window
    // shapes; one shuffle on the partition key, then sorted within
    // partitions (no global window).
    Op(
      "window_lead_lag",
      """SELECT user_id, event_id,
        |       lag(event_id) OVER w AS prev_id,
        |       lead(event_id) OVER w AS next_id,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_value
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .select(
          col("user_id"), col("event_id"),
          lag("event_id", 1).over(w).as("prev_id"),
          lead("event_id", 1).over(w).as("next_id"),
          round(sum(col("value").cast("decimal(18,6)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .cast("double").as("running_value"))
        .orderBy("user_id", "ts", "event_id")
    },

    // Range (interval) join, expressed scale-first: when the intervals are
    // aligned and non-overlapping, the point-in-interval probe REWRITES to
    // an equi-join on the computed bucket key — a hash lookup instead of a
    // per-row interval scan (a BroadcastNestedLoopJoin at best, a cartesian
    // at worst). The oracle runs the literal BETWEEN join.
    Op(
      "join_range_bucketed",
      """SELECT b.band_name, COUNT(*) AS cnt
        |FROM lineitem l JOIN (
        |  SELECT 10*k AS lo, 10*k + 9.999999 AS hi, 'band_' || CAST(k AS VARCHAR) AS band_name
        |  FROM range(6) t(k)) b
        |  ON l.l_quantity BETWEEN b.lo AND b.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val bands = (0 until 6).map(k => (k.toLong, s"band_$k")).toDF("band_key", "band_name")
      t(s, d, "lineitem")
        .withColumn("band_key", floor(col("l_quantity") / 10))
        .join(broadcast(bands), "band_key") // equi-join: the rewritten probe
        .groupBy("band_name").agg(count(lit(1)).as("cnt"))
        .orderBy("band_name")
    },

    // ---- Sort / limit ----------------------------------------------------
    Op(
      "sort_limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin
    )((s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)),

    // ---- Set operations ---------------------------------------------------
    Op(
      "set_union",
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY k""".stripMargin
    ) { (s, d) =>
      val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val b = t(s, d, "orders").filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("k"))
      a.union(b).distinct().orderBy("k")
    },

    Op(
      "set_intersect",
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY k""".stripMargin
    ) { (s, d) =>
      val o = t(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k")))
        .orderBy("k")
    },

    Op(
      "set_except",
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT o_custkey AS k FROM orders
        |ORDER BY k""".stripMargin
    )((s, d) =>
      t(s, d, "customer").select(col("c_custkey").as("k"))
        .except(t(s, d, "orders").select(col("o_custkey").as("k")))
        .orderBy("k")),

    // ---- F: scalar functions ----------------------------------------------
    Op(
      "json_extract",
      """SELECT event_type,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       COUNT(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    )((s, d) =>
      t(s, d, "events")
        .groupBy("event_type")
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("bigint")).as("sum_k"),
          count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // Semi-structured ingestion via VARIANT (round 9; Spark 4's answer to
    // string-JSON at scale): `parse_json` decodes the text ONCE into the
    // binary-columnar variant encoding, after which every `variant_get`
    // probe is a path walk over the encoded form — repeated field access
    // stops re-parsing text (get_json_object re-parses per call). Same
    // answers as the string path, different engine mechanics; DuckDB's
    // JSON probe is the oracle.
    Op(
      "json_variant",
      """SELECT event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_big,
        |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin
    )((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .filter(col("k") >= 50)
        .groupBy("event_type")
        .agg(
          count(lit(1)).cast("bigint").as("n_big"),
          max(col("k")).cast("bigint").as("max_k"))
        .orderBy("event_type")),

    // SQL PIPE syntax (round 9; Spark 4's `|>` operators): the linear
    // query form — each stage reads top-to-bottom as the dataflow actually
    // runs, exactly like the DataFrame API but in SQL text. Semantics are
    // identical to the nested form, so the plain-SQL oracle checks that
    // the surface is sugar, not a different engine path.
    Op(
      "sql_pipe",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, d) =>
      t(s, d, "orders").createOrReplaceTempView("orders_pipe")
      s.sql(
        """FROM orders_pipe
          ||> WHERE o_orderstatus = 'F'
          ||> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
          |             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
          |   GROUP BY o_orderpriority
          ||> ORDER BY o_orderpriority
          ||> SELECT o_orderpriority, n, sum_price""".stripMargin)
    },

    Op(
      "date_parts",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mon,
        |       COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_total
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mon""".stripMargin
    )((s, d) =>
      t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("bigint").as("yr"),
          month(col("o_orderdate")).cast("bigint").as("mon"))
        .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_total"))
        .orderBy("yr", "mon"))
  )
}

/** The flagship §7.3 slice, reused by SparkEntry.entry. */
object Flagship {
  import org.apache.spark.sql.functions._
  def revenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 25)
      .agg(
        round(
          sum(col("l_extendedprice").cast("decimal(18,6)") *
            col("l_discount").cast("decimal(18,6)")), 2)
          .cast("double").as("revenue"))
}
