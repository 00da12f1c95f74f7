package graft.exact

import graft.Op
import graft.schema.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 composite surface: full TPC-H-shaped pipeline queries (the
  * multi-join + agg workloads a user of the reference's schema actually
  * runs), consistent hash sampling, ntile/cume_dist windows, and z-order
  * clustering. Same determinism contract as [[Relational]] (total ORDER BY,
  * decimal-exact float aggregates, identical aliases on both planes).
  *
  * The TPC-H trio exercises what single-operator rows can't: Catalyst's
  * join ordering + broadcast selection across 3–6 tables, partial
  * aggregation under multi-key group-bys, and top-k pushdown — the shapes
  * whose plans decide whether 100 TB is a few stages or a shuffle storm.
  */
object Composite {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  private def dsum(c: Column): Column = Relational.dsum(c)

  /** Revenue term: the per-row double product is bit-identical in both
    * engines (IEEE), cast to exact decimal BEFORE summing so the aggregate
    * is summation-order independent (decimal(28,6) per agg_stats precedent).
    */
  private def revSum(c: Column): Column =
    round(sum(c.cast("decimal(28,6)")), 2).cast("double")

  /** Interleaved z-value of the low `bits` bits of two bigint columns —
    * built from shift/and/or only, so the SAME formula is emitted as a
    * DuckDB SQL string by [[zSql]] and both engines compute identical
    * values. At 100 TB, writing files sorted by zval gives min/max
    * row-group skipping on BOTH key dimensions at once (the OPTIMIZE
    * ZORDER layout); the query itself must be layout-invariant.
    */
  private def zCol(x: Column, y: Column, bits: Int): Column =
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  private def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"((($x >> $i) & 1) << ${2 * i})",
        s"((($y >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** The MERGE kernel behind `merge_upsert`: apply a CDC change batch
    * (`c_key`, `op` ∈ I/U/D, payload columns) to a keyed orders-shaped
    * target in ONE full-outer join. Exposed so the streaming path can apply
    * the same kernel per micro-batch via foreachBatch (StreamingSpec drives
    * it against a versioned parquet target).
    */
  def applyChanges(target: DataFrame, changes: DataFrame): DataFrame =
    target.join(changes, col("o_orderkey") === col("c_key"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(
        coalesce(col("o_orderkey"), col("c_key")).as("o_orderkey"),
        coalesce(col("c_status"), col("o_orderstatus")).as("o_orderstatus"),
        coalesce(col("c_totalprice"), col("o_totalprice")).as("o_totalprice"))

  /** The deterministic CDC change batch the merge ops apply (updates: keys
    * ≡0 mod 7 reprice ×1.1 decimal-exact; deletes: keys ≡3 mod 11 not
    * already updated; inserts: keys ≡1 mod 13 re-keyed into a disjoint
    * range) — derived from the fixture so the oracle replays the identical
    * merge.
    */
  private def changeBatch(ord: DataFrame): DataFrame = {
    val reprice = (col("o_totalprice").cast("decimal(18,2)") *
      lit(1.1).cast("decimal(3,1)")).cast("double")
    ord.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("c_key"), lit("U").as("op"),
        col("o_orderstatus").as("c_status"), reprice.as("c_totalprice"))
      .unionAll(ord.filter(col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 11 === 3)
        .select(col("o_orderkey").as("c_key"), lit("D").as("op"),
          lit(null).cast("string").as("c_status"), lit(null).cast("double").as("c_totalprice")))
      .unionAll(ord.filter(col("o_orderkey") % 13 === 1)
        .select((col("o_orderkey") + 100000000L).as("c_key"), lit("I").as("op"),
          lit("NEW").as("c_status"), col("o_totalprice").as("c_totalprice")))
  }

  private val mergeSql =
    """WITH ord AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      |changes AS (
      |  SELECT o_orderkey AS c_key, 'U' AS op, o_orderstatus AS c_status,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)) AS DOUBLE) AS c_totalprice
      |  FROM ord WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'D', NULL, NULL
      |  FROM ord WHERE o_orderkey % 7 <> 0 AND o_orderkey % 11 = 3
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, 'I', 'NEW', o_totalprice
      |  FROM ord WHERE o_orderkey % 13 = 1)
      |SELECT COALESCE(o_orderkey, c_key) AS o_orderkey,
      |       COALESCE(c_status, o_orderstatus) AS o_orderstatus,
      |       COALESCE(c_totalprice, o_totalprice) AS o_totalprice
      |FROM ord FULL OUTER JOIN changes ON o_orderkey = c_key
      |WHERE COALESCE(op, '') <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  private val fragmentFiles = 64
  private val compactTarget = 4

  /** The compacted documents layout: a deliberately fragmented copy
    * (64 files) is written once, then compacted to 4. Exposed for the spec,
    * which asserts the physical file counts on both sides.
    */
  private[graft] def compacted(s: SparkSession, d: String): DataFrame =
    graft.ext.ModelCache.memo(s, d, "compacted_documents") {
      val frag = Warehouse.derivedPath(s, s"graft_docs_frag_${Warehouse.suffix(d)}")
      val comp = Warehouse.derivedPath(s, s"graft_docs_compact_${Warehouse.suffix(d)}")
      Warehouse.ensure(s, frag) { tmp =>
        Tables.raw(s, d, "documents").repartition(fragmentFiles).write.mode("overwrite").parquet(tmp)
      }
      Warehouse.ensure(s, comp) { tmp =>
        // real compactors size target = ceil(totalBytes / targetFileSize);
        // the fixture corpus is MBs, so the count is pinned instead
        s.read.parquet(frag).repartition(compactTarget).write.mode("overwrite").parquet(tmp)
      }
      s.read.parquet(comp)
    }

  private[graft] def parquetFileCount(s: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
  }

  private[graft] def fragPath(s: SparkSession, d: String): String =
    Warehouse.derivedPath(s, s"graft_docs_frag_${Warehouse.suffix(d)}")
  private[graft] def compactPath(s: SparkSession, d: String): String =
    Warehouse.derivedPath(s, s"graft_docs_compact_${Warehouse.suffix(d)}")

  val ops: Seq[Op] = Seq(
    // TPC-H Q1 (pricing summary): the canonical wide-aggregate scan. One
    // pass, map-side partials, 6 groups — at 100 TB this is bounded by scan
    // throughput alone, exactly as it should be (no shuffle of fact rows,
    // only of 6-group partials).
    Op(
      "tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        |       CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
        |       CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_disc_price,
        |       CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_charge,
        |       CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
    ) { (s, d) =>
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revSum(disc).as("sum_disc_price"),
          revSum(disc * (lit(1) + col("l_tax"))).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // TPC-H Q3 (shipping priority): selective dim filter → fact join → top-k
    // revenue. The customer side is broadcast (dim-sized); the orders↔
    // lineitem join shuffles only date-filtered rows; the final top-10 is a
    // TakeOrdered over per-group decimal-exact revenue, not a full sort.
    Op(
      "tpch_q3",
      """SELECT l_orderkey,
        |       CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
        |       o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
    ) { (s, d) =>
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 (local supplier volume): the 6-table join. Broadcast hints
    // go ONLY on the genuinely bounded dims (nation: 25 rows, region: 5 —
    // SF-invariant); customer and supplier scale with SF (150k/10k × SF), so
    // their join strategy is left to Catalyst/AQE's size check: broadcast at
    // small SF, sort-merge at cluster scale instead of an executor OOM. The
    // customer-nation = supplier-nation equality is an extra join predicate,
    // not a separate pass.
    Op(
      "tpch_q5",
      """SELECT n_name,
        |       CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |              JOIN nation ON s_nationkey = n_nationkey
        |              JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    ) { (s, d) =>
      val asiaNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = t(s, d, "supplier")
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(supp,
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(revSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q10 (returned-item reporting): fact→fact→dim join aggregated to
    // the CUSTOMER grain with a top-k — the "entity rollup" shape (group on
    // a high-cardinality dim key, then TakeOrdered). Only the SF-invariant
    // nation side carries a broadcast hint; customer scales with SF, so its
    // strategy is Catalyst/AQE's size call (broadcast at small SF, shuffle
    // at scale). The revenue per customer is decimal-exact so the top-20
    // cut is deterministic (ties broken by key).
    Op(
      "tpch_q10",
      """SELECT c_custkey, c_name, n_name,
        |       CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
    ) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").select("c_custkey", "c_name", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(revSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    },

    // TPC-H Q13 (customer distribution): the outer-join-then-histogram
    // shape — LEFT OUTER with the filter in the JOIN CONDITION (a WHERE
    // would drop the zero-order customers the query exists to count), a
    // per-customer COUNT, then a second aggregate over the counts. The
    // per-customer aggregate groups on the JOIN key, so it reuses the
    // join's partitioning with NO extra shuffle (PlanSpec-asserted); the
    // second aggregate shuffles only the histogram. No table in this query
    // is bounded, so nothing carries a broadcast hint. (TPC-H uses
    // `o_comment NOT LIKE '%special%requests%'`; the fixture has no
    // o_comment, so the SAME plan shape filters on o_orderpriority.)
    Op(
      "tpch_q13",
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin
    ) { (s, d) =>
      val ords = t(s, d, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      t(s, d, "customer").select("c_custkey")
        .join(ords, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // TPC-H Q18 (large-volume customers): HAVING over a SUM subquery — the
    // qualifying-keys semi-join shape. The HAVING aggregate shuffles
    // lineitem once on l_orderkey; the semi join and the detail join run on
    // the SAME key, so the only other fact shuffles are the o_custkey dim
    // attach and the final top-k. All sides scale with SF: no hints, the
    // strategy is Catalyst/AQE's size call.
    Op(
      "tpch_q18",
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin
    ) { (s, d) =>
      val li = t(s, d, "lineitem").select("l_orderkey", "l_quantity")
      val bigOrders = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast("decimal(18,6)")).as("qty_sum"))
        .filter(col("qty_sum") > 150)
        .select("l_orderkey")
      t(s, d, "orders")
        .join(bigOrders, col("o_orderkey") === bigOrders("l_orderkey"), "left_semi")
        .join(t(s, d, "customer").select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    },

    // TPC-H Q4 (order priority checking): correlated EXISTS, decorrelated to
    // a LEFT SEMI join whose condition carries a NON-EQUI conjunct next to
    // the key equality (l_shipdate > o_orderdate + 60 days — the fixture's
    // stand-in for Q4's commit/receipt lateness, which the testdata lacks).
    // The semi join never replicates lineitem rows into the output, so the
    // shape stays one shuffle per side at any SF; both sides scale with SF,
    // so nothing carries a broadcast hint (PlanSpec pins this).
    Op(
      "tpch_q4",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    ) { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(t(s, d, "lineitem").select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // TPC-H Q17 (small-quantity-order revenue): the correlated SCALAR
    // subquery (per-part avg quantity threshold), decorrelated to a
    // per-partkey aggregate joined back to the fact — the plan every engine
    // rewrites Q17 into. The threshold compare is multiplied through
    // (5·qty·cnt < sum instead of qty < 0.2·sum/cnt) so it is decimal-exact
    // in both engines: a float division at the boundary would flip rows
    // between Spark and DuckDB. The aggregate and both joins run on
    // l_partkey, so the fact shuffles once and the partitioning is reused;
    // the brand slice of part scales with SF and carries no hint.
    Op(
      "tpch_q17",
      """SELECT CAST(round(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem l
        |JOIN part ON p_partkey = l.l_partkey
        |JOIN (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qsum,
        |             CAST(COUNT(*) AS BIGINT) AS qcnt
        |      FROM lineitem GROUP BY l_partkey) q
        |  ON q.l_partkey = l.l_partkey
        |WHERE p_brand = 'Brand#4'
        |  AND CAST(l.l_quantity AS DECIMAL(18,6)) * 5 * qcnt < qsum""".stripMargin
    ) { (s, d) =>
      val li = t(s, d, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
      val perPart = li.groupBy("l_partkey")
        .agg(
          sum(col("l_quantity").cast("decimal(18,6)")).as("qsum"),
          count(lit(1)).as("qcnt"))
        .withColumnRenamed("l_partkey", "q_partkey")
      li.join(t(s, d, "part").filter(col("p_brand") === "Brand#4").select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("q_partkey"))
        .filter(col("l_quantity").cast("decimal(18,6)") * 5 * col("qcnt") < col("qsum"))
        .agg(
          revSum(col("l_extendedprice")).as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q12 (shipping modes / priority): join + CONDITIONAL aggregation —
    // the CASE-inside-SUM shape (per group, count rows satisfying a
    // predicate without a second scan or a pivot). The fixture has no
    // l_shipmode, so the SAME shape groups by l_linestatus and splits on
    // order priority. One fact join, one aggregate; the CASE evaluates
    // inside the partial aggregate (map-side), so the shuffle carries two
    // counters per group, nothing per-row.
    Op(
      "tpch_q12",
      """SELECT l_linestatus,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin
    ) { (s, d) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linestatus")
        .join(t(s, d, "orders").select("o_orderkey", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
          sum(when(isHigh, 1).otherwise(0)).cast("bigint").as("high_line_count"),
          sum(when(!isHigh, 1).otherwise(0)).cast("bigint").as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // TPC-H Q19 (discounted revenue): the DISJUNCTIVE join predicate — an OR
    // of conjunctions each mixing both sides' columns. The plan test is CNF
    // extraction: the part-only disjunction (brand/size pairs) must reach
    // the part SCAN as a pushed Or filter instead of being evaluated after
    // the join (Spark's CNF predicate push-through; PlanSpec asserts the
    // pushed Or). Brand values/ranges adapted to the fixture's columns.
    Op(
      "tpch_q19",
      """SELECT CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)""".stripMargin
    ) { (s, d) =>
      val disjunct =
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 40))
      t(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(t(s, d, "part").select("p_partkey", "p_brand", "p_size"),
          col("p_partkey") === col("l_partkey"))
        .filter(disjunct)
        .agg(
          revSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q21 (suppliers who kept orders waiting): the EXISTS / NOT
    // EXISTS pair over the SAME fact table — decorrelated to a left-semi
    // and a left-anti self-join. All three lineitem legs and the orders
    // filter join on l_orderkey, so AQE plans ONE fact key partitioning
    // reused across the chain; only the 25-row nation dim is hinted.
    // ("late" in real TPC-H is l_receiptdate > l_commitdate; the fixture
    // has neither, so a fixed shipdate cutoff plays the self-contained
    // lateness predicate — the multi-correlated shape is what's graded.)
    Op(
      "tpch_q21",
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_3'
        |  AND l1.l_shipdate > TIMESTAMP '1999-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > TIMESTAMP '1999-01-01')
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin
    ) { (s, d) =>
      val late = col("l_shipdate") > lit("1999-01-01").cast("timestamp")
      val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
      val others = li.select(
        col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
      val lateOthers = li.filter(late).select(
        col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
      val natSupp = t(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey")
        .join(
          broadcast(t(s, d, "nation")
            .filter(col("n_name") === "NATION_3").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      li.filter(late).select("l_orderkey", "l_suppkey")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F").select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(others,
          col("o2_orderkey") === col("l_orderkey") && col("o2_suppkey") =!= col("l_suppkey"),
          "left_semi")
        .join(lateOthers,
          col("o3_orderkey") === col("l_orderkey") && col("o3_suppkey") =!= col("l_suppkey"),
          "left_anti")
        .join(natSupp, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).cast("bigint").as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    },

    // TPC-H Q22 (global market opportunity): rich-but-inactive customers —
    // a GLOBAL scalar threshold (avg positive balance) applied per row,
    // then an anti join against orders. The threshold compare is
    // multiplied through (bal·cnt > sum, Q17's trick) so it is
    // decimal-exact in both engines; the 1-row aggregate rides as a
    // broadcast subtree, not a second action. (TPC-H keys the cohort on
    // c_phone country codes and "no orders at all"; the fixture has no
    // phone and no order-less customers, so nationkey plays the country
    // code and "no completed order" plays the inactivity predicate.)
    Op(
      "tpch_q22",
      """SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
        |       CAST(round(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
        |FROM (SELECT c_nationkey AS cntrycode, c_acctbal, c_custkey
        |      FROM customer
        |      WHERE c_nationkey IN (1, 3, 5, 7)
        |        AND CAST(c_acctbal AS DECIMAL(18,6)) *
        |            (SELECT COUNT(*) FROM customer
        |             WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7))
        |          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,6))) FROM customer
        |             WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7))
        |        AND NOT EXISTS (SELECT 1 FROM orders
        |                        WHERE o_custkey = c_custkey AND o_orderstatus = 'F')) c
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin
    ) { (s, d) =>
      val cohort = Seq(1, 3, 5, 7)
      val cust = t(s, d, "customer").filter(col("c_nationkey").isin(cohort: _*))
        .select("c_custkey", "c_nationkey", "c_acctbal")
      val thr = cust.filter(col("c_acctbal") > 0)
        .agg(
          sum(col("c_acctbal").cast("decimal(18,6)")).as("bal_sum"),
          count(lit(1)).as("bal_cnt"))
      cust.crossJoin(broadcast(thr))
        .filter(col("c_acctbal").cast("decimal(18,6)") * col("bal_cnt") > col("bal_sum"))
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(
          count(lit(1)).cast("bigint").as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    },

    // TPC-H Q15 (top supplier): equality against the MAX of an aggregated
    // view — the view is built once, its 1-row max rides back as a
    // broadcast subtree, and the filtered survivors attach the supplier
    // dim. The view appears twice in the plan with an identical aggregate
    // subtree, which Spark's ReuseExchange collapses to one physical
    // shuffle; revenue is decimal-exact so the max-equality cannot flip
    // rows between engines.
    Op(
      "tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(round(total_revenue, 2) AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin
    ) { (s, d) =>
      val rev = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,6)")).as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.crossJoin(broadcast(maxRev))
        .filter(col("total_revenue") === col("max_revenue"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_name"),
          col("supplier_no") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("total_revenue"), 2).cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },

    // TPC-H Q6 (forecast revenue change): the minimal selective filter-agg.
    // Every predicate is scan-evaluable — at 100 TB this is THE query whose
    // cost is decided by pushdown + row-group statistics alone (a z-order/
    // shipdate-sorted layout prunes most of the scan before decoding).
    Op(
      "tpch_q6",
      """SELECT CAST(round(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin
    ) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          revSum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    },

    // TPC-H Q7 (volume shipping): the two-nation bilateral-flow query. The
    // OR of the two (supp, cust) nation orderings is implemented by pruning
    // BOTH dim sides to the two nations up front (broadcast nation joins on
    // supplier and customer — each side shrinks to 2/25 of its rows before
    // any fact join) and excluding the same-nation pairs afterwards, which
    // is set-equivalent to the disjunction. Facts shuffle once per join
    // key; the year() group rides the same aggregate.
    Op(
      "tpch_q7",
      """SELECT supp_nation, cust_nation, l_year,
        |       CAST(round(SUM(CAST(volume AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |             l_extendedprice * (1 - l_discount) AS volume
        |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
        |                    JOIN orders ON o_orderkey = l_orderkey
        |                    JOIN customer ON c_custkey = o_custkey
        |                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |        AND l_shipdate >= TIMESTAMP '1995-01-01'
        |        AND l_shipdate < TIMESTAMP '1997-01-01') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
    ) { (s, d) =>
      val pair = Seq("NATION_1", "NATION_2")
      val pairNation = t(s, d, "nation").filter(col("n_name").isin(pair: _*))
      val supp = t(s, d, "supplier")
        .join(broadcast(pairNation.select(
          col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val cust = t(s, d, "customer")
        .join(broadcast(pairNation.select(
          col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cn_key"))
        .select("c_custkey", "cust_nation")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        // both sides are already restricted to the two nations, so
        // "different nations" ≡ the query's OR of the two orderings
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revSum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // TPC-H Q8 (national market share): a RATIO of conditional aggregates
    // over an 8-table join — the numerator condition (supplier nation) is
    // evaluated inside the same partial aggregate as the denominator, so
    // the share costs one aggregate, not two plans. Nation/region are
    // SF-invariant broadcasts; part is pruned by the pushed p_type filter
    // before its join; customer/supplier/facts get Catalyst/AQE's size
    // call. Both sums are decimal-exact; the final division is one IEEE
    // double op on identical inputs, so the ratio is bit-identical across
    // engines before the display rounding.
    Op(
      "tpch_q8",
      """SELECT o_year,
        |       round(100.0 * (CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume_d
        |                                    ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
        |                      / CAST(SUM(volume_d) AS DOUBLE)), 6) AS mkt_share
        |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) AS volume_d,
        |             n2.n_name AS nation
        |      FROM part JOIN lineitem ON p_partkey = l_partkey
        |                JOIN supplier ON s_suppkey = l_suppkey
        |                JOIN orders ON l_orderkey = o_orderkey
        |                JOIN customer ON o_custkey = c_custkey
        |                JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |                JOIN region ON n1.n_regionkey = r_regionkey
        |                JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |        AND o_orderdate >= TIMESTAMP '1995-01-01'
        |        AND o_orderdate < TIMESTAMP '1997-01-01') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin
    ) { (s, d) =>
      val amNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("am_key"))
      val cust = t(s, d, "customer")
        .join(broadcast(amNations), col("c_nationkey") === col("am_key"))
        .select("c_custkey")
      val supp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").select(
          col("n_nationkey").as("sn_key"), col("n_name").as("nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "nation")
      val volD = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,6)")
      val zeroD = lit(0).cast("decimal(28,6)")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(t(s, d, "part").filter(col("p_type") === "ECONOMY").select("p_partkey"),
          col("p_partkey") === col("l_partkey"))
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(lit(100.0) *
          (sum(when(col("nation") === "NATION_1", volD).otherwise(zeroD)).cast("double") /
            sum(volD).cast("double")), 6).as("mkt_share"))
        .orderBy("o_year")
    },

    // TPC-H Q9 (product-type profit): profit per (supplier nation, order
    // year) over every part whose name matches. The fixture has no
    // partsupp, so `p_retailprice * l_quantity` stands in for
    // `ps_supplycost * l_quantity` — same columns-from-three-tables
    // arithmetic inside the aggregate, same join graph minus the partsupp
    // hop. Both product terms are bit-identical IEEE doubles cast to
    // decimal BEFORE the subtraction, so the summed amount is exact.
    Op(
      "tpch_q9",
      """SELECT nation, o_year, CAST(round(SUM(amount), 2) AS DOUBLE) AS sum_profit
        |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))
        |               - CAST(p_retailprice * l_quantity AS DECIMAL(28,6)) AS amount
        |      FROM part JOIN lineitem ON p_partkey = l_partkey
        |                JOIN supplier ON s_suppkey = l_suppkey
        |                JOIN orders ON o_orderkey = l_orderkey
        |                JOIN nation ON s_nationkey = n_nationkey
        |      WHERE p_name LIKE '%red%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year""".stripMargin
    ) { (s, d) =>
      val amount =
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(28,6)") -
          (col("p_retailprice") * col("l_quantity")).cast("decimal(28,6)")
      t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        .join(t(s, d, "part").filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice"),
          col("p_partkey") === col("l_partkey"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
          col("s_suppkey") === col("l_suppkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "nation").select(
          col("n_nationkey"), col("n_name").as("nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(amount), 2).cast("double").as("sum_profit"))
        .orderBy("nation", "o_year")
    },

    // TPC-H Q14 (promotion effect): the single-row conditional-ratio
    // aggregate. One fact join (part side pruned to two columns), CASE
    // evaluated in the map-side partial, one global aggregate — at 100 TB
    // the cost is the month's scan plus one 2-counter reduce. Decimal sums,
    // one IEEE division, display rounding last (Q8's determinism recipe).
    Op(
      "tpch_q14",
      """SELECT round(100.0 * (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN volume_d
        |                                    ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
        |                      / CAST(SUM(volume_d) AS DOUBLE)), 6) AS promo_revenue
        |FROM (SELECT p_type,
        |             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)) AS volume_d
        |      FROM lineitem JOIN part ON l_partkey = p_partkey
        |      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |        AND l_shipdate < TIMESTAMP '1996-10-01') x""".stripMargin
    ) { (s, d) =>
      val volD = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(28,6)")
      val zeroD = lit(0).cast("decimal(28,6)")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(t(s, d, "part").select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          (sum(when(col("p_type") === "PROMO", volD).otherwise(zeroD)).cast("double") /
            sum(volD).cast("double")), 6).as("promo_revenue"))
    },

    // TPC-H Q2 (minimum-cost supplier): the correlated-MIN shape — for each
    // part in a size slice, the region's suppliers offering it at the
    // minimum cost. The fixture has no partsupp, so the observed offer
    // relation is DERIVED: per (l_partkey, l_suppkey), the minimum unit
    // price ever shipped (min over IEEE-exact divisions — order-independent
    // and bit-identical in both engines, so the min-equality cannot flip
    // rows). The per-part MIN is an aggregate on the SAME key the join-back
    // runs on — one shuffle of the offer relation, reused; dims are
    // broadcast. At 100 TB the offer aggregate is the only fact-sized
    // stage, exactly like the real Q2's partsupp scan.
    Op(
      "tpch_q2",
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |                   MIN(l_extendedprice / l_quantity) AS supplycost
        |            FROM lineitem GROUP BY l_partkey, l_suppkey),
        |     eu AS (SELECT s_suppkey, s_acctbal, s_name, n_name
        |            FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |                          JOIN region ON n_regionkey = r_regionkey
        |            WHERE r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
        |FROM part JOIN ps ON p_partkey = l_partkey
        |          JOIN eu ON l_suppkey = s_suppkey
        |WHERE p_size = 15
        |  AND supplycost = (SELECT MIN(ps2.supplycost)
        |                    FROM ps ps2 JOIN eu eu2 ON ps2.l_suppkey = eu2.s_suppkey
        |                    WHERE ps2.l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin
    ) { (s, d) =>
      val euSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
      // the correlated MIN is a window over the offer relation's ONE
      // pipeline (not an aggregate + join-back, which would plan the
      // whole offer subtree twice): shuffle on (partkey,suppkey) for the
      // offer aggregate, one more on partkey for the window, done
      val minW = Window.partitionBy("l_partkey")
      t(s, d, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("supplycost"))
        .join(euSupp, col("l_suppkey") === col("s_suppkey"))
        .withColumn("min_cost", min(col("supplycost")).over(minW))
        .filter(col("supplycost") === col("min_cost"))
        .join(t(s, d, "part").filter(col("p_size") === 15).select("p_partkey", "p_name"),
          col("l_partkey") === col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
    },

    // TPC-H Q11 (important stock): per-key value vs a GLOBAL-total
    // threshold in HAVING. Value is the summed extended price a nation's
    // suppliers shipped per part (the fixture's stand-in for
    // supplycost·availqty over partsupp). The global total rides as a
    // broadcast 1-row subtree off the SAME aggregated input (no second
    // scan), and the threshold compare is multiplied through
    // (sum·1000 > total — Q17/Q22's trick) so it is decimal-exact.
    Op(
      "tpch_q11",
      """WITH natps AS (SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,6)) AS val
        |               FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |                             JOIN nation ON s_nationkey = n_nationkey
        |               WHERE n_name = 'NATION_7')
        |SELECT l_partkey AS ps_partkey,
        |       CAST(round(SUM(val), 2) AS DOUBLE) AS value
        |FROM natps
        |GROUP BY l_partkey
        |HAVING SUM(val) * 1000 > (SELECT SUM(val) FROM natps)
        |ORDER BY value DESC, ps_partkey""".stripMargin
    ) { (s, d) =>
      val natSupp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          .filter(col("n_name") === "NATION_7").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val natPs = t(s, d, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(natSupp, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"), col("l_extendedprice").cast("decimal(18,6)").as("val"))
      val grouped = natPs.groupBy("l_partkey").agg(sum(col("val")).as("val_sum"))
      // the global total re-aggregates the GROUPED output (sum of decimal
      // partial sums — exact), so the two plan appearances of the fact
      // subtree share an IDENTICAL aggregate exchange and ReuseExchange
      // collapses them to one physical fact pass
      val total = grouped.agg(sum(col("val_sum")).as("total"))
      grouped
        .crossJoin(broadcast(total))
        .filter(col("val_sum") * 1000 > col("total"))
        .select(col("l_partkey").as("ps_partkey"),
          round(col("val_sum"), 2).cast("double").as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },

    // TPC-H Q16 (parts/supplier relationship): COUNT(DISTINCT supplier) per
    // part attribute triple, under a NOT-IN supplier exclusion. The
    // lineitem (part, supplier) pairs play partsupp; "customers'
    // complaints" becomes the deterministic s_acctbal < 0 cohort. The
    // exclusion is a broadcast ANTI join on the fact BEFORE the part
    // attach; the distinct count shuffles (triple, suppkey) pairs once —
    // the same two-stage distinct aggregate the real Q16 plans.
    Op(
      "tpch_q16",
      """SELECT p_brand, p_type, p_size,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin
    ) { (s, d) =>
      // the exclusion cohort is a constant FRACTION of supplier — it scales
      // with SF, so no broadcast hint (AQE still broadcasts it at small SF)
      val excluded = t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      t(s, d, "lineitem").select("l_partkey", "l_suppkey")
        .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(t(s, d, "part")
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size"),
          col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).cast("bigint").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },

    // TPC-H Q20 (potential part promotion): the NESTED-IN shape — suppliers
    // (of one nation) whose shipped share of a name-matched part family
    // within a year exceeds a fraction of their all-time volume. The
    // availqty>½·qty predicate becomes win·5 > total over two conditional
    // sums of the SAME aggregate (one pass, decimal-exact multiply-through);
    // part names prune via a broadcast semi join before the aggregate; the
    // qualifying-supplier set flows supplier-ward as a semi join, so no
    // fact row is ever replicated.
    Op(
      "tpch_q20",
      """WITH redparts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
        |     qty AS (SELECT l_partkey, l_suppkey,
        |                    SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |                              AND l_shipdate < TIMESTAMP '1997-01-01'
        |                             THEN CAST(l_quantity AS DECIMAL(18,6))
        |                             ELSE CAST(0 AS DECIMAL(18,6)) END) AS win_qty,
        |                    SUM(CAST(l_quantity AS DECIMAL(18,6))) AS tot_qty
        |             FROM lineitem
        |             WHERE l_partkey IN (SELECT p_partkey FROM redparts)
        |             GROUP BY l_partkey, l_suppkey)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5'
        |  AND s_suppkey IN (SELECT l_suppkey FROM qty WHERE win_qty * 5 > tot_qty)
        |ORDER BY s_name""".stripMargin
    ) { (s, d) =>
      // name-matched parts are a constant fraction of an SF-scaling table:
      // no broadcast hint (Q16's rule) — the semi join strategy is AQE's
      val redParts = t(s, d, "part").filter(col("p_name").like("red%"))
        .select("p_partkey")
      val inWindow = col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp")
      val qD = col("l_quantity").cast("decimal(18,6)")
      val zeroQ = lit(0).cast("decimal(18,6)")
      val qualifying = t(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(redParts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
          sum(when(inWindow, qD).otherwise(zeroQ)).as("win_qty"),
          sum(qD).as("tot_qty"))
        .filter(col("win_qty") * 5 > col("tot_qty"))
        .select("l_suppkey")
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          .filter(col("n_name") === "NATION_5").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    },

    // Small-file compaction: the corpus maintenance primitive of every
    // long-lived ingest (streaming sinks and per-batch writes accrete
    // thousands of KB-scale files whose open/footer cost eventually
    // dominates scans). One read of the fragmented layout →
    // `repartition(target)` → one write; content must be EXACTLY preserved,
    // which is what the oracle checks (the file-count collapse itself is
    // asserted in ExactPlaneSpec). Both layouts are written once per
    // (session, sfDir) into the warehouse.
    Op(
      "compact_files",
      "SELECT doc_id, lang, n_chars FROM documents ORDER BY doc_id"
    ) { (s, d) =>
      compacted(s, d)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },

    // CDC MERGE / upsert: apply a change batch (inserts + updates + deletes)
    // to a keyed table in ONE full-outer join on the key — the lakehouse
    // MERGE INTO shape, expressed declaratively. The change batch is derived
    // deterministically from the fixture (updates: keys ≡0 mod 7 reprice
    // ×1.1 decimal-exact; deletes: keys ≡3 mod 11 not already updated;
    // inserts: keys ≡1 mod 13 re-keyed into a disjoint range), so the oracle
    // replays the identical merge. At 100 TB: one shuffle of each side on
    // the key — or ZERO shuffles when target and changes share a bucketed
    // layout (join_bucketed's contract); the anti-join-free single-pass plan
    // is the point (three separate insert/update/delete passes would scan
    // the target three times).
    Op("merge_upsert", mergeSql) { (s, d) =>
      val ord = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      applyChanges(ord, changeBatch(ord)).orderBy("o_orderkey")
    },

    // The bucketed MERGE — the scale path the plain merge_upsert documents:
    // when target AND change batch share a bucketed layout on the merge
    // key, the full-outer join needs NO exchange and NO sort on either side
    // (each bucketed scan already reports the matching partitioning and
    // per-bucket order; PlanSpec asserts zero hash exchanges). At 100 TB
    // this is the difference between shuffling the whole target per change
    // batch and touching only matching buckets. The change batch is written
    // bucketed once (real CDC batches arrive continuously and ARE the thing
    // you bucket on ingest); answers are oracle-identical to the unbucketed
    // merge — layout must never change results.
    Op("merge_upsert_bucketed", mergeSql) { (s, d) =>
      val (bOrd, _) = Bucketed.orderKeyTables(s, d)
      val target = bOrd.select("o_orderkey", "o_orderstatus", "o_totalprice")
      val changes = Bucketed.derivedTable(s, d, "merge_changes",
        changeBatch(t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")),
        "c_key")
      applyChanges(target, changes).orderBy("o_orderkey")
    },

    // ntile / percent_rank / cume_dist: the quantile-bucketing windows every
    // feature pipeline uses (score deciles, percentile features). One
    // shuffle on the partition key; the ORDER BY inside the frame is made
    // total (price, then key) so ranks are engine-independent.
    Op(
      "window_ntile",
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
      t(s, d, "orders")
        .select(
          col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_orderkey")
    },

    // Consistent (hash-stable) sampling: keep a row iff a cryptographic
    // digest of its key falls under the threshold — the train/test-split /
    // downsampling primitive at scale. Unlike Bernoulli sampling it is
    // reproducible across engines, partitionings and reruns (md5 of the
    // decimal key string, first hex byte <= 0x28 ≈ 16%), joins consistently
    // (the same keys are kept everywhere), and is a narrow scan with NO
    // shuffle and no RNG state.
    Op(
      "sample_consistent",
      """SELECT o_orderkey FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <= '28'
        |ORDER BY o_orderkey""".stripMargin
    ) { (s, d) =>
      t(s, d, "orders")
        .filter(substring(md5(col("o_orderkey").cast("string").cast("binary")), 1, 2) <= "28")
        .select("o_orderkey")
        .orderBy("o_orderkey")
    },

    // Z-order clustering key: bit-interleave of two join/filter dimensions.
    // The query exposes the 100 lowest z-values as a determinism check; the
    // layout use is `repartitionByRange(zval).sortWithinPartitions(zval)` at
    // write time, after which parquet min/max stats prune on BOTH l_partkey
    // and l_suppkey ranges simultaneously.
    Op(
      "sort_zorder",
      s"""SELECT l_orderkey, l_linenumber, CAST(${zSql("(l_partkey % 256)", "(l_suppkey % 256)", 8)} AS BIGINT) AS zval
         |FROM lineitem
         |ORDER BY zval, l_orderkey, l_linenumber LIMIT 100""".stripMargin
    ) { (s, d) =>
      t(s, d, "lineitem")
        .withColumn("zval",
          zCol(col("l_partkey") % 256, col("l_suppkey") % 256, 8).cast("bigint"))
        .select(col("l_orderkey"), col("l_linenumber"), col("zval"))
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(100)
    }
  )
}
