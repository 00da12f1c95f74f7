package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions (SURVEY §6): at 100 TB the plan IS the
  * product — filters must reach the parquet scan, projections must prune
  * the read schema, dimension joins must broadcast. These read the
  * UNCACHED plans (`Tables.raw`): the cached fixtures used by small-SF
  * tests report InMemoryTableScan, which hides what a cluster-scale scan
  * would do.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  // a directory no other suite caches: Spark's CacheManager substitutes a
  // cached InMemoryRelation into ANY matching fresh read of the same path,
  // which would hide the parquet scan these tests assert on
  private val rawSf = "/root/testdata/sf0.01"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("predicate pushdown: the filter reaches the parquet scan") {
    val df = schema.Tables.raw(spark, rawSf, "lineitem")
      .filter(col("l_quantity") < 24 && col("l_discount") > 0.02)
      .select("l_orderkey", "l_quantity", "l_discount")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:"), s"no pushed filters in:\n$plan")
    // match prefixes: the plan string truncates the PushedFilters list
    assert(plan.contains("LessThan(l_quantity,"), s"quantity filter not pushed:\n$plan")
    assert(plan.contains("GreaterThan(l_discount,"), s"discount filter not pushed:\n$plan")
  }

  test("column pruning: the read schema carries only referenced columns") {
    val df = schema.Tables.raw(spark, rawSf, "lineitem")
      .filter(col("l_quantity") < 24)
      .select("l_orderkey", "l_quantity")
    val plan = planOf(df)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"),
      s"selected columns missing from read schema: $readSchema")
    // a 16-column table read for a 2-column projection is wrong at scale
    Seq("l_extendedprice", "l_shipdate", "l_returnflag").foreach { c =>
      assert(!readSchema.contains(c), s"unpruned column $c in read schema: $readSchema")
    }
  }

  test("dimension joins broadcast; the declared ops keep their hints") {
    // the 3-way op declares broadcast() on its dim sides
    val threeWay = SparkEntry.queries("join_3way")(spark, sf)
    assert(planOf(threeWay).contains("BroadcastHashJoin"),
      "join_3way lost its broadcast dim join")
    // an unhinted raw small-dim join still broadcasts under the default
    // autoBroadcastJoinThreshold — Catalyst's choice, not ours
    val dimJoin = schema.Tables.raw(spark, rawSf, "lineitem")
      .join(schema.Tables.raw(spark, rawSf, "supplier"), col("l_suppkey") === col("s_suppkey"))
    assert(planOf(dimJoin).contains("BroadcastHashJoin"),
      "small dim did not broadcast")
  }

  test("partition pruning: a year predicate becomes a PartitionFilter") {
    val df = exact.Partitioned.lineitemByYear(spark, rawSf)
      .filter(col("l_year") === 1996)
      .select("l_orderkey")
    val plan = planOf(df)
    assert(plan.contains("PartitionFilters:") && plan.contains("(l_year"),
      s"year predicate did not reach PartitionFilters:\n$plan")
    // the partition column predicate must NOT appear as a data filter —
    // pruning happens at planning time, not per row
    assert(!plan.contains("PushedFilters: [IsNotNull(l_year)"),
      s"partition predicate leaked into the row filter:\n$plan")
  }

  // The three round-5 op tests below use the shared `sf` fixture dir, NOT
  // rawSf: their assertions are cache-tolerant (window/join/Expand shape, not
  // scan details), and running them through the caching Tables path on rawSf
  // would plant InMemoryRelations that the CacheManager substitutes into the
  // raw-scan plans the rest of this suite asserts on.
  test("as-of join plans as one window, not a join") {
    val plan = planOf(SparkEntry.queries("join_asof")(spark, sf))
    assert(plan.contains("Window"), s"as-of lost its window formulation:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join (range-join regression):\n$plan")
  }

  test("salted skew join shuffles on (key, salt) once broadcast is off the table") {
    // locally the ×8-exploded build side still fits the broadcast threshold
    // (and AQE rightly broadcasts it); at 100 TB it cannot — disable the
    // threshold to see the plan a cluster would produce and assert the join
    // keys carry the salt
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("join_skew_salted")(spark, sf)
      df.collect() // AQE finalizes join strategy at execution
      val plan = planOf(df)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"salted join must shuffle on the salted key:\n$plan")
      assert(plan.contains("salt#"), s"join keys lost the salt component:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("grouping sets plan one Expand, not one scan per set") {
    val plan = planOf(SparkEntry.queries("agg_grouping_sets")(spark, sf))
    assert("Expand".r.findAllIn(plan).size == 1,
      s"grouping sets need exactly one Expand:\n$plan")
    // one logical scan of the input (an InMemoryTableScan prints its cached
    // relation's FileScan too — count each kind, not the sum)
    assert("InMemoryTableScan".r.findAllIn(plan).size <= 1 &&
      "FileScan".r.findAllIn(plan).size <= 1,
      s"grouping sets re-scanned the input:\n$plan")
  }

  test("tpch_q5: dims broadcast at small SF; customer/supplier strategy is size-driven") {
    // small SF: Catalyst/AQE's size check broadcasts every non-fact side on
    // its own — no hints needed on the SF-scaling tables for the fast plan.
    // AQE finalizes the strategy at runtime, so execute before inspecting.
    val df = SparkEntry.queries("tpch_q5")(spark, rawSf)
    df.collect()
    // AdaptiveSparkPlan.toString appends the pre-AQE "== Initial Plan ==" —
    // assert on the Final Plan section only
    val plan = planOf(df).split("== Initial Plan ==").head
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts in:\n$plan")
    // a sort-merge join surviving AQE at this SF would mean a fact table is
    // being re-partitioned per join — the shuffle-storm shape this query
    // exists to pin down
    assert(!plan.contains("SortMergeJoin"),
      s"AQE left a sort-merge join in the small-SF plan:\n$plan")
  }

  test("tpch_q5/q10: no forced broadcast of SF-scaling tables (customer, supplier)") {
    // disable the size threshold to see the plan a 100 TB cluster would
    // produce: ONLY explicitly hinted sides may still broadcast, and the
    // hints must sit on SF-invariant dims alone (nation 25 rows, region 5).
    // customer/supplier grow linearly with SF — a hint there is a guaranteed
    // executor OOM at scale, so they must degrade to a shuffled join here.
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q5 = planOf(SparkEntry.queries("tpch_q5")(spark, rawSf))
      // q5 hints: region→nation and nation-slice→supplier (both bounded)
      val q5Broadcasts = "BroadcastHashJoin".r.findAllIn(q5).length
      assert(q5Broadcasts == 2,
        s"q5 must keep exactly the 2 bounded-dim broadcast hints, got $q5Broadcasts:\n$q5")
      assert(q5.contains("SortMergeJoin") || q5.contains("ShuffledHashJoin"),
        s"q5 customer/supplier joins must shuffle once broadcast is size-barred:\n$q5")
      val q10 = planOf(SparkEntry.queries("tpch_q10")(spark, rawSf))
      // q10 hints: nation only
      val q10Broadcasts = "BroadcastHashJoin".r.findAllIn(q10).length
      assert(q10Broadcasts == 1,
        s"q10 must keep exactly the nation broadcast hint, got $q10Broadcasts:\n$q10")
      assert(q10.contains("SortMergeJoin") || q10.contains("ShuffledHashJoin"),
        s"q10 customer join must shuffle once broadcast is size-barred:\n$q10")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("tpch_q13: outer join and per-customer count share one partitioning") {
    // the cluster-scale plan: no broadcasts, the LEFT OUTER survives, and
    // the per-customer COUNT (grouped on the join key) reuses the join's
    // hash partitioning — so the only hash exchanges are the two join
    // inputs plus the tiny histogram aggregate
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(SparkEntry.queries("tpch_q13")(spark, rawSf))
      assert(plan.contains("LeftOuter"), s"q13 lost its left outer join:\n$plan")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles <= 3,
        s"per-customer agg must not re-shuffle the join output, got $shuffles exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("tpch_q18: qualifying keys flow through a semi join, no broadcast hints") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(SparkEntry.queries("tpch_q18")(spark, rawSf))
      assert(plan.contains("LeftSemi"), s"q18 lost its semi join:\n$plan")
      // with the size threshold disabled NOTHING may broadcast — q18 has no
      // hints because every side scales with SF
      assert(!plan.contains("BroadcastHashJoin"),
        s"q18 must not force a broadcast at cluster scale:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("tpch_q4: EXISTS decorrelates to a semi join with the non-equi conjunct, no hints") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(SparkEntry.queries("tpch_q4")(spark, rawSf))
      assert(plan.contains("LeftSemi"), s"q4 lost its semi join:\n$plan")
      // both sides scale with SF: at cluster scale nothing may broadcast
      assert(!plan.contains("BroadcastHashJoin"),
        s"q4 must not force a broadcast at cluster scale:\n$plan")
      // the lateness predicate rides the join, not a post-join filter pass —
      // the interval add only appears in the plan through that conjunct
      assert(plan.contains("INTERVAL"),
        s"q4's non-equi lateness conjunct missing from the plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("tpch_q17: per-part aggregate and both joins share the l_partkey partitioning") {
    // cluster-scale plan: the fact shuffles on l_partkey for the first join,
    // the brand slice shuffles, and the per-part aggregate shuffles its
    // partials — the aggregate-side join must REUSE that partitioning, so at
    // most 3 hash exchanges appear (the final ungrouped agg is a single-
    // partition exchange, not a hash one)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(SparkEntry.queries("tpch_q17")(spark, rawSf))
      assert(!plan.contains("BroadcastHashJoin"),
        s"q17 must not force a broadcast at cluster scale:\n$plan")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles <= 3,
        s"q17's aggregate-side join must reuse the l_partkey partitioning, got $shuffles exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("tpch_q19: the disjunctive join predicate CNF-splits onto BOTH scans") {
    // raw-scan mirror of the op (the op reads through the caching Tables
    // path, whose InMemoryRelation hides scan details): the OR of mixed-side
    // conjunctions must push its part-only disjunction to the part scan and
    // its lineitem-only disjunction to the lineitem scan — evaluated after
    // the join, Q19 degenerates to joining the unfiltered fact. sf0.1, not
    // rawSf: this suite's op tests cache rawSf's tables through Tables(),
    // and the CacheManager would substitute those cached relations into
    // these raw reads; the test only PLANS (no execution), so size is free
    val sfBig = "/root/testdata/sf0.1"
    val li = schema.Tables.raw(spark, sfBig, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val pt = schema.Tables.raw(spark, sfBig, "part").select("p_partkey", "p_brand", "p_size")
    val disjunct =
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
        col("l_quantity").between(10, 40))
    val plan = planOf(
      li.join(pt, col("p_partkey") === col("l_partkey")).filter(disjunct)
        .agg(sum("l_extendedprice")))
    assert(plan.contains("Or(And(EqualTo(p_brand,Brand#4)"),
      s"part-side disjunction did not reach the part scan:\n$plan")
    assert(plan.contains("Or(And(GreaterThanOrEqual(l_quantity,1.0)"),
      s"lineitem-side disjunction did not reach the lineitem scan:\n$plan")
  }

  test("unpivot plans one Expand over one scan, not a union of three scans") {
    val plan = planOf(SparkEntry.queries("unpivot_metrics")(spark, sf))
    assert("Expand".r.findAllIn(plan).size == 1,
      s"unpivot must be a single Expand:\n$plan")
    assert("InMemoryTableScan".r.findAllIn(plan).size <= 1 &&
      "FileScan".r.findAllIn(plan).size <= 1,
      s"unpivot re-scanned the input:\n$plan")
  }

  test("merge_upsert: one full-outer join applies the whole change batch") {
    // the single-pass MERGE shape: inserts+updates+deletes ride ONE join on
    // the key (three separate apply passes would plan three joins and scan
    // the target three times)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(SparkEntry.queries("merge_upsert")(spark, rawSf))
      assert(plan.contains("FullOuter"), s"merge lost its full-outer join:\n$plan")
      val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(plan).length
      assert(joins == 1, s"MERGE must be exactly one join, got $joins:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("z-order layout: per-file ranges tighten on BOTH dimensions vs key-sorted") {
    // write the same rows twice: sorted by one key (the single-dim layout)
    // and sorted by the interleaved z-value; parquet min/max stats per FILE
    // are what row-group skipping prunes on. The z-layout must bound the
    // average per-file span of BOTH dimensions below the corpus span, while
    // the single-key layout leaves the other dimension unclustered.
    import org.apache.spark.sql.functions.{col => c}
    val li = schema.Tables.raw(spark, rawSf, "lineitem")
      .select(
        (c("l_partkey") % 256).as("x"),
        (c("l_suppkey") % 256).as("y"))
    val z = SparkEntry.queries("sort_zorder")(spark, rawSf) // warms nothing; just ensures op runs
    assert(z.count() == 100)
    def spans(df: org.apache.spark.sql.DataFrame, sortCol: String): (Double, Double) = {
      val dir = java.nio.file.Files.createTempDirectory("zorder_test").toString
      df.withColumn("z",
          // same interleave the operator computes, rebuilt here to sort by
          (0 until 8).flatMap(i => Seq(
            shiftleft(shiftright(c("x"), i).bitwiseAND(lit(1L)), 2 * i),
            shiftleft(shiftright(c("y"), i).bitwiseAND(lit(1L)), 2 * i + 1))).reduce(_ bitwiseOR _))
        .repartitionByRange(8, c(sortCol))
        .sortWithinPartitions(sortCol)
        .write.mode("overwrite").parquet(dir)
      val perFile = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy("f")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .agg(avg("sx"), avg("sy")).head()
      val r = (perFile.getDouble(0), perFile.getDouble(1))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      r
    }
    val (xByX, yByX) = spans(li, "x") // single-key layout: x tight, y loose
    val (xByZ, yByZ) = spans(li, "z") // z layout: BOTH partially tight
    info(f"x-sorted: x-span $xByX%.0f y-span $yByX%.0f | z-sorted: x-span $xByZ%.0f y-span $yByZ%.0f")
    assert(xByX < 64, s"x-sorted files must cluster x (avg span $xByX)")
    // the z layout trades some x locality to cluster BOTH dims: y-spans must
    // tighten vs the x-sorted layout (the fixture's keys are correlated, so
    // x-sorting partially clusters y already — z must still beat it) while
    // x stays well under the unclustered ~255 span
    assert(yByZ < yByX, s"z-sorted y-span $yByZ must beat x-sorted $yByX")
    assert(xByZ < 200 && yByZ < 200,
      s"z-sorted files must cluster both dims (x $xByZ, y $yByZ)")
  }

  test("tpch_q21: semi and anti probes survive at scale with no forced broadcast") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(SparkEntry.queries("tpch_q21")(spark, rawSf))
      assert(plan.contains("LeftSemi"), s"q21 lost its EXISTS semi join:\n$plan")
      assert(plan.contains("LeftAnti"), s"q21 lost its NOT EXISTS anti join:\n$plan")
      // only the 25-row nation dim carries a hint; every lineitem leg,
      // orders, and supplier scale with SF and must not broadcast
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      assert(bhj <= 1, s"q21 may broadcast only the nation dim, got $bhj:\n$plan")
      // the four fact legs join on l_orderkey: one exchange per leg, the
      // chain reuses the partitioning; suppkey attach + final agg add the
      // rest — more means a leg re-shuffled on a key it already had
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(shuffles <= 7,
        s"q21's l_orderkey legs must share one partitioning, got $shuffles exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("tpch_q15: the revenue view's two plan appearances share one physical shuffle") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("tpch_q15")(spark, rawSf)
      // ReuseExchange only dedups in the final physical plan
      df.collect()
      val plan = planOf(df)
      assert(plan.contains("ReusedExchange") || plan.contains("ReusedSubquery") ||
        plan.contains("InMemoryTableScan"),
        s"q15 recomputed the revenue view instead of reusing its shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("tpch_q7/q8: hints sit only on bounded dims; fact joins shuffle at scale") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // q7 hints: the 2-nation slice attaching to supplier and to customer.
      // supplier/customer/orders/lineitem scale with SF → must shuffle.
      val q7 = planOf(SparkEntry.queries("tpch_q7")(spark, rawSf))
      val q7Bhj = "BroadcastHashJoin".r.findAllIn(q7).length
      assert(q7Bhj == 2, s"q7 must keep exactly its 2 nation-slice hints, got $q7Bhj:\n$q7")
      assert(q7.contains("SortMergeJoin") || q7.contains("ShuffledHashJoin"),
        s"q7 fact joins must shuffle once broadcast is size-barred:\n$q7")
      // q8 hints: region→nation, america-nations→customer, nation→supplier
      // (all SF-invariant); part/orders/customer/supplier/lineitem shuffle
      val q8 = planOf(SparkEntry.queries("tpch_q8")(spark, rawSf))
      val q8Bhj = "BroadcastHashJoin".r.findAllIn(q8).length
      assert(q8Bhj == 3, s"q8 must keep exactly its 3 bounded-dim hints, got $q8Bhj:\n$q8")
      assert(q8.contains("SortMergeJoin") || q8.contains("ShuffledHashJoin"),
        s"q8 fact joins must shuffle once broadcast is size-barred:\n$q8")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("tpch_q2/q16/q20: SF-scaling slices carry no broadcast hint") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // q2 hints: region→nation, euro-nations→supplier (bounded dims only);
      // the derived offer relation and its min join-back must shuffle
      val q2 = planOf(SparkEntry.queries("tpch_q2")(spark, rawSf))
      val q2Bhj = "BroadcastHashJoin".r.findAllIn(q2).length
      assert(q2Bhj == 2, s"q2 must keep exactly its 2 bounded-dim hints, got $q2Bhj:\n$q2")
      // q16: the complaint cohort is a fraction of SF-scaling supplier —
      // the anti join must not broadcast when size-barred
      val q16 = planOf(SparkEntry.queries("tpch_q16")(spark, rawSf))
      val q16Bhj = "BroadcastHashJoin".r.findAllIn(q16).length
      assert(q16Bhj == 0, s"q16 must carry no broadcast hints, got $q16Bhj:\n$q16")
      assert(q16.contains("LeftAnti"), s"q16 lost its NOT IN anti join:\n$q16")
      // q20: both semi probes (part-name slice, qualifying suppliers) are
      // SF-scaling — only the nation dim hint may broadcast
      val q20 = planOf(SparkEntry.queries("tpch_q20")(spark, rawSf))
      val q20Bhj = "BroadcastHashJoin".r.findAllIn(q20).length
      assert(q20Bhj <= 1, s"q20 may broadcast only the nation dim, got $q20Bhj:\n$q20")
      assert("LeftSemi".r.findAllIn(q20).length == 2,
        s"q20 must plan both nested-IN levels as semi joins:\n$q20")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("merge_upsert_bucketed: co-located layouts merge with zero hash exchanges") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // bar broadcasting so the full-outer join must rely on the bucketed
      // co-location: no hashpartitioning exchange may appear anywhere (the
      // final ORDER BY's range exchange is the only legal shuffle)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(SparkEntry.queries("merge_upsert_bucketed")(spark, rawSf))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed merge must not shuffle either side:\n$plan")
      // the join line carries the key lists between the operator name and
      // its type: assert both tokens, not a contiguous literal
      assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
        s"merge must plan the co-located sort-merge full-outer join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("join_spn_broadcast: the LEARNED estimate drives the broadcast, not file sizes") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // with size-based broadcasting barred, only the model's cardinality
      // estimate can justify the hint — if it still broadcasts, learned
      // statistics made the call
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = planOf(SparkEntry.queries("join_spn_broadcast")(spark, rawSf))
      assert(plan.contains("BroadcastHashJoin"),
        s"the 0.1%-selective side must broadcast on the learned estimate:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("winnowing fingerprint plans as a narrow map: no exchange, no window sort") {
    // the whole selection is array HOFs within the row — any Exchange or
    // Window operator means the per-position explode+shuffle form came
    // back. The AT-SCALE input shape (≥ cores splits) must plan with ZERO
    // exchanges; the fixture's single 584 KB split instead takes the
    // small-input fan-out (one round-robin exchange so the md5 map uses
    // every core, measured 2.9 s → 1.0 s) — asserted separately below.
    val wide = schema.Tables.raw(spark, rawSf, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    val plan = planOf(ext.Text.winnowFp(wide))
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, // only the fixture's own repartition above
      s"at-scale winnowing must not add any exchange:\n$plan")
    assert(!plan.contains("Window"),
      s"winnowing must not sort per-doc windows:\n$plan")
    // small input: exactly ONE round-robin fan-out, still no Window
    val small = planOf(ext.Text.winnowFp(schema.Tables.raw(spark, rawSf, "documents")))
    assert(small.linesIterator.count(_.contains("Exchange")) == 1 &&
      small.contains("RoundRobinPartitioning"),
      s"small input must fan out through one round-robin exchange:\n$small")
    assert(!small.contains("Window"))
  }

  test("quality_filter: two keyed aggregations, both partial, never the text through a join") {
    val plan = planOf(SparkEntry.queries("quality_filter")(spark, sf))
    val keyed = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 2, s"expected exactly (doc_id,tok) + (doc_id) exchanges, got $keyed:\n$plan")
    assert(plan.contains("partial_"), s"aggregates lost map-side combine:\n$plan")
    assert(!plan.contains("Join"), s"signal computation must not join:\n$plan")
  }

  test("dup_ngram_corpus: one gram-keyed window exchange feeds one doc aggregation") {
    val plan = planOf(SparkEntry.queries("dup_ngram_corpus")(spark, sf))
    val keyed = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 2, s"expected gram-window + doc-agg exchanges only, got $keyed:\n$plan")
    assert(plan.contains("Window"), s"corpus document-frequency lost its window form:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"gram frequencies must attach via the window, not a self-join:\n$plan")
  }

  test("dedup_paragraph: segment-keyed rank + doc reassembly, linear (no self-join)") {
    val plan = planOf(SparkEntry.queries("dedup_paragraph")(spark, sf))
    val keyed = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 2, s"expected segment-rank + doc-agg exchanges only, got $keyed:\n$plan")
    assert(plan.contains("Window"), s"first-occurrence rank lost its window form:\n$plan")
    assert(!plan.contains("Join"),
      s"paragraph dedup is linear — a join means a pairwise blowup crept in:\n$plan")
  }

  test("sample_stratified: the rank-≤-K filter pushes a partial top-K below the exchange") {
    // WindowGroupLimit is what makes per-stratum top-K viable at scale: each
    // mapper pre-trims to K rows per language BEFORE the lang-keyed shuffle
    val plan = planOf(SparkEntry.queries("sample_stratified")(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter lost the group-limit pushdown — the full corpus would shuffle:\n$plan")
  }

  test("fuzzy_join: the probe side broadcasts; the corpus never shuffles into the candidate join") {
    // assert on the computation pipeline over an UNCACHED raw read — the
    // op memoizes the bounded match list, and the CacheManager substitutes
    // any equivalent plan with the materialized InMemoryRelation, hiding
    // the shape this test pins
    val (pairs, sh) = ext.Dedup.fuzzyMatches(schema.Tables.raw(spark, rawSf, "documents"))
    val plan = planOf(pairs)
    sh.unpersist()
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate generation lost the broadcast probe index:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a sort-merge join means a corpus-sized gram shuffle:\n$plan")
    // the only keyed exchange is the (p_id, c_id) intersection count —
    // candidate-pair-sized, tiny next to the corpus
    val keyed = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(keyed == 1, s"expected only the pair-count exchange, got $keyed:\n$plan")
  }

  test("ssb flights: the year predicate prunes lineorder partitions at planning time") {
    // the denormalized fact is written partitioned by lo_year, so Q1's
    // single-year filter and Q3's range must surface as PartitionFilters
    // on the scan — directory pruning, not row filtering
    val q1 = planOf(SparkEntry.queries("ssb_q1")(spark, sf))
    assert(q1.contains("PartitionFilters") && q1.contains("lo_year"),
      s"ssb_q1 year filter did not reach PartitionFilters:\n$q1")
    val q3 = planOf(SparkEntry.queries("ssb_q3")(spark, sf))
    assert(q3.linesIterator.exists(l =>
        l.contains("PartitionFilters") && l.contains("lo_year")),
      s"ssb_q3 year range did not reach PartitionFilters:\n$q3")
  }

  test("ssb flights: hints sit only on the nation/region slices; fact-side joins shuffle when size-barred") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // q2's hinted joins: region→nation and the nations-slice→supplier
      // (both bounded); the lineorder⨝part fact join must shuffle
      val q2 = planOf(SparkEntry.queries("ssb_q2")(spark, sf))
      val q2Bhj = "BroadcastHashJoin".r.findAllIn(q2).length
      assert(q2Bhj <= 2, s"ssb_q2 may broadcast only its bounded dim slices, got $q2Bhj:\n$q2")
      assert(q2.contains("SortMergeJoin"),
        s"ssb_q2's SF-scaling part join must shuffle when size-barred:\n$q2")
      // q3 hints two nation/region slices (customer and supplier paths);
      // both SF-scaling dimension attaches must shuffle
      val q3 = planOf(SparkEntry.queries("ssb_q3")(spark, sf))
      val q3Bhj = "BroadcastHashJoin".r.findAllIn(q3).length
      assert(q3Bhj <= 4, s"ssb_q3 may broadcast only its bounded dim slices, got $q3Bhj:\n$q3")
      assert("SortMergeJoin".r.findAllIn(q3).length >= 2,
        s"ssb_q3's customer and supplier attaches must shuffle when size-barred:\n$q3")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("whole-stage codegen covers the scan-filter-aggregate pipeline") {
    val df = schema.Tables.raw(spark, rawSf, "lineitem")
      .filter(col("l_quantity") < 24)
      .groupBy("l_returnflag").agg(sum("l_extendedprice"))
    // AQE only annotates codegen stages ("*(n)" / WholeStageCodegen) in the
    // FINAL plan, so execute before inspecting
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"),
      s"hot path fell out of whole-stage codegen:\n$plan")
  }
}
