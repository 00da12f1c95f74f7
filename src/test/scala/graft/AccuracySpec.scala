package graft

import graft.rspn._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate
import scala.util.Random

/** Accuracy harness (SURVEY §5.4): q-error of model estimates vs the exact
  * plane on randomized conjunctive predicates — our analog of the
  * reference's evaluation/cardinality_evaluation.py + aqp_evaluation.py.
  */
class AccuracySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ens = Ensemble.get(spark, sf)
  private lazy val li = schema.Tables(spark, sf, "lineitem")

  private def qerr(est: Double, exact: Double): Double = {
    val e = math.max(est, 1.0)
    val x = math.max(exact, 1.0)
    math.max(e / x, x / e)
  }

  test("M11 update drift: micro-batch inserts track a fresh retrain (updates_evaluation)") {
    // the reference's evaluation/updates_evaluation.py protocol: train on a
    // time-prefix of events, insert the remainder in micro-batches, then
    // measure est_count q-error of the UPDATED model against a model trained
    // fresh on the full data — the property M11 exists to protect. Median
    // drift must stay within ~1.5× the fresh model's error.
    val ev = schema.Tables(spark, sf, "events")
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).sorted
    val typeCode = map(types.zipWithIndex.flatMap { case (v, i) => Seq(lit(v), lit(i.toDouble)) }: _*)
    val data = ev
      .orderBy("ts", "event_id")
      .select(element_at(typeCode, col("event_type")), col("value").cast("double"))
      .collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1)))
    val kinds = Array[Learn.ColKind](Learn.CategoricalCol(types.length), Learn.NumericCol)
    val cut = data.length / 2
    val (prefix, rest) = data.splitAt(cut)
    val batchSize = math.max(1, math.ceil(rest.length / 5.0).toInt)
    val updated = rest.grouped(batchSize)
      .foldLeft(Learn.learn(prefix, kinds))((root, b) => Update.insertBatch(root, b.toArray))
    val fresh = Learn.learn(data, kinds)
    val n = data.length.toDouble
    val rng = new Random(11)
    val (qUpd, qFresh) = (1 to 40).map { _ =>
      val tcode = rng.nextInt(types.length).toDouble
      val lo = rng.nextDouble() * 250
      val hi = lo + 20 + rng.nextDouble() * 80
      val ranges: Array[ColRange] = Array(NominalSet(Array(tcode)), NumRange(lo, hi))
      val truth = data.count(d => d(0) == tcode && d(1) >= lo && d(1) <= hi).toDouble
      (qerr(n * Spn.prob(updated, ranges), truth), qerr(n * Spn.prob(fresh, ranges), truth))
    }.unzip
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val (mu, mf) = (median(qUpd), median(qFresh))
    info(f"median q-error updated=$mu%.3f fresh=$mf%.3f")
    assert(mu <= mf * 1.5 + 0.05,
      s"updated-model drift $mu exceeds 1.5x the fresh model's $mf")
  }

  test("M11b delete drift: micro-batch deletes track a fresh retrain on the kept rows") {
    // the forget direction of updates_evaluation: train on the FULL events
    // stream, delete the time-suffix in micro-batches, and measure est_count
    // q-error of the shrunk model against a model trained fresh on only the
    // kept prefix. Delete routing is max-likelihood (not a ledger of the
    // original cluster assignment), so the bound is the same protocol with
    // the same ~1.5× envelope plus a routing allowance.
    val ev = schema.Tables(spark, sf, "events")
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).sorted
    val typeCode = map(types.zipWithIndex.flatMap { case (v, i) => Seq(lit(v), lit(i.toDouble)) }: _*)
    val data = ev
      .orderBy("ts", "event_id")
      .select(element_at(typeCode, col("event_type")), col("value").cast("double"))
      .collect()
      .map(r => Array(r.getDouble(0), r.getDouble(1)))
    val kinds = Array[Learn.ColKind](Learn.CategoricalCol(types.length), Learn.NumericCol)
    val cut = data.length / 2
    val (kept, dropped) = data.splitAt(cut)
    val batchSize = math.max(1, math.ceil(dropped.length / 5.0).toInt)
    val shrunk = dropped.grouped(batchSize)
      .foldLeft(Learn.learn(data, kinds))((root, b) => Update.deleteBatch(root, b.toArray))
    val fresh = Learn.learn(kept, kinds)
    val n = kept.length.toDouble
    val rng = new Random(13)
    val (qDel, qFresh) = (1 to 40).map { _ =>
      val tcode = rng.nextInt(types.length).toDouble
      val lo = rng.nextDouble() * 250
      val hi = lo + 20 + rng.nextDouble() * 80
      val ranges: Array[ColRange] = Array(NominalSet(Array(tcode)), NumRange(lo, hi))
      val truth = kept.count(d => d(0) == tcode && d(1) >= lo && d(1) <= hi).toDouble
      (qerr(n * Spn.prob(shrunk, ranges), truth), qerr(n * Spn.prob(fresh, ranges), truth))
    }.unzip
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val (md, mf) = (median(qDel), median(qFresh))
    info(f"median q-error deleted=$md%.3f fresh=$mf%.3f")
    assert(md <= mf * 1.5 + 0.1,
      s"delete-model drift $md exceeds 1.5x the fresh model's $mf")
  }

  test("est_count single-table: median q-error <= 1.5 over random predicates") {
    val rng = new Random(123)
    val errs = (1 to 20).map { _ =>
      val qLo = 1 + rng.nextInt(40)
      val qHi = qLo + 5 + rng.nextInt(10)
      val dLo = rng.nextDouble() * 0.06
      val dHi = dLo + 0.02 + rng.nextDouble() * 0.03
      val preds = Map(
        ("lineitem", "l_quantity") -> NumRange(qLo.toDouble, qHi.toDouble),
        ("lineitem", "l_discount") -> NumRange(dLo, dHi))
      val est = Ensemble.estCount(ens, Set("lineitem"), preds).value
      val exact = li.filter(col("l_quantity").between(qLo, qHi) &&
        col("l_discount").between(dLo, dHi)).count().toDouble
      qerr(est, exact)
    }.sorted
    // measured 1.018 at sf0.01 (reference JOB-light headline ≈1.3); 1.5
    // leaves seed/platform headroom without hiding a real regression
    val median = errs(errs.length / 2)
    assert(median <= 1.5, s"median q-error $median, errs=${errs.map(e => f"$e%.2f")}")
  }

  test("est_count join with nn gate matches exact inner-join count") {
    val o = schema.Tables(spark, sf, "orders")
    val exact = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "F").count().toDouble
    val spn = ens("orders_lineitem")
    val code = spn.cols(spn.colIdx("orders", "o_orderstatus")).code("F")
    val est = Ensemble.estCount(ens, Set("orders", "lineitem"),
      Map(("orders", "o_orderstatus") -> NominalSet(Array(code)))).value
    assert(qerr(est, exact) <= 2.5, s"est=$est exact=$exact")
  }

  test("est_count single table through join spn (inverse fanout) is consistent") {
    val exactOrders = schema.Tables(spark, sf, "orders").count().toDouble
    val spn = ens("orders_lineitem")
    val (ranges, exps) = (new Array[ColRange](spn.cols.length), new Array[Int](spn.cols.length))
    exps(spn.colIdx("", "mult_lineitem")) = -1
    val est = spn.scaleRows * Spn.expect(spn.root, ranges, exps)
    assert(qerr(est, exactOrders) <= 1.5, s"est=$est exact=$exactOrders")
  }

  test("est_sum relative error <= 15% on filtered revenue") {
    val d0 = LocalDate.parse("1996-01-01").toEpochDay.toDouble
    val d1 = LocalDate.parse("1998-01-01").toEpochDay.toDouble
    val est = Ensemble.estSum(ens, Set("lineitem"), ("lineitem", "l_extendedprice"),
      Map(("lineitem", "l_shipdate") -> NumRange(d0, d1, hiIncl = false))).value
    val exact = li.filter(
      col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .agg(sum("l_extendedprice")).head().getDouble(0)
    val rel = math.abs(est - exact) / exact
    assert(rel <= 0.15, s"rel=$rel est=$est exact=$exact")
  }

  test("est_groupby enumerates exactly the existing groups") {
    val est = Ensemble.estGroupByCount(ens, Set("lineitem"), ("lineitem", "l_returnflag"), Map.empty)
    val exact = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(est.map(_._1).toSet == exact.keySet)
    est.foreach { case (g, v) =>
      assert(qerr(v, exact(g)) <= 1.5, s"group $g est=$v exact=${exact(g)}")
    }
  }

  test("ci95 covers the exact count for an easy predicate") {
    val e = Ensemble.estCount(ens, Set("lineitem"),
      Map(("lineitem", "l_quantity") -> NumRange(Double.NegativeInfinity, 25.0, hiIncl = false)))
    val exact = li.filter(col("l_quantity") < 25).count().toDouble
    assert(e.ci95Lo <= exact && exact <= e.ci95Hi,
      s"CI [${e.ci95Lo}, ${e.ci95Hi}] misses $exact")
  }

  test("M10: factored est_count on customer⨝orders⨝lineitem q-error <= 2.5") {
    val c = schema.Tables(spark, sf, "customer")
    val o = schema.Tables(spark, sf, "orders")
    val exact = c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .filter(col("c_mktsegment") === "BUILDING" && col("l_quantity") < 25)
      .count().toDouble
    val mc = ens("customer").cols(ens("customer").colIdx("customer", "c_mktsegment"))
    val preds = Map(
      ("customer", "c_mktsegment") -> (NominalSet(Array(mc.code("BUILDING"))): ColRange),
      ("lineitem", "l_quantity") -> (NumRange(Double.NegativeInfinity, 25.0, hiIncl = false): ColRange))
    // drop EVERY SPN covering the full 3-table set (the chain AND the
    // 4-table star that subsumes it) so the query MUST go through the
    // factor algebra
    val noChain = ens.filter { case (_, s) => !Set("customer", "orders", "lineitem").subsetOf(s.tables) }
    val est = Ensemble.estCount(noChain, Set("customer", "orders", "lineitem"), preds).value
    // measured 1.009 median / 1.046 max over 15 seg×quantity variants
    assert(qerr(est, exact) <= 2.5, s"est=$est exact=$exact qerr=${qerr(est, exact)}")

    // the multi-hop chain SPN (reference JoinDataPreparator over chains)
    // answers the same query directly — and at least as well
    val direct = Ensemble.estCount(ens, Set("customer", "orders", "lineitem"), preds).value
    assert(qerr(direct, exact) <= 2.5, s"chain est=$direct exact=$exact")
  }

  test("M10: factored 4-way est_count (customer⨝orders⨝lineitem⨝part) q-error <= 2.5") {
    val c = schema.Tables(spark, sf, "customer")
    val o = schema.Tables(spark, sf, "orders")
    val p = schema.Tables(spark, sf, "part")
    val exact = c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(col("c_mktsegment") === "BUILDING" && col("p_size") <= 25)
      .count().toDouble
    val mc = ens("customer").cols(ens("customer").colIdx("customer", "c_mktsegment"))
    val preds = Map(
      ("customer", "c_mktsegment") -> (NominalSet(Array(mc.code("BUILDING"))): ColRange),
      ("part", "p_size") -> (NumRange(Double.NegativeInfinity, 25.0): ColRange))
    val tabs = Set("customer", "orders", "lineitem", "part")
    // force the factor algebra by hiding the 4-table star SPN
    val noStar = ens - "customer_orders_lineitem_part"
    val est = Ensemble.estCount(noStar, tabs, preds).value
    assert(qerr(est, exact) <= 2.5, s"est=$est exact=$exact qerr=${qerr(est, exact)}")

    // the star-shaped SPN (fact chain + attached part dim — the reference's
    // JOB-light ensemble shape) answers the 4-way query directly
    val direct = Ensemble.estCount(ens, tabs, preds).value
    assert(qerr(direct, exact) <= 2.5, s"star est=$direct exact=$exact")
  }

  test("chain SPN: multi-hop inverse-fanout reduces to each table's own count") {
    val chain = ens("customer_orders_lineitem")
    val only = Map(chain.name -> chain)
    // {customer} through the 3-table model: every row weighted
    // 1/(mult_orders · mult_lineitem) must sum back to |customer|
    val nCust = schema.Tables(spark, sf, "customer").count().toDouble
    val estC = Ensemble.estCount(only, Set("customer"), Map.empty).value
    assert(qerr(estC, nCust) <= 1.5, s"est=$estC exact=$nCust")
    // {customer, orders}: nn-gate orders, invert only the lineitem hop
    val nOrd = schema.Tables(spark, sf, "orders").count().toDouble
    val estO = Ensemble.estCount(only, Set("customer", "orders"), Map.empty).value
    assert(qerr(estO, nOrd) <= 1.5, s"est=$estO exact=$nOrd")
  }

  test("chain SPN: bottom-of-chain query sets need NO ancestor fanout correction") {
    val chain = ens("customer_orders_lineitem")
    val only = Map(chain.name -> chain)
    // {lineitem} through the 3-table model: each lineitem row appears once
    // in the outer-join row space — dividing by orders-per-customer would
    // undercount ~10x (the bug this test pins)
    val nLi = li.count().toDouble
    val estL = Ensemble.estCount(only, Set("lineitem"), Map.empty).value
    assert(qerr(estL, nLi) <= 1.5, s"est=$estL exact=$nLi")

    val star = ens("customer_orders_lineitem_part")
    val onlyStar = Map(star.name -> star)
    val p = schema.Tables(spark, sf, "part")
    val exactLp = li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(col("p_size") <= 25).count().toDouble
    val estLp = Ensemble.estCount(onlyStar, Set("lineitem", "part"),
      Map(("part", "p_size") -> NumRange(Double.NegativeInfinity, 25.0))).value
    assert(qerr(estLp, exactLp) <= 1.5, s"est=$estLp exact=$exactLp")
  }

  test("path-skipping query set gates the intermediate hops (customer⨝…⨝part)") {
    val star = ens("customer_orders_lineitem_part")
    val only = Map(star.name -> star)
    val o = schema.Tables(spark, sf, "orders")
    val c = schema.Tables(spark, sf, "customer")
    val p = schema.Tables(spark, sf, "part")
    // {customer, part} means the join THROUGH orders and lineitem — orphan
    // outer-join padding rows (childless customers/orders) must not count
    val exact = c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .count().toDouble
    val est = Ensemble.estCount(only, Set("customer", "part"), Map.empty).value
    assert(qerr(est, exact) <= 1.5, s"est=$est exact=$exact")
  }

  test("OR intersects mixed nominal/numeric ranges on the same column") {
    val mc = ens("lineitem").cols(ens("lineitem").colIdx("lineitem", "l_returnflag"))
    val codeA = mc.code("A")
    // branch A: flag in {A}; branch B: flag code <= codeA (numeric over codes)
    // → A∧B = {A}, so |A ∨ B| = |B| here; must not throw on the mixed types
    val est = Ensemble.estCountOr(ens, Set("lineitem"),
      Map(("lineitem", "l_returnflag") -> NominalSet(Array(codeA))),
      Map(("lineitem", "l_returnflag") -> NumRange(Double.NegativeInfinity, codeA))).value
    val exact = li.filter(col("l_returnflag") === "A").count().toDouble
    assert(qerr(est, exact) <= 1.5, s"est=$est exact=$exact")
  }

  test("orders-rooted star SPN answers a supplier join directly") {
    val star = ens("orders_lineitem_part_supplier")
    assert(star.tables == Set("orders", "lineitem", "part", "supplier"))
    val sup = schema.Tables(spark, sf, "supplier")
    val exact = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_acctbal") > 0).count().toDouble
    val est = Ensemble.estCount(ens, Set("lineitem", "supplier"),
      Map(("supplier", "s_acctbal") -> NumRange(0.0, Double.PositiveInfinity, loIncl = false))).value
    assert(qerr(est, exact) <= 1.5, s"est=$est exact=$exact")
  }

  test("factored falls back to dim independence when no join SPN covers the pair") {
    // hide every SPN containing supplier except its single-table model
    val noSupJoin = ens.filter { case (_, s) => !s.tables("supplier") || s.tables == Set("supplier") }
    assert(noSupJoin.contains("supplier"), "supplier single SPN must exist for the fallback")
    val sup = schema.Tables(spark, sf, "supplier")
    val exact = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_acctbal") > 0).count().toDouble
    val est = Ensemble.estCount(noSupJoin, Set("lineitem", "supplier"),
      Map(("supplier", "s_acctbal") -> NumRange(0.0, Double.PositiveInfinity, loIncl = false))).value
    assert(qerr(est, exact) <= 2.0, s"est=$est exact=$exact")
  }

  test("AVG CI stays ordered on a negative-valued aggregate") {
    val e = Ensemble.estAvg(ens, Set("customer"), ("customer", "c_acctbal"),
      Map(("customer", "c_acctbal") -> NumRange(Double.NegativeInfinity, 0.0)))
    assert(e.value < 0, s"expected a negative average, got ${e.value}")
    assert(e.ci95Lo <= e.value && e.value <= e.ci95Hi,
      s"inverted CI [${e.ci95Lo}, ${e.ci95Hi}] around ${e.value}")
  }

  test("M9: candidate ranking scores every edge, budget cut leaves required rels trained") {
    val cands = Ensemble.state(spark, sf).candidates
    assert(cands.length >= 4, s"expected >=4 join candidates, got ${cands.map(_.name)}")
    assert(cands.map(_.score) == cands.map(_.score).sorted.reverse, "not ranked desc")
    assert(cands.count(_.trained) >= Ensemble.joinBudget)
    val trained = cands.filter(_.trained).map(_.name).toSet
    assert(trained("orders_lineitem") && trained("customer_orders"),
      s"workload-required join SPNs missing from $trained")
  }

  test("A4: est_sum_product relative error <= 25% on revenue") {
    val d0 = LocalDate.parse("1996-01-01").toEpochDay.toDouble
    val d1 = LocalDate.parse("1998-01-01").toEpochDay.toDouble
    val est = Ensemble.estSumProduct(ens, Set("lineitem"),
      Seq(("lineitem", "l_extendedprice"), ("lineitem", "l_discount")),
      Map(("lineitem", "l_shipdate") -> NumRange(d0, d1, hiIncl = false))).value
    val exact = li.filter(
      col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .agg(sum(col("l_extendedprice") * col("l_discount"))).head().getDouble(0)
    val rel = math.abs(est - exact) / exact
    assert(rel <= 0.25, s"rel=$rel est=$est exact=$exact")
  }

  test("A8: 95% count CI covers the truth for most random single-column ranges") {
    // reference evaluation/confidence_interval_evaluation.py: empirical
    // coverage of the nominal interval. Structure-learning bias is not in
    // the CI (same as the reference), so we assert a tolerant 70% floor.
    val rng = new Random(7)
    val hits = (1 to 20).count { _ =>
      val lo = 1 + rng.nextInt(35)
      val hi = lo + 3 + rng.nextInt(12)
      val e = Ensemble.estCount(ens, Set("lineitem"),
        Map(("lineitem", "l_quantity") -> NumRange(lo.toDouble, hi.toDouble)))
      val exact = li.filter(col("l_quantity").between(lo, hi)).count().toDouble
      e.ci95Lo <= exact && exact <= e.ci95Hi
    }
    assert(hits >= 14, s"CI covered only $hits/20 random count queries")
  }

  test("per-group CI: group-by intervals stay ordered and cover most random groups") {
    // the group-by analog of the A8 coverage harness (reference group-by
    // AQP reports per-group bounds): random quantity filters, the
    // l_returnflag enumeration, empirical coverage of the per-group 95%
    // interval with the same tolerant 70% floor
    val rng = new Random(19)
    var total = 0
    var hits = 0
    (1 to 8).foreach { _ =>
      val lo = 1 + rng.nextInt(30)
      val hi = lo + 5 + rng.nextInt(15)
      val preds = Map(("lineitem", "l_quantity") -> NumRange(lo.toDouble, hi.toDouble))
      val exact = li.filter(col("l_quantity").between(lo, hi))
        .groupBy("l_returnflag").count().collect()
        .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
      Ensemble.estGroupByMulti(ens, Set("lineitem"),
          Seq(("lineitem", "l_returnflag")), preds).foreach { case (gs, e) =>
        assert(e.ci95Lo <= e.value && e.value <= e.ci95Hi,
          s"inverted per-group CI [${e.ci95Lo}, ${e.ci95Hi}] around ${e.value}")
        exact.get(gs.head).foreach { x =>
          total += 1
          if (e.ci95Lo <= x && x <= e.ci95Hi) hits += 1
        }
      }
    }
    assert(total >= 20, s"harness must see a real group population, got $total")
    assert(hits.toDouble / total >= 0.7, s"per-group CI covered only $hits/$total")
  }

  test("A6 over factored tables: group-by works on customer⨝orders⨝lineitem") {
    val o = schema.Tables(spark, sf, "orders")
    val c = schema.Tables(spark, sf, "customer")
    val exact = c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val est = Ensemble.estGroupByCount(ens, Set("customer", "orders", "lineitem"),
      ("customer", "c_mktsegment"), Map.empty).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (g, v) =>
      assert(qerr(v, exact(g)) <= 4.0, s"group $g est=$v exact=${exact(g)}")
    }
  }

  test("OR via inclusion-exclusion: overlapping and disjoint branches") {
    // overlapping ranges: quantity<20 OR quantity in [10,30]
    val estOverlap = Ensemble.estCountOr(ens, Set("lineitem"),
      Map(("lineitem", "l_quantity") -> NumRange(Double.NegativeInfinity, 20.0, hiIncl = false)),
      Map(("lineitem", "l_quantity") -> NumRange(10.0, 30.0))).value
    val exactOverlap = li.filter(col("l_quantity") < 20 || col("l_quantity").between(10, 30))
      .count().toDouble
    assert(qerr(estOverlap, exactOverlap) <= 1.5, s"est=$estOverlap exact=$exactOverlap")

    // disjoint branches across different columns (A∧B nonempty): flag=A OR qty>45
    val mc = ens("lineitem").cols(ens("lineitem").colIdx("lineitem", "l_returnflag"))
    val estCross = Ensemble.estCountOr(ens, Set("lineitem"),
      Map(("lineitem", "l_returnflag") -> NominalSet(Array(mc.code("A")))),
      Map(("lineitem", "l_quantity") -> NumRange(45.0, Double.PositiveInfinity, loIncl = false))).value
    val exactCross = li.filter(col("l_returnflag") === "A" || col("l_quantity") > 45)
      .count().toDouble
    assert(qerr(estCross, exactCross) <= 1.5, s"est=$estCross exact=$exactCross")

    // provably disjoint same-column ranges: qty<5 OR qty>45 → plain sum
    val estDisjoint = Ensemble.estCountOr(ens, Set("lineitem"),
      Map(("lineitem", "l_quantity") -> NumRange(Double.NegativeInfinity, 5.0, hiIncl = false)),
      Map(("lineitem", "l_quantity") -> NumRange(45.0, Double.PositiveInfinity, loIncl = false))).value
    val exactDisjoint = li.filter(col("l_quantity") < 5 || col("l_quantity") > 45).count().toDouble
    assert(qerr(estDisjoint, exactDisjoint) <= 1.5, s"est=$estDisjoint exact=$exactDisjoint")
  }

  test("expectation memo: factored group-by folds shared factors once across groups") {
    // force the factor algebra (same setup as the M10 test): each group's
    // estimate is base(orders⨝lineitem) × num(customer⨝orders)/den(orders);
    // base and den carry no group predicate, so one memo across the group
    // enumeration must fold them once, not once per group
    val noChain = ens.filter { case (_, s) => !Set("customer", "orders", "lineitem").subsetOf(s.tables) }
    val before = Ensemble.expectEvals.sum()
    val est = Ensemble.estGroupByCount(noChain, Set("customer", "orders", "lineitem"),
      ("customer", "c_mktsegment"), Map.empty)
    val grouped = Ensemble.expectEvals.sum() - before
    val g = est.length
    assert(g >= 3, s"degenerate fixture: only $g groups")
    assert(grouped <= 2L * g + 6, s"$grouped uncached folds for $g groups — memo not shared")

    // the same estimates as independent per-group calls (one memo each)
    // must re-fold the shared factors → strictly more uncached folds
    val mc = noChain("customer").cols(noChain("customer").colIdx("customer", "c_mktsegment"))
    val b2 = Ensemble.expectEvals.sum()
    val solo = est.map { case (gv, _) =>
      gv -> Ensemble.estCount(noChain, Set("customer", "orders", "lineitem"),
        Map(("customer", "c_mktsegment") -> NominalSet(Array(mc.code(gv))))).value
    }
    val soloFolds = Ensemble.expectEvals.sum() - b2
    assert(soloFolds > grouped, s"memo saved nothing: grouped=$grouped solo=$soloFolds")
    // and the memo must not change any value
    solo.foreach { case (gv, v) => assert(v == est.toMap.apply(gv), s"group $gv drifted") }
  }

  test("model-plane rollup and cube match exact grouping-set counts") {
    val est = Ensemble.estRollup(ens, Set("lineitem"),
      Seq(("lineitem", "l_returnflag"), ("lineitem", "l_linestatus")), Map.empty)
      .map { case (ks, e) => ks -> e.value }.toMap
    val exact = li.rollup("l_returnflag", "l_linestatus").count().collect()
      .map(r => Seq(Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2).toDouble)
      .toMap
    assert(est.keySet == exact.keySet,
      s"rollup keys: ${est.keySet.diff(exact.keySet)} vs ${exact.keySet.diff(est.keySet)}")
    exact.foreach { case (k, x) =>
      assert(qerr(est(k), x) <= 1.5, s"rollup group $k est=${est(k)} exact=$x")
    }

    val cubeEst = Ensemble.estCube(ens, Set("lineitem"),
      Seq(("lineitem", "l_returnflag"), ("lineitem", "l_linestatus")), Map.empty)
      .map { case (ks, e) => ks -> e.value }.toMap
    val cubeExact = li.cube("l_returnflag", "l_linestatus").count().collect()
      .map(r => Seq(Option(r.getString(0)), Option(r.getString(1))) -> r.getLong(2).toDouble)
      .toMap
    assert(cubeEst.keySet == cubeExact.keySet)
    cubeExact.foreach { case (k, x) =>
      assert(qerr(cubeEst(k), x) <= 1.5, s"cube group $k est=${cubeEst(k)} exact=$x")
    }

    // SQL grouping-set semantics: the () set always yields its grand-total
    // row, even over a zero-mass selection (Spark's rollup does the same)
    val empty = Ensemble.estRollup(ens, Set("lineitem"),
      Seq(("lineitem", "l_returnflag")),
      Map(("lineitem", "l_quantity") -> NumRange(1e9, 2e9)))
    assert(empty.map(_._1) == Seq(Seq(None)), s"expected only the grand total, got $empty")
    assert(empty.head._2.value == 0.0)
  }

  test("OR algebra: inclusion-exclusion bounds hold on random branch pairs") {
    val rng = new Random(99)
    (1 to 15).foreach { _ =>
      val qa = 1 + rng.nextInt(30)
      val qb = qa + rng.nextInt(20)
      val dLo = rng.nextDouble() * 0.08
      val pA = Map(("lineitem", "l_quantity") -> (NumRange(qa, qb): ColRange))
      val pB = Map(("lineitem", "l_discount") ->
        (NumRange(dLo, Double.PositiveInfinity, loIncl = false): ColRange))
      val cA = Ensemble.estCount(ens, Set("lineitem"), pA).value
      val cB = Ensemble.estCount(ens, Set("lineitem"), pB).value
      val cOr = Ensemble.estCountOr(ens, Set("lineitem"), pA, pB).value
      val eps = 1e-6 * (cA + cB + 1)
      assert(cOr <= cA + cB + eps, s"union exceeds sum: $cOr > $cA + $cB")
      assert(cOr >= math.max(cA, cB) - eps, s"union below max branch: $cOr < max($cA, $cB)")
    }
  }

  test("rollup levels are self-consistent: finer groups sum to their subtotal") {
    val rows = Ensemble.estRollup(ens, Set("lineitem"),
      Seq(("lineitem", "l_returnflag"), ("lineitem", "l_linestatus")), Map.empty)
    val grand = rows.collect { case (Seq(None, None), e) => e.value }.head
    val level1 = rows.collect { case (Seq(Some(_), None), e) => e.value }
    val level2 = rows.collect { case (Seq(Some(_), Some(_)), e) => e.value }
    // on a single-table SPN the enumerated masses are exact marginals, so
    // each level must sum to the grand total to fp precision
    assert(math.abs(level1.sum - grand) <= 1e-6 * grand,
      s"level-1 sum ${level1.sum} != grand $grand")
    assert(math.abs(level2.sum - grand) <= 1e-6 * grand,
      s"level-2 sum ${level2.sum} != grand $grand")
  }

  test("A8: avg CI is non-degenerate and covers the exact average") {
    val e = Ensemble.estAvg(ens, Set("lineitem"), ("lineitem", "l_extendedprice"),
      Map(("lineitem", "l_quantity") -> NumRange(Double.NegativeInfinity, 30.0)))
    val exact = li.filter(col("l_quantity") <= 30)
      .agg(avg("l_extendedprice")).head().getDouble(0)
    assert(e.ci95Hi > e.ci95Lo, "AVG CI is degenerate")
    assert(e.ci95Lo <= exact && exact <= e.ci95Hi,
      s"AVG CI [${e.ci95Lo}, ${e.ci95Hi}] misses $exact")
  }

  test("spn_explain: every chosen model covers its query's tables") {
    val rows = rspn.ModelQueries.ops.find(_.name == "spn_explain").get
      .fn(spark, sf).collect()
    assert(rows.length == 4, s"expected 4 explained shapes, got ${rows.length}")
    rows.foreach { r =>
      val tables = r.getString(1).split(",").toSet
      val chosen = r.getString(3)
      val factored = r.getBoolean(4)
      if (!factored) {
        val spn = ens(chosen)
        assert(tables.subsetOf(spn.tables),
          s"chosen model $chosen does not cover $tables")
      } else assert(chosen == "(factored)")
    }
    // with RDC-aware selection active a join model may legitimately win
    // even for a single-table query (its sample showed more dependence over
    // the predicate columns); with the knob off, the pick must degrade to
    // the minimal cover — the single-table model
    val old = sys.props.get("graft.rdcSelection")
    try {
      sys.props("graft.rdcSelection") = "false"
      val naive = rspn.ModelQueries.ops.find(_.name == "spn_explain").get
        .fn(spark, sf).collect().find(_.getString(0) == "single_lineitem").get
      assert(naive.getString(3) == "lineitem",
        s"minimal-cover pick must be the single-table model, got ${naive.getString(3)}")
    } finally old match {
      case Some(v) => sys.props("graft.rdcSelection") = v
      case None    => sys.props.remove("graft.rdcSelection")
    }
  }
}
