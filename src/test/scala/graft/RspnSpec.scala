package graft.rspn

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Unit tests of the RSPN core — leaf math against brute force, expectation
  * pass on hand-built trees, structure learning sanity, incremental updates.
  * No Spark needed (SURVEY §5.2).
  */
class RspnSpec extends AnyFunSuite {

  private def numericLeaf(values: Array[Double], col: Int = 0): NumericLeaf = {
    val sorted = values.sorted
    val uniq = sorted.distinct
    val probs = uniq.map(v => sorted.count(_ == v).toDouble / values.length)
    NumericLeaf(col, uniq, probs, 0.0, values.length.toDouble)
  }

  test("numeric leaf range probability and moments match brute force") {
    val rng = new Random(7)
    val data = Array.fill(500)(rng.nextInt(50).toDouble)
    val leaf = numericLeaf(data)
    val r = NumRange(10.0, 30.0, loIncl = true, hiIncl = false)
    val in = data.filter(v => v >= 10 && v < 30)
    val n = data.length.toDouble
    assert(math.abs(Spn.expect(leaf, Array(r), Array(0)) - in.length / n) < 1e-12)
    assert(math.abs(Spn.expect(leaf, Array(r), Array(1)) - in.sum / n) < 1e-9)
    assert(math.abs(Spn.expect(leaf, Array(r), Array(2)) - in.map(v => v * v).sum / n) < 1e-9)
    val inv = data.filter(v => v >= 1 && v <= 50)
    assert(math.abs(
      Spn.expect(leaf, Array(NumRange(1, 50)), Array(-1)) - inv.map(1.0 / _).sum / n) < 1e-9)
  }

  test("open/closed range bounds are exact on ties") {
    val leaf = numericLeaf(Array(1, 2, 2, 3, 3, 3).map(_.toDouble))
    def p(lo: Double, hi: Double, li: Boolean, hi2: Boolean) =
      Spn.expect(leaf, Array(NumRange(lo, hi, li, hi2)), Array(0))
    assert(math.abs(p(2, 3, true, true) - 5.0 / 6) < 1e-12)
    assert(math.abs(p(2, 3, false, true) - 3.0 / 6) < 1e-12)
    assert(math.abs(p(2, 3, true, false) - 2.0 / 6) < 1e-12)
    assert(math.abs(p(2, 3, false, false) - 0.0) < 1e-12)
  }

  test("hand-built sum/product tree evaluates weighted factorized expectation") {
    // two independent cols within each cluster; two clusters 60/40
    val c1 = ProductNode(Array(
      numericLeaf(Array(1.0, 1.0, 2.0, 2.0), col = 0),
      CategoricalLeaf(1, Array(0.5, 0.5), 0.0, 4)), 4)
    val c2 = ProductNode(Array(
      numericLeaf(Array(10.0, 10.0, 20.0, 20.0), col = 0),
      CategoricalLeaf(1, Array(1.0, 0.0), 0.0, 4)), 4)
    val root = SumNode(Array(0.6, 0.4), Array(c1, c2), 8)
    // P(col0 <= 5) = 0.6*1 + 0.4*0 = 0.6
    assert(math.abs(Spn.prob(root, Array(NumRange(0, 5), null)) - 0.6) < 1e-12)
    // E[col0 | cat=0] mass: 0.6*(1.5)*(0.5) + 0.4*(15)*(1.0)
    val e = Spn.expect(root, Array[ColRange](null, NominalSet(Array(0.0))), Array(1, 0))
    assert(math.abs(e - (0.6 * 1.5 * 0.5 + 0.4 * 15.0 * 1.0)) < 1e-12)
  }

  test("learned spn approximates marginal and conditional counts") {
    val rng = new Random(42)
    // two row clusters with correlated columns
    val data = Array.tabulate(4000) { i =>
      if (i % 2 == 0) Array(rng.nextGaussian() + 10, 0.0, rng.nextInt(3).toDouble)
      else Array(rng.nextGaussian() + 30, 1.0, rng.nextInt(3).toDouble)
    }
    val kinds: Array[Learn.ColKind] =
      Array(Learn.NumericCol, Learn.CategoricalCol(2), Learn.CategoricalCol(3))
    val root = Learn.learn(data, kinds)
    val n = data.length.toDouble
    val exact = data.count(r => r(0) < 20 && r(1) == 0.0) / n
    val est = Spn.prob(root, Array(NumRange(Double.NegativeInfinity, 20, hiIncl = false),
      NominalSet(Array(0.0)), null))
    assert(math.abs(est - exact) < 0.05, s"est=$est exact=$exact")
    // total mass conserved
    assert(math.abs(Spn.prob(root, Array(null, null, null)) - 1.0) < 1e-9)
  }

  test("incremental insert keeps mass normalized and tracks new values") {
    val base = Array.tabulate(100)(i => Array((i % 10).toDouble))
    val root0 = Learn.learn(base, Array[Learn.ColKind](Learn.NumericCol))
    val root1 = Update.insertAll(root0, Iterator.fill(100)(Array(99.0)))
    assert(math.abs(Spn.prob(root1, Array(null)) - 1.0) < 1e-9)
    val pNew = Spn.prob(root1, Array(NumRange(99.0, 99.0)))
    assert(math.abs(pNew - 0.5) < 0.05, s"pNew=$pNew")
    // old estimate roughly halves
    val pOld = Spn.prob(root1, Array(NumRange(0.0, 9.0)))
    assert(math.abs(pOld - 0.5) < 0.05, s"pOld=$pOld")
  }

  test("rdc separates dependent from independent columns") {
    val rng = new Random(1)
    val data = Array.fill(2000) {
      val x = rng.nextGaussian()
      Array(x, x * 2 + rng.nextGaussian() * 0.01, rng.nextGaussian())
    }
    val m = Learn.rdcMatrix(data, Array(0, 1, 2)).map { case (i, j, r) => ((i, j), r) }.toMap
    assert(m((0, 1)) > 0.8, s"dependent pair rdc=${m((0, 1))}")
    assert(m((0, 2)) < 0.4, s"independent pair rdc=${m((0, 2))}")
  }

  test("RDC variant selection: the model capturing the predicate dependency wins") {
    // two models over the SAME table and columns: one trained on the real
    // (x, y) pairing (y tracks x), one on a pairing-destroying shuffle of y
    // (same marginals, no dependence). The naive minimal-cover tie-break
    // picks by name — rigged here so it takes the bad one — while the
    // RDC-aware selection must take the model whose sample captures the
    // dependency, and that choice must be measurably more accurate.
    val rng = new Random(7)
    val n = 4000
    val xs = Array.fill(n)(rng.nextInt(50).toDouble)
    val yJoint = xs.map(x => x + rng.nextGaussian() * 0.5)
    val yIndep = rng.shuffle(yJoint.toSeq).toArray
    def mk(name: String, ys: Array[Double]): Ensemble.TrainedSpn = {
      val data = Array.tabulate(n)(i => Array(xs(i), ys(i)))
      Ensemble.TrainedSpn(name, Set("t"),
        Array(Ensemble.ModelCol("t", "x", Learn.NumericCol),
          Ensemble.ModelCol("t", "y", Learn.NumericCol)),
        Learn.learn(data, Array[Learn.ColKind](Learn.NumericCol, Learn.NumericCol)),
        n.toDouble, n.toLong,
        rdcPairs = Learn.rdcMatrix(data, Array(0, 1))
          .map { case (i, j, r) => (i, j) -> r }.toMap)
    }
    val bad = mk("a_indep", yIndep) // alphabetically first: the naive pick
    val good = mk("b_joint", yJoint)
    val spns = Map(bad.name -> bad, good.name -> good)
    val predCols = Set(("t", "x"), ("t", "y"))
    assert(Ensemble.selectOpt(spns, Set("t")).get.name == "a_indep",
      "test premise: the naive tie-break must pick the dependence-blind model")
    assert(Ensemble.selectFor(spns, Set("t"), predCols).get.name == "b_joint")
    assert(Ensemble.rdcScore(good, predCols) > Ensemble.rdcScore(bad, predCols) + 0.3)
    // the knob (default on) reverts selection to the pure minimal-cover pick
    assert(Knobs.rdcSelection)
    sys.props("graft.rdcSelection") = "false"
    try assert(Ensemble.selectFor(spns, Set("t"), predCols).get.name == "a_indep")
    finally sys.props.remove("graft.rdcSelection")
    // --max_variants = 1: only the naive-order head is scored, so the
    // dependence-blind model wins again (the cap bounds scoring work)
    sys.props("graft.maxVariants") = "1"
    try assert(Ensemble.selectFor(spns, Set("t"), predCols).get.name == "a_indep")
    finally sys.props.remove("graft.maxVariants")
    // a degenerate cap still selects (the Knobs doc promises the cap only
    // bounds scoring work, never whether selection succeeds)
    sys.props("graft.maxVariants") = "0"
    try assert(Ensemble.selectFor(spns, Set("t"), predCols).get.name == "a_indep")
    finally sys.props.remove("graft.maxVariants")

    // a correlated two-column predicate: under the true pairing the y range
    // is implied by the x range, under independence it multiplies away
    val preds = Map(
      ("t", "x") -> (NumRange(10.0, 20.0): ColRange),
      ("t", "y") -> (NumRange(9.0, 21.0): ColRange))
    val truth = (0 until n).count(i =>
      xs(i) >= 10 && xs(i) <= 20 && yJoint(i) >= 9 && yJoint(i) <= 21).toDouble
    def qe(e: Double) = math.max(e / truth, truth / e)
    val ranges: Array[ColRange] = Array(NumRange(10.0, 20.0), NumRange(9.0, 21.0))
    val estGood = n * Spn.prob(good.root, ranges)
    val estBad = n * Spn.prob(bad.root, ranges)
    assert(qe(estGood) * 2 < qe(estBad),
      s"joint model $estGood vs independent $estBad, truth $truth")
    // the public estimator inherits the good pick through selectFor
    val routed = Ensemble.estCount(spns, Set("t"), preds)
    assert(qe(routed.value) <= qe(estGood) + 1e-9,
      s"routed ${routed.value} must match the RDC-selected model's $estGood")
  }

  test("training knobs read overrides at use time and fall back to defaults") {
    assert(Knobs.sampleCap == 60000)
    assert(Knobs.joinBudget == 3)
    assert(Knobs.rdcThreshold == 0.3)
    sys.props("graft.sampleCap") = "1234"
    sys.props("graft.rdcThreshold") = "0.55"
    try {
      assert(Knobs.sampleCap == 1234)
      assert(Ensemble.sampleCap == 1234, "Ensemble must re-read, not cache at class load")
      assert(Learn.Config().rdcThreshold == 0.55, "Config defaults must pick up the knob")
    } finally {
      sys.props.remove("graft.sampleCap")
      sys.props.remove("graft.rdcThreshold")
    }
    assert(Knobs.sampleCap == 60000)
  }
}
