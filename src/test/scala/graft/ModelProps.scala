package graft

import graft.rspn._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests (SURVEY §5.3) over the model plane — no Spark session:
  * random small tables, random predicates, invariants that must hold for
  * ANY learned tree, not just the fixtures.
  *
  * Key invariant exploited throughout: sum-node weights are cluster row
  * fractions, so tree marginals over a single column are EXACT relative
  * frequencies of the training data (only cross-column correlation inside a
  * cluster is approximated). That makes single-column estimates a strict
  * ground-truth check, not a tolerance check.
  */
object ModelProps extends Properties("rspn") {

  private val kinds: Array[Learn.ColKind] =
    Array(Learn.CategoricalCol(5), Learn.NumericCol)

  private val genRow: Gen[Array[Double]] = for {
    c <- Gen.choose(0, 4)
    v <- Gen.choose(0, 50) // coarse grid → duplicates exercise tie handling
  } yield Array(c.toDouble, v.toDouble)

  private val genData: Gen[Array[Array[Double]]] =
    Gen.choose(50, 300).flatMap(n => Gen.listOfN(n, genRow).map(_.toArray))

  private def count(data: Array[Array[Double]], col: Int, lo: Double, hi: Double): Int =
    data.count(r => r(col) >= lo && r(col) <= hi)

  property("total mass is 1") = forAll(genData) { data =>
    val root = Learn.learn(data, kinds)
    math.abs(Spn.prob(root, Array(null, null)) - 1.0) < 1e-9
  }

  property("single-column numeric range estimate is exact") =
    forAll(genData, Gen.choose(0, 50), Gen.choose(0, 50)) { (data, a, b) =>
      val (lo, hi) = (math.min(a, b).toDouble, math.max(a, b).toDouble)
      val root = Learn.learn(data, kinds)
      val est = data.length * Spn.prob(root, Array(null, NumRange(lo, hi)))
      math.abs(est - count(data, 1, lo, hi)) < 1e-6 * data.length
    }

  property("categorical group probabilities sum to the non-null mass") =
    forAll(genData) { data =>
      val root = Learn.learn(data, kinds)
      val total = (0 until 5).map { c =>
        Spn.prob(root, Array(NominalSet(Array(c.toDouble)), null))
      }.sum
      math.abs(total - 1.0) < 1e-9 // generator emits no nulls
    }

  property("range additivity: P([a,m)) + P([m,b]) == P([a,b])") =
    forAll(genData, Gen.choose(0, 50), Gen.choose(0, 50), Gen.choose(0, 50)) { (data, x, y, z) =>
      val s = Seq(x, y, z).sorted.map(_.toDouble)
      val (a, m, b) = (s(0), s(1), s(2))
      val root = Learn.learn(data, kinds)
      val left = Spn.prob(root, Array(null, NumRange(a, m, loIncl = true, hiIncl = false)))
      val right = Spn.prob(root, Array(null, NumRange(m, b)))
      val whole = Spn.prob(root, Array(null, NumRange(a, b)))
      math.abs(left + right - whole) < 1e-9
    }

  property("insertBatch preserves normalization and tracks the merged data exactly") =
    forAll(genData, genData, Gen.choose(0, 50), Gen.choose(0, 50)) { (d1, d2, a, b) =>
      val (lo, hi) = (math.min(a, b).toDouble, math.max(a, b).toDouble)
      val root0 = Learn.learn(d1, kinds)
      val root1 = Update.insertBatch(root0, d2)
      val n = d1.length + d2.length
      val massOk = math.abs(Spn.prob(root1, Array(null, null)) - 1.0) < 1e-9
      val nOk = math.abs(root1.n - n) < 1e-9
      val est = n * Spn.prob(root1, Array(null, NumRange(lo, hi)))
      val exact = count(d1, 1, lo, hi) + count(d2, 1, lo, hi)
      massOk && nOk && math.abs(est - exact) < 1e-6 * n
    }

  property("deleteBatch keeps the tree a normalized density and decrements the ledger") =
    forAll(genData, genData) { (d1, d2) =>
      val root0 = Learn.learn(d1, kinds)
      val root1 = Update.insertBatch(root0, d2)
      val root2 = Update.deleteBatch(root1, d2)
      val massOk = math.abs(Spn.prob(root2, Array(null, null)) - 1.0) < 1e-9
      val nOk = math.abs(root2.n - d1.length) < 1e-9
      val p = Spn.prob(root2, Array(null, NumRange(0.0, 25.0)))
      massOk && nOk && p >= 0.0 && p <= 1.0 + 1e-9
    }

  property("well-separated cluster deletion removes exactly that cluster's mass") =
    forAll(Gen.choose(20, 100), Gen.choose(20, 100)) { (nA, nB) =>
      // two modes far apart in BOTH columns: routing is unambiguous, so the
      // tolerance can be exact-grade even though delete routing is
      // max-likelihood, not a ledger of the original cluster assignment
      val dA = Array.tabulate(nA)(i => Array(0.0, (i % 10).toDouble))
      val dB = Array.tabulate(nB)(i => Array(1.0, 500.0 + (i % 10).toDouble))
      val root = Learn.learn(dA ++ dB, kinds)
      val after = Update.deleteBatch(root, dB)
      val estB = after.n * Spn.prob(after, Array(null, NumRange(400.0, 600.0)))
      val estA = after.n * Spn.prob(after, Array(null, NumRange(0.0, 10.0)))
      estB < 1e-6 * (nA + nB) && math.abs(estA - nA) < 1e-6 * (nA + nB)
    }

  property("deleting every training row still leaves a valid (uniform-fallback) tree") =
    forAll(genData) { data =>
      val root = Learn.learn(data, kinds)
      val empty = Update.deleteBatch(root, data)
      math.abs(Spn.prob(empty, Array(null, null)) - 1.0) < 1e-9 && empty.n >= 1.0
    }

  property("delete-all on an all-null numeric column stays a normalized (all-null) leaf") =
    forAll(Gen.choose(10, 60)) { nRows =>
      // a leaf trained with zero value bins (every value NaN) has no
      // uniform fallback to reach for — after deleting everything it must
      // remain the all-null density, not a zero-mass one
      val data = Array.tabulate(nRows)(i => Array((i % 5).toDouble, Double.NaN))
      val root = Learn.learn(data, kinds)
      val empty = Update.deleteBatch(root, data)
      math.abs(Spn.prob(empty, Array(null, null)) - 1.0) < 1e-9
    }

  /** Structural invariants every node of a maintained tree must satisfy:
    * n ≥ 1 (the Update clamp floor), sum-node weights a normalized
    * non-negative distribution, every leaf a normalized non-negative
    * density (value bins + null mass).
    */
  private def nodeInvariants(node: SpnNode): Boolean = node match {
    case SumNode(w, ch, n) =>
      n >= 1.0 - 1e-9 && w.forall(_ >= -1e-12) &&
        math.abs(w.sum - 1.0) < 1e-6 && ch.forall(nodeInvariants)
    case ProductNode(ch, n) =>
      n >= 1.0 - 1e-9 && ch.forall(nodeInvariants)
    case l: CategoricalLeaf =>
      l.n >= 1.0 - 1e-9 && l.probs.forall(_ >= -1e-12) && l.pNull >= -1e-12 &&
        math.abs(l.probs.sum + l.pNull - 1.0) < 1e-6
    case l: NumericLeaf =>
      l.n >= 1.0 - 1e-9 && l.probs.forall(_ >= -1e-12) && l.pNull >= -1e-12 &&
        math.abs(l.probs.sum + l.pNull - 1.0) < 1e-6
  }

  private val genOp: Gen[(Boolean, Array[Array[Double]])] = for {
    ins <- Gen.oneOf(true, false)
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, genRow)
  } yield (ins, rows.toArray)

  property("random insert/delete interleavings keep every node normalized with n ≥ 1") =
    forAll(genData, Gen.choose(1, 8).flatMap(Gen.listOfN(_, genOp))) { (d0, ops) =>
      // deletes include rows the tree never absorbed — exactly the clamp
      // paths (counts at 0, n at 1, uniform/all-null fallbacks) under test
      var t: SpnNode = Learn.learn(d0, kinds)
      ops.forall { case (ins, b) =>
        t = if (ins) Update.insertBatch(t, b) else Update.deleteBatch(t, b)
        nodeInvariants(t) && math.abs(Spn.prob(t, Array(null, null)) - 1.0) < 1e-9
      }
    }

  property("delete-all on an all-null categorical column stays the all-null density") =
    forAll(Gen.choose(10, 60)) { nRows =>
      // the categorical mirror of the numeric all-null branch: a leaf
      // trained entirely on nulls must stay pNull = 1 when emptied, never
      // flip to a uniform value density it has no evidence for
      val data = Array.tabulate(nRows)(i => Array(Double.NaN, (i % 7).toDouble))
      val root = Learn.learn(data, kinds)
      val empty = Update.deleteBatch(root, data)
      val catNull = Spn.prob(empty, Array(NominalSet((0 until 5).map(_.toDouble).toArray), null))
      math.abs(Spn.prob(empty, Array(null, null)) - 1.0) < 1e-9 && catNull < 1e-9
    }

  property("group enumeration support equals the data's support") =
    forAll(genData) { data =>
      val root = Learn.learn(data, kinds)
      val support = (0 until 5).filter { c =>
        Spn.prob(root, Array(NominalSet(Array(c.toDouble)), null)) > 0
      }.toSet
      val exact = data.map(_(0).toInt).toSet
      support == exact
    }
}
