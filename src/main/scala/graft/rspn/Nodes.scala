package graft.rspn

import java.util.Arrays

/** Relational Sum-Product Network node ADT + the bottom-up expectation pass.
  *
  * Re-expression of the reference's model plane (public
  * DataManagementLab/deepdb-public: aqp_spn/aqp_leaves.py::Categorical /
  * IdentityNumericLeaf, aqp_spn/expectations.py::expectation). The tree is an
  * immutable driver-side value, broadcast to executors when batch scoring;
  * inference is a pure fold — no Spark dependency in this file.
  *
  * Semantics of `expect(ranges, exps)` = E[ ∏_c x_c^exps(c) · 1_ranges ] over
  * the modeled row distribution, where exps(c) ∈ {-1, 0, 1, 2} (the -1 case
  * is the reference's `inverted_features` fanout correction; 2 feeds the
  * CI variance). NULL handling follows the reference's outer-join encoding:
  * an unconstrained column contributes its full mass (incl. NULL); any range
  * or feature on a column excludes its NULL mass.
  */
sealed trait SpnNode {
  /** Scope: modeled column indices beneath this node. */
  def scope: Set[Int]
  /** Number of training rows this node absorbed (for updates/weights). */
  def n: Double
}

sealed trait ColRange
/** Categorical membership over dictionary codes. */
final case class NominalSet(codes: Array[Double]) extends ColRange
/** Numeric interval, optionally open on either side. */
final case class NumRange(lo: Double, hi: Double, loIncl: Boolean = true, hiIncl: Boolean = true)
    extends ColRange
/** IS NOT NULL (the reference's `*_nn` indicator predicate). */
case object NotNullRange extends ColRange

final case class SumNode(weights: Array[Double], children: Array[SpnNode], n: Double)
    extends SpnNode {
  val scope: Set[Int] = children.head.scope
}

final case class ProductNode(children: Array[SpnNode], n: Double) extends SpnNode {
  val scope: Set[Int] = children.iterator.flatMap(_.scope).toSet
}

/** Per-code probability table (reference Categorical leaf). `probs(code)`
  * excludes the NULL mass; `pNull` carries it.
  */
final case class CategoricalLeaf(colIdx: Int, probs: Array[Double], pNull: Double, n: Double)
    extends SpnNode {
  val scope: Set[Int] = Set(colIdx)
}

/** Sorted-unique-value histogram with prefix moments (reference
  * IdentityNumericLeaf: binary-searchable ranges, E[X]/E[X²] over a range in
  * O(log n), plus E[1/X] for fanout inversion).
  */
final case class NumericLeaf(
    colIdx: Int,
    vals: Array[Double],   // sorted unique non-null values
    probs: Array[Double],  // P(X = vals(i)), sums to 1 - pNull
    pNull: Double,
    n: Double)
    extends SpnNode {
  val scope: Set[Int] = Set(colIdx)

  // prefix sums: cum*(i) = Σ_{j<i} probs(j) * f(vals(j))
  val cumProb: Array[Double] = prefix(identity0 = 1.0)
  val cumX: Array[Double] = prefix(identity0 = 0.0, f = v => v)
  val cumX2: Array[Double] = prefix(identity0 = 0.0, f = v => v * v)
  val cumInv: Array[Double] =
    prefix(identity0 = 0.0, f = v => if (v == 0.0) 0.0 else 1.0 / v)
  val cumInv2: Array[Double] =
    prefix(identity0 = 0.0, f = v => if (v == 0.0) 0.0 else 1.0 / (v * v))

  private def prefix(identity0: Double, f: Double => Double = _ => 1.0): Array[Double] = {
    val out = new Array[Double](vals.length + 1)
    var i = 0
    while (i < vals.length) { out(i + 1) = out(i) + probs(i) * f(vals(i)); i += 1 }
    out
  }

  /** index of first value >= v (lower bound). */
  private def lower(v: Double): Int = {
    val i = Arrays.binarySearch(vals, v)
    if (i >= 0) i else -i - 1
  }
  /** index of first value > v (upper bound). */
  private def upper(v: Double): Int = {
    var i = Arrays.binarySearch(vals, v)
    if (i >= 0) { while (i < vals.length && vals(i) == v) i += 1; i }
    else -i - 1
  }

  /** Σ over vals in the range of probs(i)*f(vals(i)) using prefix array. */
  def rangeSum(r: ColRange, cum: Array[Double]): Double = r match {
    case NumRange(lo, hi, loIncl, hiIncl) =>
      val a = if (loIncl) lower(lo) else upper(lo)
      val b = if (hiIncl) upper(hi) else lower(hi)
      if (b <= a) 0.0 else cum(b) - cum(a)
    case NominalSet(codes) =>
      var s = 0.0
      codes.foreach { c =>
        val i = Arrays.binarySearch(vals, c)
        if (i >= 0) s += cum(i + 1) - cum(i)
      }
      s
    case NotNullRange => cum(vals.length)
  }
}

object Spn {

  /** E[ ∏ x^exps · 1_ranges ]. `ranges(c) == null` ⇒ unconstrained;
    * `exps(c) == 0` ⇒ no feature on c.
    */
  def expect(node: SpnNode, ranges: Array[ColRange], exps: Array[Int]): Double = node match {
    case SumNode(w, ch, _) =>
      var s = 0.0
      var i = 0
      while (i < ch.length) { s += w(i) * expect(ch(i), ranges, exps); i += 1 }
      s
    case ProductNode(ch, _) =>
      var p = 1.0
      var i = 0
      while (i < ch.length && p != 0.0) { p *= expect(ch(i), ranges, exps); i += 1 }
      p
    case l: CategoricalLeaf =>
      val r = ranges(l.colIdx)
      val e = exps(l.colIdx)
      require(e == 0, s"feature on categorical col ${l.colIdx}")
      r match {
        case null => 1.0
        case NominalSet(codes) =>
          var s = 0.0
          codes.foreach(c => if (c >= 0 && c < l.probs.length) s += l.probs(c.toInt))
          s
        case NotNullRange => 1.0 - l.pNull
        case NumRange(lo, hi, li, hi2) =>
          var s = 0.0
          var c = 0
          while (c < l.probs.length) {
            val in = (if (li) c >= lo else c > lo) && (if (hi2) c <= hi else c < hi)
            if (in) s += l.probs(c)
            c += 1
          }
          s
      }
    case l: NumericLeaf =>
      val r0 = ranges(l.colIdx)
      val e = exps(l.colIdx)
      if (e == 0 && r0 == null) 1.0
      else {
        val r = if (r0 == null) NotNullRange else r0
        e match {
          case 0  => l.rangeSum(r, l.cumProb)
          case 1  => l.rangeSum(r, l.cumX)
          case 2  => l.rangeSum(r, l.cumX2)
          case -1 => l.rangeSum(r, l.cumInv)
          case -2 => l.rangeSum(r, l.cumInv2)
          case _  => throw new IllegalArgumentException(s"exp $e")
        }
      }
  }

  /** P(ranges) — expectation with no features. */
  def prob(node: SpnNode, ranges: Array[ColRange]): Double =
    expect(node, ranges, new Array[Int](ranges.length))

  /** Point likelihood of one row (NaN = null), used to route updates. */
  def likelihood(node: SpnNode, row: Array[Double]): Double = node match {
    case SumNode(w, ch, _) =>
      var s = 0.0; var i = 0
      while (i < ch.length) { s += w(i) * likelihood(ch(i), row); i += 1 }
      s
    case ProductNode(ch, _) =>
      var p = 1.0; var i = 0
      while (i < ch.length && p != 0.0) { p *= likelihood(ch(i), row); i += 1 }
      p
    case l: CategoricalLeaf =>
      val v = row(l.colIdx)
      if (v.isNaN) l.pNull
      else if (v >= 0 && v < l.probs.length) l.probs(v.toInt)
      else 0.0
    case l: NumericLeaf =>
      val v = row(l.colIdx)
      if (v.isNaN) l.pNull
      else {
        val i = Arrays.binarySearch(l.vals, v)
        // smooth unseen values with a tiny mass so routing never zeroes out
        if (i >= 0) l.probs(i) else 1e-9
      }
  }

  def countNodes(node: SpnNode): (Int, Int) = node match {
    case SumNode(_, ch, _)     => ch.map(countNodes).reduce((a, b) => (a._1 + b._1, a._2 + b._2)) match { case (n, l) => (n + 1, l) }
    case ProductNode(ch, _)    => ch.map(countNodes).reduce((a, b) => (a._1 + b._1, a._2 + b._2)) match { case (n, l) => (n + 1, l) }
    case _                     => (1, 1)
  }
}
