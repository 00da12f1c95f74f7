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
/** Union of DISJOINT, SORTED numeric intervals — the reference's
  * `aqp_spn/ranges.py::NumericRange` carries a LIST of [lo, hi] intervals
  * with inclusive flags, which is what lets numeric `!=`, `NOT IN`, and
  * cyclic calendar buckets (`month(d)`) compile as ONE predicate instead of
  * spending disjunction machinery. Leaves evaluate it as the sum of the
  * per-interval masses (exact, since the intervals are disjoint). Build via
  * [[ColRangeOps.union]]/[[ColRangeOps.normalize]] — constructors that
  * enforce the invariant. A Vector (not Array) so structural equality holds
  * for the expectation memo's cache key.
  */
final case class MultiRange(intervals: Vector[NumRange]) extends ColRange
/** IS NOT NULL (the reference's `*_nn` indicator predicate). */
case object NotNullRange extends ColRange

/** Interval algebra over [[ColRange]] — ONE implementation of
  * intersection/union/normalization shared by the predicate compilers
  * (plans.SpnCardinality.toPreds) and the estimator's conjunction logic
  * (Ensemble.intersect), so the two can never disagree on emptiness.
  */
object ColRangeOps {

  /** lo-bound ordering key: position first, open beats closed at equal lo. */
  private def loKey(r: NumRange): (Double, Int) = (r.lo, if (r.loIncl) 0 else 1)

  private def isEmpty(r: NumRange): Boolean =
    r.lo > r.hi || (r.lo == r.hi && !(r.loIncl && r.hiIncl))

  /** Two intervals overlap or touch COMPATIBLY (their union is one
    * interval): a.hi vs b.lo with inclusivity — (5, 10) and [10, 20] touch
    * (10 covered), (5, 10) and (10, 20) do NOT (10 excluded, the `!=` gap).
    */
  private def mergeable(a: NumRange, b: NumRange): Boolean =
    b.lo < a.hi || (b.lo == a.hi && (a.hiIncl || b.loIncl))

  /** Sorted-disjoint normalization of an interval list: drop empties, sort,
    * merge overlapping/compatibly-touching neighbors. None = provably empty.
    */
  def normalize(intervals: Seq[NumRange]): Option[ColRange] = {
    val live = intervals.filterNot(isEmpty).sortBy(loKey)
    if (live.isEmpty) return None
    val out = scala.collection.mutable.ArrayBuffer(live.head)
    live.tail.foreach { r =>
      val last = out.last
      if (mergeable(last, r)) {
        val (hi, hiIncl) =
          if (r.hi > last.hi) (r.hi, r.hiIncl)
          else if (r.hi < last.hi) (last.hi, last.hiIncl)
          else (last.hi, last.hiIncl || r.hiIncl)
        out(out.length - 1) = NumRange(last.lo, hi, last.loIncl, hiIncl)
      } else out += r
    }
    Some(if (out.length == 1) out.head else MultiRange(out.toVector))
  }

  private def intervalsOf(r: ColRange): Option[Seq[NumRange]] = r match {
    case n: NumRange      => Some(Seq(n))
    case MultiRange(is)   => Some(is)
    // a numeric point set is a union of degenerate closed intervals
    case NominalSet(cs)   => Some(cs.toSeq.map(v => NumRange(v, v)))
    case NotNullRange     => None
  }

  private def meetIntervals(a: NumRange, b: NumRange): NumRange = {
    val (lo, loI) =
      if (a.lo > b.lo) (a.lo, a.loIncl)
      else if (b.lo > a.lo) (b.lo, b.loIncl)
      else (a.lo, a.loIncl && b.loIncl)
    val (hi, hiI) =
      if (a.hi < b.hi) (a.hi, a.hiIncl)
      else if (b.hi < a.hi) (b.hi, b.hiIncl)
      else (a.hi, a.hiIncl && b.hiIncl)
    NumRange(lo, hi, loI, hiI)
  }

  /** Conjunction of two ranges on one column; None = PROVABLY EMPTY (zero
    * mass). Every ColRange shape pair is supported: NotNull is the identity
    * (any concrete range implies non-null), nominal×nominal intersects code
    * sets, and anything interval-like goes through pairwise interval meets.
    * Nominal sets survive as nominal sets (categorical leaves index probs
    * by code; numeric leaves treat them as exact point sets).
    */
  def meet(a: ColRange, b: ColRange): Option[ColRange] = (a, b) match {
    // an empty nominal set (a recorded contradiction) is disjoint with
    // everything — checked before the NotNull identity would keep it
    case (NominalSet(cs), _) if cs.isEmpty => None
    case (_, NominalSet(cs)) if cs.isEmpty => None
    case (NotNullRange, r) => Some(r)
    case (r, NotNullRange) => Some(r)
    case (NominalSet(c1), NominalSet(c2)) =>
      val s2 = c2.toSet
      val inter = c1.filter(s2.contains)
      if (inter.isEmpty) None else Some(NominalSet(inter))
    case (NominalSet(cs), other) => nominalMeet(cs, other)
    case (other, NominalSet(cs)) => nominalMeet(cs, other)
    case _ =>
      for {
        ia <- intervalsOf(a)
        ib <- intervalsOf(b)
        m <- normalize(for { x <- ia; y <- ib } yield meetIntervals(x, y))
      } yield m
  }

  private def nominalMeet(cs: Array[Double], r: ColRange): Option[ColRange] = {
    def in(v: Double, i: NumRange): Boolean =
      (if (i.loIncl) v >= i.lo else v > i.lo) && (if (i.hiIncl) v <= i.hi else v < i.hi)
    val is = intervalsOf(r).getOrElse(return Some(NominalSet(cs)))
    val kept = cs.filter(v => is.exists(in(v, _)))
    if (kept.isEmpty) None else Some(NominalSet(kept))
  }

  /** Complement of a finite numeric point set over the reals — the
    * multi-interval form of `x != v` / `x NOT IN (…)` (the reference's
    * `ranges.py::NumericRange` negation): open intervals between the
    * sorted points plus unbounded open rays at the ends. Carries no NULL
    * mass, matching SQL's unknown-on-NULL for both spellings. Shared by
    * the Catalyst atom compiler and the SQL-text plane so the two can
    * never disagree.
    */
  def pointComplement(points: Seq[Double]): ColRange = {
    val sorted = points.distinct.sorted
    val bounds =
      (Double.NegativeInfinity +: sorted).zip(sorted :+ Double.PositiveInfinity)
    normalize(bounds.map { case (lo, hi) =>
      NumRange(lo, hi, loIncl = false, hiIncl = false)
    }).getOrElse(NominalSet(Array.empty)) // unreachable: the rays are never empty
  }

  /** Disjunction of ranges on one column (the AnyOf atom / cyclic calendar
    * buckets). All-nominal unions stay nominal; any NotNull absorbs
    * everything (x IS NOT NULL ∨ anything-null-excluding = IS NOT NULL);
    * otherwise everything lowers to intervals and normalizes. None only on
    * empty input.
    */
  def union(rs: Seq[ColRange]): Option[ColRange] = {
    if (rs.isEmpty) return None
    if (rs.contains(NotNullRange)) return Some(NotNullRange)
    if (rs.forall(_.isInstanceOf[NominalSet]))
      return Some(NominalSet(
        rs.flatMap { case NominalSet(cs) => cs.toSeq; case _ => Nil }.distinct.toArray))
    normalize(rs.flatMap(intervalsOf(_).getOrElse(Nil)))
  }
}

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
    // intervals are disjoint by the ColRangeOps invariant, so the per-
    // interval masses sum exactly
    case MultiRange(is) =>
      var s = 0.0
      is.foreach(i => s += rangeSum(i, cum))
      s
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
      def mass(rr: ColRange): Double = rr match {
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
        case MultiRange(is) => is.iterator.map(mass).sum // disjoint intervals
      }
      r match {
        case null => 1.0
        case rr   => mass(rr)
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
