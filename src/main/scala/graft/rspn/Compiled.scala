package graft.rspn

import scala.annotation.switch
import scala.collection.mutable.ArrayBuffer

/** Array-encoded inference tree — the Spark-side replacement for the
  * reference's generated-code inference (public DataManagementLab/
  * deepdb-public: aqp_spn/code_generation/generate_code.py, which emits and
  * compiles C++ per SPN for ~10× query latency). On the JVM the flattening
  * alone (no virtual dispatch, no pattern match, no recursion) roughly
  * matches the JIT-ed ADT fold, so the real speedup comes from query
  * sparsity: each node's *neutral* value (its expectation when none of its
  * columns are constrained) is precomputed, and for every column the sorted
  * list of node slots that depend on it (its leaves plus their ancestors) is
  * prebuilt. A query constraining k of the ~20 modeled columns then
  * evaluates only the union of those k slot lists — typically 10–20% of the
  * tree — and reads neutral values for the rest.
  *
  * Built once per trained tree (TrainedSpn.compiled, lazily) and reused for
  * every expectation; the persisted store format is unchanged — this is a
  * derived encoding, rebuilt on load, so stored models stay readable across
  * versions that change only the evaluator.
  *
  * `expect` is bit-identical to `Spn.expect`: same accumulation order for
  * sum/product nodes, same leaf code paths (the numeric leaves' prefix-sum
  * `rangeSum` is reused directly — already monomorphic and primitive), and
  * neutral values are produced by the same unskipped pass, so an untouched
  * subtree contributes exactly the number the fold would have computed (sum
  * weights need not add to exactly 1.0, so neutral is NOT just 1.0).
  */
final class CompiledSpn private (
    private val nodeType: Array[Byte], // 0 sum, 1 product, 2 categorical, 3 numeric
    private val childStart: Array[Int], // into childIdx/weights
    private val childEnd: Array[Int],
    private val childIdx: Array[Int],
    private val weights: Array[Double], // sum-edge weights, parallel to childIdx
    private val leafCol: Array[Int], // leaf column index, -1 for inner nodes
    private val payload: Array[Int], // index into catProbs/catPNull or numLeaf
    private val catProbs: Array[Array[Double]],
    private val catPNull: Array[Double],
    private val numLeaf: Array[NumericLeaf],
    private val affectedByCol: Array[Array[Int]], // per column: sorted slots to recompute
    private val nCols: Int) {

  def nodes: Int = nodeType.length

  private val neutral: Array[Double] = {
    val out = new Array[Double](nodeType.length)
    evalFull(out, new Array[ColRange](nCols), new Array[Int](nCols))
    out
  }

  /** Per-thread scratch: the expectation pass allocates nothing. `out` is
    * seeded from `neutral` per query (one arraycopy), so child reads need no
    * membership test — an unevaluated slot already holds its neutral value.
    */
  private final class Scratch {
    val out: Array[Double] = neutral.clone() // starts neutral-seeded
    private val cap = affectedByCol.iterator.map(_.length).sum.max(1)
    val gather = new Array[Int](cap)
    val gather2 = new Array[Int](cap)
    var dirty = 0 // slots of `gather` overwritten by the previous query
    var fullDirty = false // a dense fallback overwrote every slot
  }
  private val scratch = new ThreadLocal[Scratch] {
    override def initialValue(): Scratch = new Scratch
  }

  /** E[ ∏ x^exps · 1_ranges ]. */
  def expect(ranges: Array[ColRange], exps: Array[Int]): Double = {
    val s = scratch.get()
    // size the affected set first: if the constrained columns reach most of
    // the tree anyway (sum-heavy structure), the plain forward pass is
    // cheaper than merging slot lists
    var total = 0
    var c = 0
    while (c < nCols) {
      if (ranges(c) != null || exps(c) != 0) total += affectedByCol(c).length
      c += 1
    }
    if (total == 0) return neutral(nodeType.length - 1)
    if (total > (nodeType.length >> 1)) {
      // mark BEFORE evaluating: if evalFull throws mid-pass (e.g. a feature
      // on a categorical column), the next query must still re-seed
      s.fullDirty = true
      evalFull(s.out, ranges, exps)
      return s.out(nodeType.length - 1)
    }

    // restore only the slots the PREVIOUS sparse query overwrote — far
    // cheaper than re-seeding the whole vector from neutral
    if (s.fullDirty) {
      System.arraycopy(neutral, 0, s.out, 0, neutral.length)
      s.fullDirty = false
      s.dirty = 0
    }
    var g = 0
    while (g < s.dirty) {
      val i = s.gather(g)
      s.out(i) = neutral(i)
      g += 1
    }
    // merge the constrained columns' presorted slot lists (ascending =
    // children before parents in the post-order layout), deduping as we go
    var n = 0
    var first = true
    c = 0
    while (c < nCols) {
      if (ranges(c) != null || exps(c) != 0) {
        val slots = affectedByCol(c)
        if (first) {
          System.arraycopy(slots, 0, s.gather, 0, slots.length)
          n = slots.length
          first = false
        } else n = mergeDedup(s.gather, n, slots, s.gather2)
      }
      c += 1
    }
    // mark BEFORE evaluating: if a leaf throws mid-loop, gather[0,n) still
    // names every slot that may have been overwritten, so the next query's
    // restore pass covers them
    s.dirty = n
    g = 0
    while (g < n) {
      val i = s.gather(g)
      s.out(i) = evalSlot(i, s.out, ranges, exps)
      g += 1
    }
    // the root is an ancestor of every leaf, so it is always in the set
    s.out(nodeType.length - 1)
  }

  /** Merge sorted `a[0,na)` with sorted-distinct `b` into `tmp`, drop
    * duplicates, copy back into `a`; returns the merged length.
    */
  private def mergeDedup(a: Array[Int], na: Int, b: Array[Int], tmp: Array[Int]): Int = {
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < b.length) {
      val x = a(i)
      val y = b(j)
      if (x < y) { tmp(k) = x; i += 1 }
      else if (y < x) { tmp(k) = y; j += 1 }
      else { tmp(k) = x; i += 1; j += 1 }
      k += 1
    }
    while (i < na) { tmp(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { tmp(k) = b(j); j += 1; k += 1 }
    System.arraycopy(tmp, 0, a, 0, k)
    k
  }

  /** Unconditional forward pass over every slot (used when the affected set
    * is dense, and to build `neutral`).
    */
  private def evalFull(out: Array[Double], ranges: Array[ColRange], exps: Array[Int]): Unit = {
    var i = 0
    while (i < nodeType.length) {
      out(i) = evalSlot(i, out, ranges, exps)
      i += 1
    }
  }

  /** Evaluate one slot; children read from `out`, which either was fully
    * evaluated below `i` (full pass) or is neutral-seeded with affected
    * descendants already recomputed (sparse pass).
    */
  private def evalSlot(
      i: Int, out: Array[Double], ranges: Array[ColRange], exps: Array[Int]): Double = {
    (nodeType(i).toInt: @switch) match {
      case 0 => // sum: weighted accumulation in child order (matches the fold)
        var s = 0.0
        var j = childStart(i)
        val e = childEnd(i)
        while (j < e) { s += weights(j) * out(childIdx(j)); j += 1 }
        s
      case 1 => // product; 0 short-circuits exactly like the fold
        var p = 1.0
        var j = childStart(i)
        val e = childEnd(i)
        while (j < e && p != 0.0) { p *= out(childIdx(j)); j += 1 }
        p
      case 2 => // categorical leaf
        val cI = leafCol(i)
        require(exps(cI) == 0, s"feature on categorical col $cI")
        val probs = catProbs(payload(i))
        def catMass(r: ColRange): Double = r match {
          case NominalSet(codes) =>
            var s = 0.0
            var k = 0
            while (k < codes.length) {
              val cd = codes(k)
              if (cd >= 0 && cd < probs.length) s += probs(cd.toInt)
              k += 1
            }
            s
          case NotNullRange => 1.0 - catPNull(payload(i))
          case NumRange(lo, hi, li, hi2) =>
            var s = 0.0
            var cc = 0
            while (cc < probs.length) {
              val in = (if (li) cc >= lo else cc > lo) && (if (hi2) cc <= hi else cc < hi)
              if (in) s += probs(cc)
              cc += 1
            }
            s
          case MultiRange(is) => is.iterator.map(catMass).sum // disjoint
        }
        ranges(cI) match {
          case null => 1.0
          case r    => catMass(r)
        }
      case 3 => // numeric leaf: prefix-moment range sums
        val l = numLeaf(payload(i))
        val cI = leafCol(i)
        val r0 = ranges(cI)
        val ex = exps(cI)
        if (ex == 0 && r0 == null) 1.0
        else {
          val r = if (r0 == null) NotNullRange else r0
          ex match {
            case 0  => l.rangeSum(r, l.cumProb)
            case 1  => l.rangeSum(r, l.cumX)
            case 2  => l.rangeSum(r, l.cumX2)
            case -1 => l.rangeSum(r, l.cumInv)
            case -2 => l.rangeSum(r, l.cumInv2)
            case _  => throw new IllegalArgumentException(s"exp $ex")
          }
        }
    }
  }
}

object CompiledSpn {

  def apply(root: SpnNode): CompiledSpn = {
    val types = ArrayBuffer.empty[Byte]
    val cStart = ArrayBuffer.empty[Int]
    val cEnd = ArrayBuffer.empty[Int]
    val cIdx = ArrayBuffer.empty[Int]
    val ws = ArrayBuffer.empty[Double]
    val lCol = ArrayBuffer.empty[Int]
    val pay = ArrayBuffer.empty[Int]
    val catP = ArrayBuffer.empty[Array[Double]]
    val catN = ArrayBuffer.empty[Double]
    val numL = ArrayBuffer.empty[NumericLeaf]
    // per column: slots whose value depends on it (leaves + all ancestors)
    val affected = scala.collection.mutable.Map.empty[Int, ArrayBuffer[Int]]

    def emit(t: Byte, start: Int, end: Int, col: Int, p: Int): Int = {
      types += t; cStart += start; cEnd += end; lCol += col; pay += p
      types.length - 1
    }
    def mark(cols: Set[Int], slot: Int): Unit =
      cols.foreach(c => affected.getOrElseUpdate(c, ArrayBuffer.empty) += slot)

    // post-order: children get their slots (and the child-edge block is
    // reserved contiguously) before the parent is emitted
    def visit(n: SpnNode): Int = n match {
      case SumNode(w, ch, _) =>
        val ids = ch.map(visit)
        val start = cIdx.length
        var i = 0
        while (i < ids.length) { cIdx += ids(i); ws += w(i); i += 1 }
        val id = emit(0, start, cIdx.length, -1, -1)
        mark(n.scope, id)
        id
      case ProductNode(ch, _) =>
        val ids = ch.map(visit)
        val start = cIdx.length
        ids.foreach { cid => cIdx += cid; ws += Double.NaN }
        val id = emit(1, start, cIdx.length, -1, -1)
        mark(n.scope, id)
        id
      case l: CategoricalLeaf =>
        catP += l.probs; catN += l.pNull
        val id = emit(2, 0, 0, l.colIdx, catP.length - 1)
        mark(l.scope, id)
        id
      case l: NumericLeaf =>
        numL += l
        val id = emit(3, 0, 0, l.colIdx, numL.length - 1)
        mark(l.scope, id)
        id
    }
    visit(root)
    val nCols = root.scope.max + 1
    val byCol = Array.tabulate(nCols)(c => affected.get(c).map(_.toArray.sorted).getOrElse(Array.empty[Int]))

    new CompiledSpn(
      types.toArray, cStart.toArray, cEnd.toArray, cIdx.toArray, ws.toArray,
      lCol.toArray, pay.toArray, catP.toArray, catN.toArray, numL.toArray,
      byCol, nCols)
  }
}
