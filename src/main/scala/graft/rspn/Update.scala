package graft.rspn

import scala.collection.mutable.ArrayBuffer

/** Incremental model update (reference: aqp_spn/aqp_spn.py::
  * AQPSPN.learn_incremental — new tuples are routed down the tree, leaf
  * histograms and sum-node weights updated, no structural relearn).
  *
  * Batched copy-on-write: a whole delta is routed down the tree in one pass
  * (rows partitioned at each sum node by max-likelihood child against the
  * pre-update tree) and every touched node is rebuilt exactly once —
  * O(rows × depth + tree) per batch instead of the O(rows × tree)
  * row-at-a-time rebuild. Readers keep consistent snapshots — the
  * Structured Streaming `foreachBatch` updater swaps an immutable reference
  * per micro-batch.
  */
object Update {

  def insert(node: SpnNode, row: Array[Double]): SpnNode =
    insertBatch(node, Array(row))

  def insertAll(node: SpnNode, rows: Iterator[Array[Double]]): SpnNode =
    insertBatch(node, rows.toArray)

  def insertBatch(node: SpnNode, rows: Array[Array[Double]]): SpnNode =
    if (rows.isEmpty) node
    else node match {
      case SumNode(w, ch, n) =>
        // route each row to its max-likelihood child (the reference routes
        // via cluster centers; likelihood routing generalizes to any depth)
        val buckets = Array.fill(ch.length)(new ArrayBuffer[Array[Double]])
        rows.foreach { row =>
          var best = 0
          var bestL = -1.0
          var i = 0
          while (i < ch.length) {
            val l = w(i) * Spn.likelihood(ch(i), row)
            if (l > bestL) { bestL = l; best = i }
            i += 1
          }
          buckets(best) += row
        }
        val n1 = n + rows.length
        val counts = w.map(_ * n)
        val newCh = new Array[SpnNode](ch.length)
        var i = 0
        while (i < ch.length) {
          counts(i) += buckets(i).length
          newCh(i) = insertBatch(ch(i), buckets(i).toArray)
          i += 1
        }
        SumNode(counts.map(_ / n1), newCh, n1)

      case ProductNode(ch, n) =>
        ProductNode(ch.map(c => insertBatch(c, rows)), n + rows.length)

      case l: CategoricalLeaf =>
        val counts = l.probs.map(_ * l.n)
        var nullC = l.pNull * l.n
        rows.foreach { row =>
          val v = row(l.colIdx)
          if (v.isNaN) nullC += 1
          else if (v >= 0 && v < counts.length) counts(v.toInt) += 1
        }
        val n1 = l.n + rows.length
        CategoricalLeaf(l.colIdx, counts.map(_ / n1), nullC / n1, n1)

      case l: NumericLeaf =>
        var nulls = 0
        val fresh = new ArrayBuffer[Double](rows.length)
        rows.foreach { row =>
          val v = row(l.colIdx)
          if (v.isNaN) nulls += 1 else fresh += v
        }
        val sortedNew = fresh.toArray
        java.util.Arrays.sort(sortedNew)
        val n1 = l.n + rows.length
        val mVals = new ArrayBuffer[Double](l.vals.length + sortedNew.length)
        val mCounts = new ArrayBuffer[Double](l.vals.length + sortedNew.length)
        var i = 0
        var j = 0
        while (i < l.vals.length || j < sortedNew.length) {
          if (j >= sortedNew.length || (i < l.vals.length && l.vals(i) < sortedNew(j))) {
            mVals += l.vals(i); mCounts += l.probs(i) * l.n; i += 1
          } else {
            val v = sortedNew(j)
            var c = 0.0
            while (j < sortedNew.length && sortedNew(j) == v) { c += 1; j += 1 }
            if (i < l.vals.length && l.vals(i) == v) { c += l.probs(i) * l.n; i += 1 }
            mVals += v; mCounts += c
          }
        }
        NumericLeaf(l.colIdx, mVals.toArray, mCounts.map(_ / n1).toArray,
          (l.pNull * l.n + nulls) / n1, n1)
    }

  /** Batched tuple DELETION — the other half of incremental maintenance
    * (the CDC / retention / GDPR path: the reference's learn_incremental
    * covers inserts; a warehouse model must also forget). Rows route down
    * the PRE-delete tree by the same max-likelihood rule as inserts: the
    * child that most plausibly generated a tuple is the one whose
    * statistics it inflated, so that is where its mass comes back out.
    * Every touched node is rebuilt copy-on-write exactly once per batch.
    *
    * Deletion is best-effort mass removal, not a ledger: deleting a tuple
    * the model never absorbed clamps the affected counts at zero instead
    * of going negative, and weights renormalize over the clamped counts —
    * the tree stays a valid (normalized, non-negative) density estimate
    * under any delete stream. insert-then-delete of the same batch is a
    * near-identity (spec-asserted within tolerance), not bit-exact: the
    * two passes route against different tree states.
    */
  def deleteBatch(node: SpnNode, rows: Array[Array[Double]]): SpnNode =
    if (rows.isEmpty) node
    else node match {
      case SumNode(w, ch, n) =>
        val buckets = Array.fill(ch.length)(new ArrayBuffer[Array[Double]])
        rows.foreach { row =>
          var best = 0
          var bestL = -1.0
          var i = 0
          while (i < ch.length) {
            val l = w(i) * Spn.likelihood(ch(i), row)
            if (l > bestL) { bestL = l; best = i }
            i += 1
          }
          buckets(best) += row
        }
        val counts = w.map(_ * n)
        val newCh = new Array[SpnNode](ch.length)
        var i = 0
        while (i < ch.length) {
          counts(i) = math.max(counts(i) - buckets(i).length, 0.0)
          newCh(i) = deleteBatch(ch(i), buckets(i).toArray)
          i += 1
        }
        val total = counts.sum
        val n1 = math.max(n - rows.length, 1.0)
        // all mass clamped away → fall back to uniform weights (the node
        // models no remaining rows; any normalized weighting is equally
        // uninformative and uniform keeps downstream math finite)
        val w1 =
          if (total > 0) counts.map(_ / total)
          else Array.fill(ch.length)(1.0 / ch.length)
        SumNode(w1, newCh, n1)

      case ProductNode(ch, n) =>
        ProductNode(ch.map(c => deleteBatch(c, rows)), math.max(n - rows.length, 1.0))

      case l: CategoricalLeaf =>
        val counts = l.probs.map(_ * l.n)
        var nullC = l.pNull * l.n
        rows.foreach { row =>
          val v = row(l.colIdx)
          if (v.isNaN) nullC = math.max(nullC - 1, 0.0)
          else if (v >= 0 && v < counts.length)
            counts(v.toInt) = math.max(counts(v.toInt) - 1, 0.0)
        }
        // renormalize over the REMAINING mass, not n1: a clamped or
        // unmatched delete removed less than one row of mass, and dividing
        // by the row-count delta would silently denormalize the histogram
        val total = counts.sum + nullC
        val n1 = math.max(l.n - rows.length, 1.0)
        if (total > 0)
          CategoricalLeaf(l.colIdx, counts.map(_ / total), nullC / total, n1)
        else if (l.probs.sum > 0)
          CategoricalLeaf(l.colIdx,
            Array.fill(counts.length)(1.0 / counts.length), 0.0, n1)
        else
          // mirror the NumericLeaf all-null branch: a leaf trained entirely
          // on nulls has no value bins to fall back on uniformly — the only
          // normalized density an emptied one can express is all-null
          CategoricalLeaf(l.colIdx, Array.fill(counts.length)(0.0), 1.0, n1)

      case l: NumericLeaf =>
        val counts = l.probs.map(_ * l.n)
        var nullC = l.pNull * l.n
        rows.foreach { row =>
          val v = row(l.colIdx)
          if (v.isNaN) nullC = math.max(nullC - 1, 0.0)
          else {
            // histogram support never shrinks on delete (a zero-count bin
            // is harmless); only matching bins give mass back
            val idx = java.util.Arrays.binarySearch(l.vals, v)
            if (idx >= 0) counts(idx) = math.max(counts(idx) - 1, 0.0)
          }
        }
        val total = counts.sum + nullC
        val n1 = math.max(l.n - rows.length, 1.0)
        if (total > 0)
          NumericLeaf(l.colIdx, l.vals, counts.map(_ / total), nullC / total, n1)
        else if (counts.nonEmpty)
          NumericLeaf(l.colIdx, l.vals,
            Array.fill(counts.length)(1.0 / counts.length), 0.0, n1)
        else
          // a leaf trained on an all-null column has NO value bins to fall
          // back on uniformly — the only normalized density it can express
          // is all-null, so that is what an emptied one stays
          NumericLeaf(l.colIdx, l.vals, counts, 1.0, n1)
    }
}
