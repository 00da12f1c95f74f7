package graft.rspn

import java.util.Arrays

/** Incremental model update (reference: aqp_spn/aqp_spn.py::
  * AQPSPN.learn_incremental — new tuples are routed down the tree, leaf
  * histograms and sum-node weights updated, no structural relearn).
  *
  * Copy-on-write: every insert returns a new tree; readers keep consistent
  * snapshots — the Structured Streaming `foreachBatch` updater swaps an
  * immutable reference per micro-batch.
  */
object Update {

  def insert(node: SpnNode, row: Array[Double]): SpnNode = node match {
    case SumNode(w, ch, n) =>
      // route to the max-likelihood child (the reference routes via cluster
      // centers; likelihood routing generalizes it to any depth)
      var best = 0
      var bestL = -1.0
      var i = 0
      while (i < ch.length) {
        val l = w(i) * Spn.likelihood(ch(i), row)
        if (l > bestL) { bestL = l; best = i }
        i += 1
      }
      val counts = w.map(_ * n)
      counts(best) += 1
      val newCh = ch.clone()
      newCh(best) = insert(ch(best), row)
      SumNode(counts.map(_ / (n + 1)), newCh, n + 1)

    case ProductNode(ch, n) =>
      ProductNode(ch.map(c => insert(c, row)), n + 1)

    case l: CategoricalLeaf =>
      val counts = l.probs.map(_ * l.n)
      var nullC = l.pNull * l.n
      val v = row(l.colIdx)
      if (v.isNaN) nullC += 1
      else if (v >= 0 && v < counts.length) counts(v.toInt) += 1
      val n1 = l.n + 1
      CategoricalLeaf(l.colIdx, counts.map(_ / n1), nullC / n1, n1)

    case l: NumericLeaf =>
      val v = row(l.colIdx)
      val n1 = l.n + 1
      if (v.isNaN)
        NumericLeaf(l.colIdx, l.vals, l.probs.map(_ * l.n / n1), (l.pNull * l.n + 1) / n1, n1)
      else {
        val i = Arrays.binarySearch(l.vals, v)
        if (i >= 0) {
          val counts = l.probs.map(_ * l.n)
          counts(i) += 1
          NumericLeaf(l.colIdx, l.vals, counts.map(_ / n1), l.pNull * l.n / n1, n1)
        } else {
          val at = -i - 1
          val vals = new Array[Double](l.vals.length + 1)
          val counts = new Array[Double](l.vals.length + 1)
          System.arraycopy(l.vals, 0, vals, 0, at)
          System.arraycopy(l.vals, at, vals, at + 1, l.vals.length - at)
          vals(at) = v
          var j = 0
          while (j < l.probs.length) {
            counts(if (j < at) j else j + 1) = l.probs(j) * l.n
            j += 1
          }
          counts(at) = 1.0
          NumericLeaf(l.colIdx, vals, counts.map(_ / n1), l.pNull * l.n / n1, n1)
        }
      }
  }

  def insertAll(node: SpnNode, rows: Iterator[Array[Double]]): SpnNode =
    rows.foldLeft(node)(insert)
}
