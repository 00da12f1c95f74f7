package graft.rspn

import breeze.linalg.{eig, inv, DenseMatrix, DenseVector}
import scala.collection.mutable
import scala.util.Random

/** RSPN structure learning on a driver-collected sample.
  *
  * Re-expression of the reference's learning loop (public
  * DataManagementLab/deepdb-public: aqp_spn/custom_spflow/custom_learning.py
  * — RDC column splits, KMeans row splits, min_instances_slice leaf cutoff;
  * RDC itself from spflow's splitting/RDC). The reference learns on a ≤10M
  * row pandas sample; we learn on a ≤`sampleCap` row collected Spark sample —
  * at 100 TB the cap, not the table, bounds the cost (SURVEY §7.5).
  */
object Learn {

  sealed trait ColKind
  case object NumericCol extends ColKind
  /** Categorical with dictionary size (codes 0..card-1). */
  final case class CategoricalCol(card: Int) extends ColKind

  /** Structure-learning parameters. The two that govern the
    * accuracy/latency trade-off (leaf cutoff, RDC dependence threshold)
    * default to the runtime knobs so a cluster job can retune them without
    * a rebuild (reference maqp.py exposes the same via CLI).
    */
  final case class Config(
      minInstancesFrac: Double = Knobs.minInstancesFrac,
      minInstancesAbs: Int = 128,
      rdcThreshold: Double = Knobs.rdcThreshold,
      rdcSampleRows: Int = 2000,
      rdcK: Int = 8,
      kmeansIters: Int = 12,
      seed: Long = 42L)

  def learn(data: Array[Array[Double]], kinds: Array[ColKind], cfg: Config = Config()): SpnNode = {
    val minInst = math.max(cfg.minInstancesAbs, (data.length * cfg.minInstancesFrac).toInt)
    val rng = new Random(cfg.seed)
    build(data.indices.toArray, kinds.indices.toArray, data, kinds, cfg, minInst, rng, 0)
  }

  /** Hard recursion ceiling. Balanced row splits reach minInst in
    * ~log2(sample/minInst) ≈ 8 levels; the bound only bites when 2-means
    * repeatedly peels a sliver cluster (skewed/outlier-chained samples),
    * which would otherwise recurse once per peel — thousands of frames on a
    * Future pool thread's default stack.
    */
  private val maxDepth = 64

  // ---------------------------------------------------------------- build

  private def build(
      rows: Array[Int],
      scope: Array[Int],
      data: Array[Array[Double]],
      kinds: Array[ColKind],
      cfg: Config,
      minInst: Int,
      rng: Random,
      depth: Int): SpnNode = {

    if (scope.length == 1)
      return leaf(rows, scope(0), data, kinds)
    if (rows.length < minInst || depth >= maxDepth)
      return ProductNode(scope.map(c => leaf(rows, c, data, kinds)), rows.length.toDouble)

    // column split: connected components of the RDC > threshold graph
    val comps = rdcComponents(rows, scope, data, cfg, rng)
    if (comps.length > 1)
      return ProductNode(
        comps.map(c => build(rows, c, data, kinds, cfg, minInst, rng, depth + 1)),
        rows.length.toDouble)

    // row split: seeded 2-means on z-normalized scope columns. Like
    // spflow's learning loop (the reference's custom_learning.py inherits
    // it), row splits REPEAT until min_instances_slice or a degenerate
    // clustering — cutting to leaves while cross-column dependence remains
    // would bake the independence error DeepDB exists to avoid. Recursion
    // terminates: both clusters are non-empty, so rows strictly shrink
    // toward the minInst floor (maxDepth bounds the pathological
    // sliver-peeling case).
    val clusters = kmeans2(rows, scope, data, cfg, rng)
    if (clusters.exists(_.isEmpty))
      return ProductNode(scope.map(c => leaf(rows, c, data, kinds)), rows.length.toDouble)
    val children = clusters.map(cl => build(cl, scope, data, kinds, cfg, minInst, rng, depth + 1))
    val weights = clusters.map(_.length.toDouble / rows.length)
    SumNode(weights, children, rows.length.toDouble)
  }

  // ---------------------------------------------------------------- leaves

  private def leaf(rows: Array[Int], col: Int, data: Array[Array[Double]], kinds: Array[ColKind]): SpnNode = {
    val n = rows.length.toDouble
    kinds(col) match {
      case CategoricalCol(card) =>
        val counts = new Array[Double](card)
        var nulls = 0.0
        rows.foreach { r =>
          val v = data(r)(col)
          if (v.isNaN) nulls += 1
          else counts(v.toInt) += 1
        }
        CategoricalLeaf(col, counts.map(_ / n), nulls / n, n)
      case NumericCol =>
        val nonNull = rows.iterator.map(r => data(r)(col)).filter(!_.isNaN).toArray
        val nulls = rows.length - nonNull.length
        java.util.Arrays.sort(nonNull)
        // unique values + frequencies (reference IdentityNumericLeaf keeps
        // the sample's unique values; the sample cap bounds the size)
        val vals = mutable.ArrayBuffer.empty[Double]
        val cnts = mutable.ArrayBuffer.empty[Double]
        nonNull.foreach { v =>
          if (vals.nonEmpty && vals.last == v) cnts(cnts.length - 1) += 1
          else { vals += v; cnts += 1 }
        }
        NumericLeaf(col, vals.toArray, cnts.map(_ / n).toArray, nulls / n, n)
    }
  }

  // ---------------------------------------------------------------- RDC

  /** Pairwise randomized dependence coefficient over a row subsample, then
    * connected components of the `rdc > threshold` adjacency on `scope`.
    */
  private def rdcComponents(
      rows: Array[Int],
      scope: Array[Int],
      data: Array[Array[Double]],
      cfg: Config,
      rng: Random): Array[Array[Int]] = {
    val sub = subsample(rows, cfg.rdcSampleRows, rng)
    // random Fourier features of the rank transform, per scope column
    val feats = scope.map(c => rdcFeatures(sub.map(r => data(r)(c)), cfg, rng))
    val k = scope.length
    val adj = Array.fill(k)(mutable.BitSet.empty)
    for (i <- 0 until k; j <- (i + 1) until k) {
      val r = cca(feats(i), feats(j))
      if (r > cfg.rdcThreshold) { adj(i) += j; adj(j) += i }
    }
    // connected components
    val seen = new Array[Boolean](k)
    val comps = mutable.ArrayBuffer.empty[Array[Int]]
    for (s <- 0 until k if !seen(s)) {
      val comp = mutable.ArrayBuffer.empty[Int]
      val stack = mutable.Stack(s)
      while (stack.nonEmpty) {
        val v = stack.pop()
        if (!seen(v)) {
          seen(v) = true
          comp += scope(v)
          adj(v).foreach(stack.push)
        }
      }
      comps += comp.toArray.sorted
    }
    comps.toArray
  }

  /** Deterministic random subsample WITHOUT stride patterns (a stride aliases
    * with any periodicity in row order — e.g. interleaved clusters — and can
    * sample a single cluster).
    */
  private def subsample(rows: Array[Int], k: Int, rng: Random): Array[Int] =
    if (rows.length <= k) rows
    else {
      val a = rows.clone()
      var i = 0
      while (i < k) { // partial Fisher–Yates
        val j = i + rng.nextInt(a.length - i)
        val t = a(i); a(i) = a(j); a(j) = t
        i += 1
      }
      java.util.Arrays.copyOfRange(a, 0, k)
    }

  /** RDC feature map: copula (rank) transform → sin/cos random projections.
    * Ties get their mid-rank (otherwise tie order leaks the physical row
    * order into the rank and manufactures spurious dependence between any
    * two discrete columns). NaNs rank lowest (they carry outer-join NULL
    * semantics, which IS a dependence signal w.r.t. the nn/fanout columns).
    */
  private def rdcFeatures(x: Array[Double], cfg: Config, rng: Random): DenseMatrix[Double] = {
    val n = x.length
    val key = (i: Int) => if (x(i).isNaN) Double.NegativeInfinity else x(i)
    val idx = (0 until n).sortBy(key).toArray
    val rank = new Array[Double](n)
    var s0 = 0
    while (s0 < n) { // assign average rank over each tie block
      var e0 = s0
      while (e0 + 1 < n && key(idx(e0 + 1)) == key(idx(s0))) e0 += 1
      val mid = (s0 + e0 + 2).toDouble / 2 / n
      var t0 = s0
      while (t0 <= e0) { rank(idx(t0)) = mid; t0 += 1 }
      s0 = e0 + 1
    }
    val k = cfg.rdcK
    // w ~ N(0, s²) over rank ∈ [0,1]: a few radians of smooth nonlinearity —
    // identical rank profiles map to identical features (CCA → 1), while
    // independent ranks stay decorrelated.
    val s = 3.0
    val w = Array.fill(k)(rng.nextGaussian() * s)
    val b = Array.fill(k)(rng.nextDouble() * 2 * math.Pi)
    val m = DenseMatrix.zeros[Double](n, 2 * k)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < k) {
        val t = w(j) * rank(i) + b(j)
        m(i, j) = math.sin(t)
        m(i, k + j) = math.cos(t)
        j += 1
      }
      i += 1
    }
    m
  }

  /** Largest canonical correlation between two feature blocks. Degenerate
    * (near-constant) blocks — e.g. a column with a single value in the
    * subsample — report 0 instead of a ridge artifact.
    */
  private def cca(a: DenseMatrix[Double], b: DenseMatrix[Double]): Double = {
    val n = a.rows.toDouble
    def center(m: DenseMatrix[Double]): DenseMatrix[Double] = {
      val out = m.copy
      for (j <- 0 until m.cols) {
        val mu = breeze.linalg.sum(m(::, j)) / n
        out(::, j) :-= mu
      }
      out
    }
    val x = center(a)
    val y = center(b)
    def maxVar(m: DenseMatrix[Double]): Double =
      (0 until m.cols).map(j => breeze.linalg.sum(m(::, j) *:* m(::, j)) / n).max
    if (maxVar(x) < 1e-12 || maxVar(y) < 1e-12) return 0.0
    val cxx = (x.t * x) /:/ n
    val cyy = (y.t * y) /:/ n
    val cxy = (x.t * y) /:/ n
    val ridge = DenseMatrix.eye[Double](x.cols) * 1e-4
    try {
      val m = inv(cxx + ridge) * cxy * inv(cyy + ridge) * cxy.t
      val ev = eig(m).eigenvalues
      val lmax = breeze.linalg.max(ev)
      math.sqrt(math.min(1.0, math.max(0.0, lmax)))
    } catch { case _: Throwable => 0.0 }
  }

  // ---------------------------------------------------------------- kmeans

  /** Deterministic 2-means over z-normalized scope columns (NaN → mean). */
  private def kmeans2(
      rows: Array[Int],
      scope: Array[Int],
      data: Array[Array[Double]],
      cfg: Config,
      rng: Random): Array[Array[Int]] = {
    val d = scope.length
    val mu = new Array[Double](d)
    val sd = new Array[Double](d)
    scope.zipWithIndex.foreach { case (c, j) =>
      var s = 0.0; var s2 = 0.0; var cnt = 0
      rows.foreach { r =>
        val v = data(r)(c)
        if (!v.isNaN) { s += v; s2 += v * v; cnt += 1 }
      }
      mu(j) = if (cnt > 0) s / cnt else 0.0
      sd(j) = if (cnt > 0) math.max(math.sqrt(math.max(0, s2 / cnt - mu(j) * mu(j))), 1e-9) else 1.0
    }
    // z-normalize ONCE into a dense matrix: the assignment and centroid
    // loops below revisit every row per iteration, and recomputing
    // (v-mu)/sd with a fresh Array per visit dominated learn() wall time
    // (the recursion calls kmeans2 at every level)
    val vm: Array[Array[Double]] = Array.tabulate(rows.length) { i =>
      val row = data(rows(i))
      val v = new Array[Double](d)
      var j = 0
      while (j < d) {
        val x = row(scope(j))
        v(j) = if (x.isNaN) 0.0 else (x - mu(j)) / sd(j)
        j += 1
      }
      v
    }
    // k-means++ style seeding, deterministic
    val c0 = vm(rng.nextInt(rows.length)).clone()
    var far = 0; var farD = -1.0
    var ri = 0
    while (ri < rows.length) {
      val v = vm(ri)
      var dd = 0.0
      var j = 0
      while (j < d) { val t = v(j) - c0(j); dd += t * t; j += 1 }
      if (dd > farD) { farD = dd; far = ri }
      ri += 1
    }
    val cents = Array(c0, vm(far).clone())
    val assign = new Array[Int](rows.length)
    var iter = 0
    var changed = true
    while (iter < cfg.kmeansIters && changed) {
      changed = false
      var i = 0
      while (i < rows.length) {
        val v = vm(i)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < 2) {
          var dd = 0.0; var j = 0
          while (j < d) { val t = v(j) - cents(c)(j); dd += t * t; j += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        if (assign(i) != best) { assign(i) = best; changed = true }
        i += 1
      }
      // recompute centroids
      for (c <- 0 until 2) {
        val sum = new Array[Double](d)
        var cnt = 0
        var i = 0
        while (i < rows.length) {
          if (assign(i) == c) {
            val v = vm(i)
            var j = 0
            while (j < d) { sum(j) += v(j); j += 1 }
            cnt += 1
          }
          i += 1
        }
        if (cnt > 0) { var j = 0; while (j < d) { cents(c)(j) = sum(j) / cnt; j += 1 } }
      }
      iter += 1
    }
    Array(
      rows.indices.collect { case i if assign(i) == 0 => rows(i) }.toArray,
      rows.indices.collect { case i if assign(i) == 1 => rows(i) }.toArray)
  }

  /** Pairwise RDC matrix (for the rdc_matrix operator and ensemble ranking —
    * reference ensemble_creation/rdc_based.py).
    */
  def rdcMatrix(
      data: Array[Array[Double]],
      cols: Array[Int],
      cfg: Config = Config()): Array[(Int, Int, Double)] = {
    val rng = new Random(cfg.seed)
    val sub = subsample(data.indices.toArray, cfg.rdcSampleRows, rng)
    val feats = cols.map(c => rdcFeatures(sub.map(r => data(r)(c)), cfg, rng))
    (for {
      i <- cols.indices
      j <- (i + 1) until cols.length
    } yield (cols(i), cols(j), cca(feats(i), feats(j)))).toArray
  }
}
