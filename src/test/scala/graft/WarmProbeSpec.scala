package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the fitted-model memoization (ext/ModelCache): the first invocation
  * of each ML-backed op fits/derives its models and featurized frames; every
  * later invocation must pay inference cost only. The primary assertion is
  * the ModelCache fit counter — load-independent, catches any re-fit exactly
  * — with a loose wall-clock backstop for non-ModelCache regressions.
  * (Suites fork into ONE sequential JVM, so the counter snapshot cannot race
  * another suite's fits; the wall bound is loose because external machine
  * load — concurrent builds, the driver's own jobs — made tight bounds
  * flake. Measured warm times at sf0.001 are 0.1–0.7 s.)
  */
class WarmProbeSpec extends AnyFunSuite {
  import TestSpark._

  test("second invocation of memoized ops pays inference cost only") {
    Seq("dedup_near", "dedup_cosine_lsh", "sim_topk_ivf", "text_tfidf",
      "dedup_cluster").foreach { q =>
      SparkEntry.queries(q)(spark, sf).count() // cold: fit + featurize
      val fits0 = ext.ModelCache.fitCount
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sf).count()
      val warm = (System.nanoTime() - t0) / 1e9
      info(f"$q%-18s warm $warm%.2f s")
      assert(ext.ModelCache.fitCount == fits0,
        s"$q re-fit a memoized model on its second invocation")
      assert(warm < 10.0, f"$q warm invocation took $warm%.2f s at sf0.001")
    }
  }
}
