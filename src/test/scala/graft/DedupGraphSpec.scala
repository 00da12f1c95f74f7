package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed min-label propagation CC path (ext/Dedup
  * `propagateLabels`), which fixture-sized pair graphs no longer reach
  * (they take the bounded union-find fast path): a synthetic graph with a
  * chain (diameter > 1), a triangle with a redundant edge, a two-node
  * component and an isolated pair must converge to per-component minimum
  * labels — the same invariant the union-find path produces.
  */
class DedupGraphSpec extends AnyFunSuite {
  import TestSpark._

  test("min-label propagation matches per-component minima on a synthetic graph") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 5L), (5L, 9L), (9L, 12L), // chain: component min 1, diameter 3
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle + redundant edge: min 20
      (30L, 31L), // two-node component
      (40L, 41L)
    ).toDF("a_id", "b_id")
    val labels = ext.Dedup.propagateLabels(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(
      1L -> 1L, 5L -> 1L, 9L -> 1L, 12L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L,
      40L -> 40L, 41L -> 40L)
    assert(labels == expected, s"got $labels")
  }

  test("propagation of an empty pair graph yields an empty frame, no NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(ext.Dedup.propagateLabels(empty).count() == 0)
  }
}
