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

  test("star edges: linear in class size, labels identical to the member-pair graph") {
    import spark.implicits._
    // a 10k-member exact-dup class: the member-pair graph would be
    // C(10000,2) ≈ 5·10⁷ edges — the star must stay LINEAR and still
    // label every member with the class minimum
    val bigMembers = (0L until 10000L).toSeq
    val classes = Seq(
      (0L, bigMembers),             // canonical 0, 10k members
      (20000L, Seq(20000L, 20001L)), // small class, joins big via canonical pair
      (30000L, Seq(30000L))          // singleton — no star edges
    ).toDF("doc_id", "members")
    val canonicalPairs = Seq((0L, 20000L)).toDF("a_id", "b_id")
    val edges = ext.DupClasses.starEdges(canonicalPairs, classes)
    assert(edges.count() == (10000 - 1) + (2 - 1) + 1,
      "star edges must be linear: |class|-1 per class plus one per canonical pair")
    val labels = ext.Dedup.propagateLabels(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 10000 + 2, "every member of a multi-member class labels")
    assert(labels.values.forall(_ == 0L), "one component, minimum label 0")
    // equivalence pin on a small class: star labels == full pair-graph labels
    val smallMembers = (100L until 160L).toSeq
    val smallClasses = Seq((100L, smallMembers)).toDF("doc_id", "members")
    val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val starLabels = ext.Dedup.propagateLabels(
      ext.DupClasses.starEdges(noPairs, smallClasses)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullPairs = (for { a <- smallMembers; b <- smallMembers if a < b } yield (a, b))
      .toDF("a_id", "b_id")
    val pairLabels = ext.Dedup.propagateLabels(fullPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starLabels == pairLabels, "star and pair-graph labels must agree")
  }
}
