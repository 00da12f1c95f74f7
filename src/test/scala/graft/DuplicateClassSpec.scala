package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics lock on the duplicate-class canonicalization inside
  * `cosineLshPairs` and `dedup_near` (round 11's fix for the quadratic
  * that a 10× verbatim replication exposed): on duplicate-HEAVY input the
  * emitted pair set must be EXACTLY what banding raw rows would produce.
  * The fixtures are engineered so the expected set is deterministic:
  * mutually orthogonal base vectors (pairwise cosine 0, far below the
  * threshold) and token-disjoint sentences (pairwise Jaccard 0), each
  * duplicated a different number of times — the answer is precisely the
  * within-class pairs, nothing else.
  */
class DuplicateClassSpec extends AnyFunSuite {
  import TestSpark._

  private def withinClassPairs(classes: Seq[Seq[Long]]): Set[(Long, Long)] =
    classes.flatMap { ms =>
      for { a <- ms; b <- ms if a < b } yield (a, b)
    }.toSet

  test("cosineLshPairs on duplicated orthogonal vectors emits exactly the duplicate pairs") {
    val d = java.nio.file.Files.createTempDirectory("graft-dupclass-vec-").toString
    val dim = 32
    // 12 orthogonal unit vectors, class i duplicated (i % 4 + 1) times
    val rows = for {
      i <- 0 until 12
      copies = i % 4 + 1
      j <- 0 until copies
    } yield (i.toLong * 10 + j, Array.tabulate(dim)(k => if (k == i) 1.0f else 0.0f))
    import spark.implicits._
    rows.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    val expected = withinClassPairs(
      (0 until 12).map(i => (0 until i % 4 + 1).map(j => i.toLong * 10 + j)))
    val got = ext.Similarity.cosineLshPairs(spark, d, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected,
      s"pair set must be exactly the duplicate classes: got ${got.keySet}, want $expected")
    got.values.foreach(cos => assert(math.abs(cos - 1.0) < 1e-12,
      "identical vectors must carry cosine 1"))
  }

  test("dedup_simhash on duplicated token-disjoint docs emits exactly the duplicate pairs") {
    val d = java.nio.file.Files.createTempDirectory("graft-dupclass-sim-").toString
    // token-disjoint 12-word sentences: cross-class simhashes are
    // near-random 64-bit values (expected hamming 32, far above the 12
    // gate), within-class hamming is 0 — only duplicate pairs survive
    val rows = for {
      i <- 0 until 8
      copies = i % 3 + 1
      j <- 0 until copies
    } yield (i.toLong * 10 + j,
      (0 until 12).map(w => s"s${i}_$w").mkString(" "), "en", "synth")
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source").write.parquet(s"$d/documents.parquet")
    val expected = withinClassPairs(
      (0 until 8).map(i => (0 until i % 3 + 1).map(j => i.toLong * 10 + j)))
    val got = SparkEntry.queries("dedup_simhash")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == expected,
      s"pair set must be exactly the duplicate classes: got ${got.keySet}, want $expected")
    got.values.foreach(h => assert(h == 0L, "identical docs must carry hamming 0"))
  }

  test("dedup_near on duplicated token-disjoint docs emits exactly the duplicate pairs") {
    val d = java.nio.file.Files.createTempDirectory("graft-dupclass-doc-").toString
    // 8 sentences over disjoint token alphabets (Jaccard 0 across classes),
    // class i duplicated (i % 3 + 1) times
    val rows = for {
      i <- 0 until 8
      copies = i % 3 + 1
      j <- 0 until copies
    } yield (i.toLong * 10 + j,
      (0 until 6).map(w => s"w${i}_$w").mkString(" "), "en", "synth")
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source").write.parquet(s"$d/documents.parquet")
    val expected = withinClassPairs(
      (0 until 8).map(i => (0 until i % 3 + 1).map(j => i.toLong * 10 + j)))
    val got = SparkEntry.queries("dedup_near")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected,
      s"pair set must be exactly the duplicate classes: got ${got.keySet}, want $expected")
    got.values.foreach(dist => assert(dist == 0.0,
      "identical docs must carry jaccard distance 0"))
  }

  test("the exact-Jaccard family canonicalizes: ngram pairs, containment, clusters on dup-heavy input") {
    // round 13: dedup_ngram / dedup_containment / dedup_cluster join over
    // unique shingle-set classes and expand members only at output — on
    // duplicate-heavy input the emitted sets must be EXACTLY what the raw
    // per-doc joins would produce. Token-disjoint sentences duplicated a
    // varying number of times: the answer is precisely the within-class
    // pairs (Jaccard/containment exactly 1), nothing else.
    val d = java.nio.file.Files.createTempDirectory("graft-dupclass-exact-").toString
    val rows = for {
      i <- 0 until 8
      copies = i % 3 + 1
      j <- 0 until copies
    } yield (i.toLong * 10 + j,
      (0 until 6).map(w => s"x${i}_$w").mkString(" "), "en", "synth")
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source").write.parquet(s"$d/documents.parquet")
    val classes = (0 until 8).map(i => (0 until i % 3 + 1).map(j => i.toLong * 10 + j))
    val expected = withinClassPairs(classes)

    val ngram = SparkEntry.queries("dedup_ngram")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ngram.keySet == expected,
      s"ngram pair set: got ${ngram.keySet}, want $expected")
    ngram.values.foreach(j => assert(j == 1.0, "identical docs must carry jaccard 1"))

    val cont = SparkEntry.queries("dedup_containment")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(cont.keySet == expected,
      s"containment pair set: got ${cont.keySet}, want $expected")
    cont.foreach { case ((a, _), (c, containedId)) =>
      assert(c == 1.0, "identical docs must carry containment 1")
      assert(containedId == a, "equal-size tie must resolve to the lesser id")
    }

    // clusters: each duplicate class is one component labeled by its min
    val labels = SparkEntry.queries("dedup_cluster")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expectedLabels = classes.filter(_.length >= 2)
      .flatMap(ms => ms.map(_ -> ms.min)).toMap
    assert(labels == expectedLabels, s"cluster labels: got $labels, want $expectedLabels")
  }
  test("the production threshold bands selectively; the loose spec threshold is flagged") {
    // r17 (VERDICT item 5): the near-all-pairs regime at loose thresholds
    // is OBSERVABLE — cosineLshCandidateCounts measures banding
    // selectivity, and the production threshold (0.85) must stay well
    // below the loose spec threshold's (0.45) on the committed fixture.
    // (At cos-0.45 / k=2, an uncorrelated pair lands in >=1 of 16 bands
    // w.p. ~0.99 by math — Similarity.scala header — so its selectivity
    // approaches 1; at 0.85 / k=6 banding separates.)
    val d = sf
    val (n85, c85) = ext.Similarity.cosineLshCandidateCounts(spark, d, 0.85)
    val all = n85.toDouble * (n85 - 1) / 2
    assert(n85 > 100, s"fixture must carry vectors: $n85")
    val sel85 = c85 / all
    val (n45, c45) = ext.Similarity.cosineLshCandidateCounts(spark, d, 0.45)
    assert(n45 == n85)
    val sel45 = c45 / all
    info(f"banding selectivity: 0.85 -> $sel85%.4f, 0.45 -> $sel45%.4f (n=$n85)")
    assert(sel85 <= 0.7, f"production threshold must band selectively: $sel85%.4f")
    assert(sel45 > sel85, f"loose threshold must be LESS selective: $sel45%.4f vs $sel85%.4f")
    assert(sel85 <= 0.75 * sel45,
      f"0.85 must be substantially more selective than 0.45: $sel85%.4f vs $sel45%.4f")
  }
}
