package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the fixture scaler (tools/ScaleUp) — the scaling
  * artifact's verdicts (BENCH_SCALING.md's third decade) are only as good
  * as the generated data, so the generator gets its own gates: fact row
  * counts scale by exactly the factor, primary keys stay unique, FK edges
  * stay consistent (join cardinalities scale by the factor, never fan out
  * across replicas), and dimensions are byte-for-byte the source's.
  */
class ScaleUpSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dst: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scaleup-").toString
    tools.ScaleUp.run(spark, sf, d, 3)
    d
  }

  private def src(t: String) = spark.read.parquet(s"$sf/$t.parquet")
  private def out(t: String) = spark.read.parquet(s"$dst/$t.parquet")

  test("fact tables scale by exactly the factor; dims are unchanged") {
    Seq("lineitem", "orders", "documents", "embeddings", "events").foreach { t =>
      assert(out(t).count() == 3 * src(t).count(), s"$t row count")
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      assert(out(t).count() == src(t).count(), s"$t must be verbatim")
      assert(out(t).exceptAll(src(t)).isEmpty, s"$t rows must be identical")
    }
  }

  test("offset keys stay as unique as the source's") {
    Seq("orders" -> Seq("o_orderkey"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "events" -> Seq("event_id")).foreach { case (t, ks) =>
      val df = out(t)
      assert(df.select(ks.map(col): _*).distinct().count() == df.count(),
        s"$t key ${ks.mkString(",")} must stay unique after scaling")
    }
    // lineitem's (l_orderkey, l_linenumber) is NOT unique in the source
    // fixture (a documented testdata fact) — scaling must preserve the
    // per-replica distinct count exactly, never merge across replicas
    val srcDistinct = src("lineitem").select("l_orderkey", "l_linenumber").distinct().count()
    assert(out("lineitem").select("l_orderkey", "l_linenumber").distinct().count()
      == 3 * srcDistinct, "lineitem key distinctness must scale by the factor")
  }

  test("FK joins scale by the factor — replicas never fan out across each other") {
    val liOrd = out("lineitem").join(out("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    val liOrdSrc = src("lineitem").join(src("orders"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(liOrd == 3 * liOrdSrc, s"lineitem⋈orders: $liOrd vs 3×$liOrdSrc")
    val docEmb = out("documents").join(out("embeddings"),
      col("doc_id") === col("vec_id")).count()
    val docEmbSrc = src("documents").join(src("embeddings"),
      col("doc_id") === col("vec_id")).count()
    assert(docEmb == 3 * docEmbSrc, s"documents⋈embeddings: $docEmb vs 3×$docEmbSrc")
    // dim FKs: every scaled fact key still resolves (inner join keeps all)
    val liPart = out("lineitem").join(out("part"),
      col("l_partkey") === col("p_partkey")).count()
    assert(liPart == out("lineitem").count(), "every l_partkey must resolve in part")
  }

  test("documents text is verbatim per replica (bounded gram sets stay bounded)") {
    // distinct texts must NOT grow: replicas copy text so decontamination/
    // benchmark gram sets stay constant while the corpus scales
    assert(out("documents").select("text").distinct().count() ==
      src("documents").select("text").distinct().count())
  }

  test("an empty source table fails loudly with the table and key named") {
    // max(key) over an empty table is NULL; the key-base derivation must
    // name the offender instead of NPE-ing on getLong
    val d = java.nio.file.Files.createTempDirectory("graft-scaleup-empty-").toString
    spark.range(0).select(col("id").as("doc_id")).write.parquet(s"$d/documents.parquet")
    spark.range(0).select(col("id").as("vec_id")).write.parquet(s"$d/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      tools.ScaleUp.run(spark, d, s"$d/out", 2)
    }
    assert(e.getMessage.contains("documents") && e.getMessage.contains("doc_id"),
      s"message must name the empty table and key column: ${e.getMessage}")
  }
}
