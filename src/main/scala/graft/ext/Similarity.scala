package graft.ext

import graft.Op
import graft.schema.Tables
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector similarity over the `embeddings` table (north star: similarity
  * search over an Array[Float] column).
  *
  * The dot/cosine math is pure codegen'd higher-order functions — elementwise
  * double arithmetic in array order, so results are bit-identical to a
  * sequential loop (and to DuckDB's list_dot_product). Brute-force variants
  * are the exact baselines; the LSH variant is the 1000-executor path (hash
  * once, shuffle only candidates).
  */
object Similarity {

  private def emb(s: SparkSession, d: String): DataFrame = Tables(s, d, "embeddings")

  /** float[] -> double[] (exact widening, makes all arithmetic double). */
  def vecd(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(dot(a, a) * dot(b, b))

  val ops: Seq[Op] = Seq(
    // F5: array math — squared L2 norm per embedding.
    Op(
      "array_dot",
      """SELECT vec_id,
        |       round(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])), 2) AS norm_sq
        |FROM embeddings ORDER BY vec_id""".stripMargin
    )((s, d) =>
      emb(s, d)
        .select(col("vec_id"), round(dot(vecd(col("embedding")), vecd(col("embedding"))), 2).as("norm_sq"))
        .orderBy("vec_id")),

    // L3 baseline: brute-force cosine top-k for a query vector (vec_id=0).
    // One broadcast of the single query row; the scan stays embarrassingly
    // parallel; the global top-k is a TakeOrdered, not a full sort.
    Op(
      "sim_topk",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT b.vec_id,
        |       round(list_dot_product(a.v, b.v) / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id = 0 AND b.vec_id <> 0
        |ORDER BY round(list_dot_product(a.v, b.v) / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 6) DESC, b.vec_id
        |LIMIT 10""".stripMargin
    ) { (s, d) =>
      val e = emb(s, d).select(col("vec_id"), vecd(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("cos", cosine(col("qv"), col("v")))
        .orderBy(round(col("cos"), 6).desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), round(col("cos"), 4).as("cos_sim"))
    },

    // L2d: embedding-cosine near-dup pairs (threshold 0.45; background pairs
    // top out near 0.5). Exact quadratic baseline — production path is
    // sim_topk_lsh's bucketing.
    Op(
      "dedup_cosine",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |       round(list_dot_product(a.v, b.v) / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)), 4) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v)) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin
    ) { (s, d) =>
      val e = emb(s, d).select(col("vec_id"), vecd(col("embedding")).as("v"))
      val a = e.toDF("a_id", "va")
      val b = e.toDF("b_id", "vb")
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("cos", cosine(col("va"), col("vb")))
        .filter(col("cos") >= 0.45)
        .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos_sim"))
        .orderBy("a_id", "b_id")
    },

    // L3 scale path: random-projection LSH ANN. Not oracle-able (model
    // internal), deterministic via fixed seed.
    Op.noOracle("sim_topk_lsh") { (s, d) =>
      val feats = emb(s, d)
        .withColumn("features", array_to_vector(col("embedding")))
      val lsh = new BucketedRandomProjectionLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setBucketLength(2.0).setNumHashTables(3).setSeed(42L)
      val model = lsh.fit(feats)
      val key = feats.filter(col("vec_id") === 0)
        .select("features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
      model.approxNearestNeighbors(feats.filter(col("vec_id") =!= 0), key, 10)
        .select(col("vec_id"), round(col("distCol"), 4).as("dist"))
        .orderBy("dist", "vec_id")
    },

    // L4: multimodal join — documents with their embedding metadata.
    Op(
      "multimodal_join",
      """SELECT d.doc_id, d.lang, e.label, d.n_chars
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY d.doc_id""".stripMargin
    )((s, d) =>
      Tables(s, d, "documents")
        .join(emb(s, d), col("doc_id") === col("vec_id"))
        .select("doc_id", "lang", "label", "n_chars")
        .orderBy("doc_id"))
  )
}
