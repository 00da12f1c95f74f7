package graft.ext

import graft.Op
import graft.schema.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for pretraining-data pipelines: exact, n-gram
  * Jaccard (exact pairwise), MinHash+LSH (scale path), SimHash banding.
  *
  * Scale posture: exact dedup is a hash groupBy (one shuffle on the
  * fingerprint); SimHash/MinHash avoid the O(n²) pair space by banding /
  * LSH bucketing so only same-bucket candidates join. The exact Jaccard
  * operator is the *oracle-checkable* ground truth and is deliberately
  * scoped (doc_id < 500 on both sides) so it stays bounded at any SF —
  * its production counterpart is `dedup_near`.
  */
object Dedup {

  private def docs(s: SparkSession, d: String): DataFrame = Tables(s, d, "documents")

  /** FNV-1a 64-bit over a string — a simple public-domain hash; gives the
    * per-shingle 64-bit codes SimHash folds together.
    */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** SimHash-64 of a shingle set: per-bit majority vote of shingle hashes. */
  def simhash64(shingles: Seq[String]): Long = {
    val votes = new Array[Int](64)
    shingles.foreach { sh =>
      val h = fnv1a64(sh)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private val simhashUdf = udf(simhash64 _)

  /** Exact 3-gram Jaccard near-dup pairs (threshold 0.5) over the scoped
    * oracle corpus (doc_id < 500). Pair space comes from the shingle
    * inverted index (join on shingle), never a cross join. Shared by
    * `dedup_ngram` (the pair list) and `dedup_cluster` (its edge set).
    */
  /** The scoped, shingled oracle corpus — shared featurization of the
    * exact-Jaccard family (ngramPairs, dedup_containment). Memoized+cached
    * so the shingle HOFs run once per row per session, not once per
    * consuming op or plan branch.
    */
  private def shingledBase(s: SparkSession, d: String): DataFrame =
    ModelCache.memo(s, d, "ngram_base") {
      docs(s, d)
        .filter(col("doc_id") < 500)
        .filter(size(Text.tokens(col("text"))) >= 3)
        // fan the shingle HOF work across cores AFTER the scope filters —
        // repartitioning first would shuffle the full corpus's text payload
        // only to discard most of it (one-split local file; see dedup_near)
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("toks", Text.tokens(col("text")))
        .select(col("doc_id"), Text.shinglesOfTokens(col("toks"), 3).as("sh"))
        .cache()
    }

  private def shingledExploded(s: SparkSession, d: String): DataFrame =
    ModelCache.memo(s, d, "ngram_exploded") {
      shingledBase(s, d).select(col("doc_id"), explode(col("sh")).as("s")).cache()
    }

  /** Exact-duplicate classes of the scoped corpus (identical distinct-
    * shingle sets — pairwise Jaccard exactly 1), WITHOUT the shingle
    * payload: (canonical doc_id = class minimum, members, n = |shingle
    * set|). The whole exact-Jaccard family joins over these unique classes
    * rather than raw docs — the same canonicalization dedup_near /
    * dedup_simhash apply before banding — so the inverted-index self-join
    * (the family's expensive step) is LINEAR in the duplication factor;
    * only each op's OUTPUT expansion stays pairwise, where the pair set is
    * the contract.
    */
  private def ngramClasses(s: SparkSession, d: String): DataFrame =
    ModelCache.memo(s, d, "ngram_classes") {
      // the class key is md5 OVER the JSON-encoded SORTED shingle list —
      // order-insensitive (two docs with the same shingle SET in different
      // orders collapse into one class; to_json is an unambiguous
      // canonical encoding, and a 128-bit collision over a corpus-sized
      // key set is negligible) at FIXED key width: r14 grouped by the
      // sorted array itself, which made the shuffle carry and compare
      // whole shingle arrays and cost ~65% more cpu on the family's
      // hottest op (isolated re-measure, BENCH_SCALING r15 appendix)
      val c = shingledBase(s, d)
        .withColumn("n", size(col("sh")).cast("bigint"))
        .groupBy(md5(to_json(sort_array(col("sh")))).as("ck"))
        .agg(min(col("doc_id")).as("doc_id"),
          sort_array(collect_list(col("doc_id"))).as("members"),
          min(col("n")).as("n"))
        .select(col("doc_id"), col("members"), col("n"))
        .cache()
      c.count()
      c
    }

  /** Un-thresholded pair statistics of the shingle inverted index over
    * CANONICAL class representatives: (a_id, b_id, inter, na, nb,
    * a_members, b_members) for every shingle-sharing class pair. Runs ONCE
    * per session; every similarity definition (Jaccard ≥ 0.5 for
    * ngramPairs, directional containment ≥ 0.8 for dedup_containment)
    * derives by a cheap filter + member expansion over the cached
    * pair-sized frame — the metrics are pure functions of the two shingle
    * SETS, so every member pair inherits its canonical pair's values.
    */
  private def pairStats(s: SparkSession, d: String): DataFrame =
    ModelCache.memo(s, d, "ngram_pair_stats") {
      val base = shingledBase(s, d)
      val classes = ngramClasses(s, d)
      val reps = classes.select("doc_id")
      val exploded = shingledExploded(s, d).join(reps, Seq("doc_id"), "left_semi")
      val cnt = classes.select(col("doc_id"), col("n"))
      val a = exploded.toDF("a_id", "s")
      val b = exploded.toDF("b_id", "s2")
      val stats = a.join(b, a("s") === b("s2") && a("a_id") < b("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
        .join(cnt.toDF("a_id", "na"), "a_id")
        .join(cnt.toDF("b_id", "nb"), "b_id")
        // pin only the union of the consumers' qualified sets: the raw
        // co-shingled pair space approaches O(n²) on gram-heavy corpora,
        // and caching it would hold exactly the blocks this memo exists to
        // keep small (each consumer re-applies its exact threshold below)
        .filter(
          col("inter") / (col("na") + col("nb") - col("inter")) >= 0.5 ||
            greatest(col("inter") / col("na"), col("inter") / col("nb")) >= 0.8)
        .join(classes.select(col("doc_id").as("a_id"), col("members").as("a_members")), "a_id")
        .join(classes.select(col("doc_id").as("b_id"), col("members").as("b_members")), "b_id")
        .cache()
      // materialize now and drop the featurized parents: once the (tiny)
      // pair frame is pinned, base/exploded are never read again — keeping
      // them cached would hold corpus-sized blocks for the whole session
      stats.count()
      base.unpersist()
      shingledExploded(s, d).unpersist()
      stats
    }

  def ngramPairs(s: SparkSession, d: String): DataFrame = {
    val qualified = pairStats(s, d)
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
    // member pairs of a qualifying canonical pair inherit its Jaccard;
    // within-class pairs are identical sets — Jaccard exactly 1
    DupClasses.expand(qualified, ngramClasses(s, d), "jaccard", lit(1.0))
  }

  val ops: Seq[Op] = Seq(
    // L1/T5 batch form: exact dedup. The testdata has no exact duplicates,
    // so the fixture doubles the corpus (FIXTURES.md) and dedups it back.
    Op(
      "dedup_exact",
      """SELECT doc_id, COUNT(*) AS n_copies, MIN(lang) AS lang
        |FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val doubled = docs(s, d).unionAll(docs(s, d))
      doubled
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_copies"), min("lang").as("lang"))
        .orderBy("doc_id")
    },

    // L2a: exact 3-gram Jaccard near-dup pairs (threshold 0.5; the planted
    // near-dups sit at ~0.9–1.0, the background at ~0.0–0.1). Pair space is
    // generated by the shingle inverted index (join on shingle), not a
    // cross join.
    Op(
      "dedup_ngram",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks)),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT a_id, b_id, inter / (ca.n + cb.n - inter) AS jaccard
        |FROM pairs JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
        |WHERE inter / (ca.n + cb.n - inter) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin
    ) { (s, d) =>
      ngramPairs(s, d).select("a_id", "b_id", "jaccard").orderBy("a_id", "b_id")
    },

    // L2b: MinHash+LSH near-dup — the 100 TB path, fully codegen'd native
    // functions (no MLlib, no UDFs). Per doc: K minhashes (min over shingles
    // of xxhash64(shingle, i) — the salt column varies the hash family, the
    // standard one-hash-per-permutation approximation); banded b×r so only
    // same-band-key candidates join (collision prob per band ≈ jaccard^r);
    // candidates get an exact shingle-set Jaccard re-check, so precision is
    // 1.0 and only candidate recall depends on (b, r). At j=0.9 the miss
    // probability is (1−0.9²)⁶ ≈ 5e-5; background (j≲0.15) collides on
    // ≈ j²·b ≲ 1% of shingle-sharing pairs. Replaces the earlier MLlib
    // approxSimilarityJoin formulation (sparse-vector keyDistance per
    // candidate; 15 s driver-cold at sf0.1 vs ~1 s for this plan).
    Op.noOracle("dedup_near") { (s, d) =>
      val K = 12; val nBands = 6; val r = 2
      // memoized+cached: the band self-join and the exact re-check both read
      // the signature frame; shingling + K×|sh| hashing must run once per doc.
      // EXACT-DUPLICATE CLASSES FIRST (same move as cosineLshPairs, same
      // measured reason: verbatim duplicates collide in EVERY band, so
      // banding raw docs makes the candidate join quadratic in the
      // duplication factor — 15× wall for 10× data on the replicated sf1).
      // Every downstream value (minhash sig, band keys, the Jaccard
      // recheck) is a function of `sh` alone, so grouping by `sh` is
      // output-preserving: candidates and hashing run once per UNIQUE
      // shingle sequence, duplicate classes re-expand at the end.
      val sigs = ModelCache.memo(s, d, "near_sigs") {
        docs(s, d)
          // local corpora are one parquet split; fan the per-doc hash work
          // across cores (at scale the source arrives in many splits and
          // this repartition is a no-op cost next to the hashing)
          .repartition(s.sparkContext.defaultParallelism)
          .filter(size(Text.tokens(col("text"))) >= 3)
          .withColumn("toks", Text.tokens(col("text")))
          .select(col("doc_id"), Text.shinglesOfTokens(col("toks"), 3).as("sh"))
          .groupBy("sh")
          .agg(min(col("doc_id")).as("doc_id"),
            sort_array(collect_list(col("doc_id"))).as("members"))
          // single pass over sh: K hashes per shingle, elementwise-min fold.
          // (K separate array_min(transform(sh, …)) columns would let
          // CollapseProject inline the shingle construction K times per row.)
          .withColumn("sig",
            aggregate(
              transform(col("sh"), x =>
                array((0 until K).map(i => xxhash64(x, lit(i))): _*)),
              array(Seq.fill(K)(lit(Long.MaxValue)): _*),
              (acc, hs) => zip_with(acc, hs, (a, b) => least(a, b))))
          .cache()
      }
      // r19: each pair survives the band join exactly once — at its FIRST
      // colliding band (codegen'd FirstEqualIndex over the two key arrays
      // the join rows carry) — instead of once per colliding band followed
      // by a `.distinct()` aggregate+exchange. Same distinct candidate set.
      val bands = sigs
        .select(col("doc_id"),
          array((0 until nBands).map(bnd =>
            xxhash64((0 until r).map(j =>
              element_at(col("sig"), bnd * r + j + 1)): _*)): _*).as("keys"))
        .select(col("doc_id"), col("keys"), posexplode(col("keys")))
        .toDF("id", "keys", "band", "key")
      val cand = bands.select(col("id").as("a_id"), col("keys").as("keys_a"),
          col("band"), col("key"))
        .join(bands.select(col("id").as("b_id"), col("keys").as("keys_b"),
          col("band").as("band_r"), col("key").as("key_r")),
          col("band") === col("band_r") && col("key") === col("key_r") &&
            col("a_id") < col("b_id"))
        .filter(org.apache.spark.sql.graft.BandOps
          .firstEqualIndex(col("keys_a"), col("keys_b")) === col("band"))
        .select("a_id", "b_id")
      val sh = sigs.select(col("doc_id"), col("sh"), col("members"))
      // the Jaccard depends only on the two shingle sequences, so every
      // member pair of a qualifying canonical pair shares its distance
      val canonicalPairs = cand
        .join(sh.toDF("a_id", "a_sh", "a_members"), "a_id")
        .join(sh.toDF("b_id", "b_sh", "b_members"), "b_id")
        .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))).cast("double"))
        .withColumn("jac", col("inter") / (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
        .filter(col("jac") >= 0.5)
      // within-class pairs: the self-Jaccard is NOT always 1 — `sh` can
      // repeat shingles and array_intersect is distinct-valued, exactly as
      // the raw recheck computed it: d/(2n − d)
      val selfInter = size(array_intersect(col("sh"), col("sh"))).cast("double")
      val selfJac = selfInter / (size(col("sh")) * 2 - selfInter)
      DupClasses.expand(canonicalPairs, sigs.filter(selfJac >= 0.5), "jac", selfJac)
        .select(col("a_id"), col("b_id"), round(lit(1.0) - col("jac"), 4).as("jacc_dist"))
        .orderBy("a_id", "b_id")
    },

    // L2c: SimHash banding — 64-bit fingerprint, 4×16-bit bands; candidate
    // pairs only where a band collides (LSH for Hamming space), then exact
    // Hamming re-check with bit_count(xor).
    Op.noOracle("dedup_simhash") { (s, d) =>
      // memoized+cached: the band self-join reads sigs on both sides; the
      // simhash vote loop is the expensive part and must run once per doc,
      // once per session (not once per invocation).
      // EXACT-DUPLICATE CLASSES FIRST (the cosineLshPairs/dedup_near move):
      // both the band keys and the hamming recheck are pure functions of
      // the 64-bit fingerprint, so docs with an IDENTICAL simhash — every
      // verbatim duplicate, which collides in all 4 bands and makes the
      // candidate join quadratic in the duplication factor — collapse to a
      // canonical row + member list; classes re-expand after the recheck.
      val sigs = ModelCache.memo(s, d, "simhash_sigs") {
        docs(s, d)
          .repartition(s.sparkContext.defaultParallelism) // one-split local file; see dedup_near
          .filter(size(Text.tokens(col("text"))) >= 3)
          .withColumn("toks", Text.tokens(col("text")))
          .select(col("doc_id"), simhashUdf(Text.shinglesOfTokens(col("toks"), 3)).as("sig"))
          .groupBy("sig")
          .agg(min(col("doc_id")).as("doc_id"),
            sort_array(collect_list(col("doc_id"))).as("members"))
          .cache()
      }
      // r19: same first-colliding-band predicate as dedup_near /
      // bandedCandidatePairs — one surviving join row per candidate pair,
      // no `.distinct()` aggregate+exchange, identical distinct set.
      val bands = sigs
        .select(col("doc_id"),
          array((0 until 4).map(b =>
            shiftright(col("sig"), b * 16).bitwiseAND(0xffffL)): _*).as("keys"))
        .select(col("doc_id"), col("keys"), posexplode(col("keys")))
        .toDF("id", "keys", "band", "key")
      val cand = bands.select(col("id").as("a_id"), col("keys").as("keys_a"),
          col("band"), col("key"))
        .join(bands.select(col("id").as("b_id"), col("keys").as("keys_b"),
          col("band").as("band_r"), col("key").as("key_r")),
          col("band") === col("band_r") && col("key") === col("key_r") &&
            col("a_id") < col("b_id"))
        .filter(org.apache.spark.sql.graft.BandOps
          .firstEqualIndex(col("keys_a"), col("keys_b")) === col("band"))
        .select("a_id", "b_id")
      // the hamming distance depends only on the two fingerprints, so
      // every member pair of a qualifying canonical pair shares it; an
      // identical-fingerprint class is trivially hamming 0
      val canonicalPairs = cand
        .join(sigs.select(col("doc_id").as("a_id"), col("sig").as("a_sig"),
          col("members").as("a_members")), "a_id")
        .join(sigs.select(col("doc_id").as("b_id"), col("sig").as("b_sig"),
          col("members").as("b_members")), "b_id")
        .withColumn("hamming",
          bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).cast("bigint"))
        .filter(col("hamming") <= 12)
      DupClasses.expand(canonicalPairs, sigs, "hamming", lit(0L))
        .orderBy("a_id", "b_id")
    },

    // L2e: duplicate clustering — connected components over the near-dup
    // pair graph, so each dup group collapses to one canonical doc (what a
    // pretraining pipeline actually keeps). Iterative min-label propagation:
    // each round joins labels to edges and takes the elementwise min — the
    // standard scalable CC (converges in O(diameter) rounds; dup components
    // are tiny cliques/chains, so 2–3). Every round is one shuffle on the
    // node id; no driver-side graph. The oracle recomputes components via
    // recursive transitive reachability in DuckDB.
    Op(
      "dedup_cluster",
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks)),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |p AS (SELECT a_id, b_id FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) pr
        |  JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
        |  WHERE inter / (ca.n + cb.n - inter) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |reach(node, r) AS (
        |  SELECT u, u FROM edges
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.node)
        |SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS canon_id
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // memoized: the converged label frame is the op's reusable product —
      // repeat invocations (Bench warm runs, Verify, specs) must not re-run
      // the loop or stack another cached copy per call
      val labels = ModelCache.memo(s, d, "cluster_labels") { clusterLabels(s, d) }
      labels.select(col("node").as("doc_id"), col("lbl").cast("bigint").as("canon_id"))
        .orderBy("doc_id")
    },

    // L2e output stage: the deduplicated corpus — drop every clustered doc
    // except its component's canonical (minimum) member; unclustered docs
    // pass through. One broadcast-able anti-join of the (tiny) non-canonical
    // id list against the corpus — the actual "write the kept docs" step of
    // a pretraining dedup pipeline. Scoped to the oracle corpus
    // (doc_id < 500) like the pair ops it derives from.
    Op(
      "dedup_canonical",
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks)),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |p AS (SELECT a_id, b_id FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) pr
        |  JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
        |  WHERE inter / (ca.n + cb.n - inter) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |reach(node, r) AS (
        |  SELECT u, u FROM edges
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.node),
        |drop_ids AS (SELECT node FROM reach GROUP BY node HAVING node <> MIN(r))
        |SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id < 500 AND doc_id NOT IN (SELECT node FROM drop_ids)
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val labels = ModelCache.memo(s, d, "cluster_labels") { clusterLabels(s, d) }
      val dropIds = labels.filter(col("node") =!= col("lbl")).select(col("node").as("doc_id"))
      docs(s, d).filter(col("doc_id") < 500)
        .join(broadcast(dropIds), Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    },

    // L2h: the end-to-end corpus-cleaning stage as ONE declarative plan —
    // what a pretraining pipeline actually ships: quality gate (token-count
    // bounds, the text_stats is_quality rule) ∘ near-dup removal (keep each
    // dup component's canonical doc). Composes the memoized cluster labels
    // with a narrow filter + broadcast anti-join; at 100 TB this whole op
    // is one scan of the corpus plus the (pair-sized) drop list. Scoped to
    // the oracle corpus like the dedup family it builds on.
    Op(
      "corpus_clean",
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks)),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |p AS (SELECT a_id, b_id FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) pr
        |  JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
        |  WHERE inter / (ca.n + cb.n - inter) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |reach(node, r) AS (
        |  SELECT u, u FROM edges
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.node),
        |drop_ids AS (SELECT node FROM reach GROUP BY node HAVING node <> MIN(r))
        |SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents
        |WHERE doc_id < 500
        |  AND len(string_split(text, ' ')) BETWEEN 20 AND 200
        |  AND doc_id NOT IN (SELECT node FROM drop_ids)
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val labels = ModelCache.memo(s, d, "cluster_labels") { clusterLabels(s, d) }
      val dropIds = labels.filter(col("node") =!= col("lbl")).select(col("node").as("doc_id"))
      val tk = Text.tokens(col("text"))
      docs(s, d).filter(col("doc_id") < 500)
        .filter(size(tk).between(20, 200))
        .join(broadcast(dropIds), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), size(tk).cast("bigint").as("n_tokens"))
        .orderBy("doc_id")
    },

    // Benchmark decontamination (the GPT-3/Llama eval-overlap gate): drop
    // every training document sharing ANY n-token shingle with the eval
    // set, so benchmark answers can't leak into the corpus. The eval set
    // is the deterministic doc_id % 100 = 7 slice (production passes a
    // real benchmark table — same plan). Shape: benchmark sets are BOUNDED
    // (they don't grow with the corpus), so their distinct gram set rides
    // as a one-row broadcast subtree and the corpus pass is a NARROW
    // arrays_overlap filter — one scan, zero fact shuffle, no corpus-side
    // explode (the earlier gram-join form shuffled every corpus gram twice
    // and cost 6.4 s where this runs in ~1). A benchmark too large to
    // broadcast as a set degrades to the join_bloom_prefiltered pattern:
    // same plan with a bloom of the grams and an exact recheck on hits.
    Op(
      "decontaminate",
      """WITH tl AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents),
        |g AS (SELECT DISTINCT doc_id, gram FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 3),
        |         i -> concat_ws(' ', l[i], l[i+1], l[i+2], l[i+3]))) AS gram FROM tl)),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 100 = 7),
        |contam AS (SELECT DISTINCT doc_id FROM g JOIN bench USING (gram)
        |           WHERE doc_id % 100 <> 7)
        |SELECT doc_id, lang, source FROM documents
        |WHERE doc_id % 100 <> 7 AND doc_id NOT IN (SELECT doc_id FROM contam)
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val isBench = col("doc_id") % 100 === 7
      // tokens materialize as a projected column so the gram lambda's n+2
      // references hit an attribute, not a re-evaluated split()
      val grams = Text.shinglesOfTokens(col("toks"), 4)
      val benchSet = docs(s, d).filter(isBench)
        .withColumn("toks", Text.tokens(lower(col("text"))))
        .select(explode(grams).as("gram"))
        .agg(collect_set(col("gram")).as("bench_grams"))
      docs(s, d).filter(!isBench)
        .withColumn("toks", Text.tokens(lower(col("text"))))
        .crossJoin(broadcast(benchSet))
        .filter(!arrays_overlap(grams, col("bench_grams")))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    },

    // Temperature-based domain mixing (the multilingual/domain re-weighting
    // step of every pretraining data recipe): sample each language at a
    // rate ∝ count^α / count (α = 0.5), so over-represented domains are
    // downsampled harder and the kept corpus flattens toward the
    // temperature-α distribution at overall keep fraction T = 0.5. The
    // per-language rate becomes an md5-prefix threshold (sample_consistent's
    // trick, 32-bit granularity), so membership is reproducible across
    // engines, partitionings and reruns — resampling never churns the kept
    // set. Determinism of the rates themselves: sqrt is correctly-rounded
    // IEEE in both engines, the sqrt-sum is decimal (order-independent),
    // the rate is rounded to 6 decimals before the threshold floor. One
    // count aggregate (bounded by #languages) rides back as a broadcast;
    // the corpus pass is a narrow filter — no fact shuffle at all.
    Op(
      "mix_temperature",
      """WITH cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang),
        |tot AS (SELECT SUM(CAST(sqrt(c) AS DECIMAL(18,6))) AS sw,
        |               CAST(SUM(c) AS BIGINT) AS n FROM cnt),
        |rate AS (SELECT lang,
        |           least(round(0.5 * n * (CAST(CAST(sqrt(c) AS DECIMAL(18,6)) AS DOUBLE)
        |                                  / CAST(sw AS DOUBLE)) / c, 6), 1.0) AS r
        |         FROM cnt, tot),
        |thr AS (SELECT lang,
        |          printf('%08x', CAST(least(floor(r * 4294967296), 4294967295) AS BIGINT)) AS h
        |        FROM rate)
        |SELECT d.doc_id, d.lang FROM documents d JOIN thr USING (lang)
        |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <= h
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val sqDec = sqrt(col("c")).cast("decimal(18,6)")
      val cnt = docs(s, d).groupBy("lang").agg(count(lit(1)).cast("bigint").as("c"))
      val tot = cnt.agg(sum(sqDec).as("sw"), sum(col("c")).cast("bigint").as("n"))
      val r = least(
        round(lit(0.5) * col("n") * (sqDec.cast("double") / col("sw").cast("double")) /
          col("c"), 6),
        lit(1.0))
      val thresholds = cnt.crossJoin(broadcast(tot))
        .select(col("lang"),
          format_string("%08x",
            least(floor(r * 4294967296.0).cast("bigint"), lit(4294967295L))).as("h"))
      docs(s, d)
        .join(broadcast(thresholds), Seq("lang"))
        .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8) <= col("h"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // L2k: corpus-level duplicated-n-gram statistics (the Gopher/RefinedWeb
    // "fraction of duplicated n-grams" signal, computed against the WHOLE
    // corpus rather than within one document — repetition_stats covers the
    // intra-doc form). Per doc: distinct 8-grams, the share of them that
    // occur in at least one OTHER document, i.e. boilerplate/copy coverage.
    // Plan: explode distinct grams, ONE window shuffle keyed by gram to
    // attach each gram's corpus document-frequency, one doc_id agg back.
    // Both shuffles carry (doc_id, gram, count) rows with full partial
    // aggregation; at 100 TB the gram key would be xxhash64(gram) (8 bytes
    // vs the 8-word string) — kept as the string here so the DuckDB oracle
    // groups the identical key. The fixture's planted near-dup docs surface
    // with dup_frac ≈ 1.0; organic text sits at 0.
    Op(
      "dup_ngram_corpus",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 8),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 7),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |                t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS s
        |  FROM toks)),
        |df AS (SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS nd FROM sh)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
        |       ROUND(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 4)
        |         AS dup_frac
        |FROM df GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // (r19 note: an aggregate-only form was tried and measured NOT a win —
      // grouping sets (s)/(doc_id) over the exploded grams in one Expand +
      // hash aggregate ("dup_grams = n_grams − df-1 grams", df-1 gram's
      // min(doc_id) = its owner), folding both consumers into one doc-keyed
      // aggregate. Oracle-identical, single featurize pass, no window sort —
      // but the Expand doubles the exploded rows through the partial
      // aggregate and full-suite wall went 0.47 → 0.67 s at equal cpu, so
      // the window stays. The gram strings stay the shuffle key for oracle
      // parity; at 100 TB the key would be xxhash64(gram).)
      //
      // (r20 note: the OTHER sort-free form — two separate branches, a
      // per-gram (count, min doc_id) hash aggregate + df=1 owner re-key
      // broadcast-joined against per-doc totals, no Expand — was ALSO
      // measured and reverted. Oracle-identical at sf0.01, but the
      // gram-keyed partial aggregate over mostly-unique 8-word string keys
      // plus the second featurize pass costs MORE than the window's one
      // sorted shuffle at every scale: full-suite 0.51→0.62 s wall /
      // 7.1→9.4 cpu-s, decade probes sf1 cold 1.51→2.54 s, sf10 cold
      // 2.01→5.99 s, sf10 steady 1.40→1.76 s. The driver-side r19 "0.64×
      // regression" that motivated the attempt was adjudicated machine
      // noise: two full-suite runs at the r19 head measured 0.514/0.566 s
      // wall, at the committed 0.500 s pin.)
      val exploded = docs(s, d)
        .filter(size(Text.tokens(col("text"))) >= 8)
        .repartition(s.sparkContext.defaultParallelism) // one-split local file; see dedup_near
        .withColumn("toks", Text.tokens(col("text")))
        .select(col("doc_id"), explode(Text.shinglesOfTokens(col("toks"), 8)).as("s"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("s")
      exploded
        .withColumn("nd", count(lit(1)).over(w))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).cast("bigint").as("n_grams"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).cast("bigint").as("dup_grams"))
        .withColumn("dup_frac",
          round(col("dup_grams") / col("n_grams").cast("double"), 4))
        .orderBy("doc_id")
    },

    // L2l: cross-corpus fuzzy join — match every corpus document against a
    // bounded probe/reference set (here sources src0–src4; in production a
    // benchmark suite, a canonical article set, a takedown list) by exact
    // 3-gram Jaccard ≥ 0.5. Candidate pairs come from the shared-shingle
    // inverted index with the PROBE side broadcast: the corpus is never
    // shuffled — each scan task intersects its documents' grams against the
    // broadcast probe grams, and only (probe, candidate, count) scalars
    // enter the one aggregation exchange. Precision and recall are both
    // exact (unlike dedup_near's banded LSH, which trades recall for a
    // smaller candidate space when BOTH sides are corpus-sized).
    Op(
      "fuzzy_join",
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, source, s FROM (
        |  SELECT doc_id, source, unnest(list_transform(generate_series(1, len(t) - 2),
        |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks)),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |probe AS (SELECT doc_id AS p_id, s FROM sh
        |          WHERE source IN ('src0','src1','src2','src3','src4')),
        |hits AS (SELECT p_id, sh.doc_id AS c_id, COUNT(*) AS inter
        |         FROM probe JOIN sh ON probe.s = sh.s AND probe.p_id <> sh.doc_id
        |         GROUP BY 1, 2)
        |SELECT p_id, c_id, ROUND(inter / (cp.n + cc.n - inter), 4) AS jaccard
        |FROM hits JOIN cnt cp ON cp.doc_id = p_id JOIN cnt cc ON cc.doc_id = c_id
        |WHERE inter / (cp.n + cc.n - inter) >= 0.5
        |ORDER BY p_id, c_id""".stripMargin
    ) { (s, d) =>
      // memoize the (tiny, probe-bounded) MATCH LIST, not the corpus-sized
      // shingled frame: the featurized parent caches only for the duration
      // of the one materializing pass, then unpins (same discipline as
      // pairStats — session-lived corpus-sized cache blocks are the thing
      // to avoid)
      val matches = ModelCache.memo(s, d, "fuzzy_pairs") {
        val (pairs, sh) = fuzzyMatches(s, d)
        val pinned = pairs.cache()
        pinned.count()
        sh.unpersist()
        pinned
      }
      matches.orderBy("p_id", "c_id")
    },

    // L2o: temperature EPOCH mixing — the upsampling half of domain
    // re-weighting (mix_temperature only downsamples; real recipes also
    // REPEAT tail domains, the per-source epoch counts of every published
    // data mixture). Each language's target rate r = 1.5·N·p_α(lang)/count
    // (α = 0.5 temperature target, corpus upsampled 1.5× overall) can
    // exceed 1: every doc emits floor(r) copies plus one more for the
    // md5-selected frac(r) slice — the same 32-bit-threshold determinism
    // trick as mix_temperature, so membership is reproducible across
    // engines/partitionings. The copy fan-out is a narrow generate
    // (posexplode of a sequence) — no shuffle; rate math is decimal-exact.
    Op(
      "mix_epochs",
      """WITH cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang),
        |tot AS (SELECT SUM(CAST(sqrt(c) AS DECIMAL(18,6))) AS sw,
        |               CAST(SUM(c) AS BIGINT) AS n FROM cnt),
        |rate AS (SELECT lang,
        |           round(1.5 * n * (CAST(CAST(sqrt(c) AS DECIMAL(18,6)) AS DOUBLE)
        |                            / CAST(sw AS DOUBLE)) / c, 6) AS r
        |         FROM cnt, tot),
        |thr AS (SELECT lang, CAST(floor(r) AS BIGINT) AS base,
        |          printf('%08x', CAST(least(floor((r - floor(r)) * 4294967296), 4294967295)
        |                              AS BIGINT)) AS h
        |        FROM rate),
        |nc AS (SELECT d.doc_id, d.lang,
        |         base + CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <= h
        |                     THEN 1 ELSE 0 END AS n_copies
        |       FROM documents d JOIN thr USING (lang))
        |SELECT doc_id, lang, CAST(unnest(range(n_copies)) AS BIGINT) AS copy_id
        |FROM nc WHERE n_copies > 0
        |ORDER BY doc_id, copy_id""".stripMargin
    ) { (s, d) =>
      val sqDec = sqrt(col("c")).cast("decimal(18,6)")
      val cnt = docs(s, d).groupBy("lang").agg(count(lit(1)).cast("bigint").as("c"))
      val tot = cnt.agg(sum(sqDec).as("sw"), sum(col("c")).cast("bigint").as("n"))
      val r = round(
        lit(1.5) * col("n") * (sqDec.cast("double") / col("sw").cast("double")) / col("c"), 6)
      val thr = cnt.crossJoin(broadcast(tot))
        .select(col("lang"),
          floor(r).cast("bigint").as("base"),
          format_string("%08x",
            least(floor((r - floor(r)) * 4294967296.0).cast("bigint"),
              lit(4294967295L))).as("h"))
      docs(s, d)
        .join(broadcast(thr), Seq("lang"))
        .withColumn("n_copies",
          col("base") + when(
            substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8) <= col("h"),
            1L).otherwise(0L))
        .filter(col("n_copies") > 0)
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_id"))
        .orderBy("doc_id", "copy_id")
    },

    // L2q: STRATIFIED sampling — exactly K docs per language, the balanced
    // eval-slice / per-domain-calibration draw every data pipeline needs
    // next to the rate-based mixers (mix_temperature keeps a FRACTION per
    // stratum; this keeps a COUNT). Selection order is md5(doc_id), so the
    // draw is uniform-at-random yet reproducible across engines,
    // partitionings and reruns — growing the corpus only appends/evicts at
    // the md5 boundary, it never reshuffles the kept set. Scale path is
    // Spark's own WindowGroupLimit pushdown: the rank-≤-K filter over
    // row_number turns into a per-mapper partial top-K BEFORE the
    // lang-keyed exchange, so the shuffle carries ~K rows per language per
    // mapper, not the corpus (PlanSpec pins the pushdown) — and a skewed
    // giant language costs its mappers, not one reducer.
    Op(
      "sample_stratified",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 50 ORDER BY lang, rk""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      docs(s, d)
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang")
            .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))))
        .filter(col("rk") <= 50)
        .select(col("doc_id"), col("lang"), col("rk").cast("bigint").as("rk"))
        .orderBy("lang", "rk")
    },

    // L2n: asymmetric CONTAINMENT pairs — |A∩B| / |A|, the directional
    // cousin of Jaccard that catches a short document quoted INSIDE a long
    // one (Jaccard punishes the size mismatch; containment of the smaller
    // side stays ≈ 1). Same inverted-index candidate generation as
    // dedup_ngram (shared memoized shingle frames — zero extra featurize
    // cost in a session that ran the dedup family), thresholded on
    // max(containment(a→b), containment(b→a)) ≥ 0.8 so the emitted pair
    // list is orientation-annotated: which side is the contained one.
    Op(
      "dedup_containment",
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks)),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |       ROUND(greatest(inter / CAST(ca.n AS DOUBLE), inter / CAST(cb.n AS DOUBLE)), 4)
        |         AS containment,
        |       CASE WHEN ca.n <= cb.n THEN a_id ELSE b_id END AS contained_id
        |FROM pairs JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
        |WHERE greatest(inter / CAST(ca.n AS DOUBLE), inter / CAST(cb.n AS DOUBLE)) >= 0.8
        |ORDER BY a_id, b_id""".stripMargin
    ) { (s, d) =>
      // the shared once-per-session CANONICAL pair statistics, thresholded
      // on the containment definition instead of Jaccard. Expansion carries
      // each side's shingle-set size so contained_id (the smaller-set
      // member) re-orients correctly when least/greatest swaps a pair.
      val qualified = pairStats(s, d)
        .withColumn("containment",
          greatest(col("inter") / col("na"), col("inter") / col("nb")))
        .filter(col("containment") >= 0.8)
      val cross = qualified
        .select(col("containment"), col("na"), col("nb"),
          explode(col("a_members")).as("ma"), col("b_members"))
        .select(col("containment"), col("na"), col("nb"), col("ma"),
          explode(col("b_members")).as("mb"))
        .select(
          least(col("ma"), col("mb")).as("a_id"),
          greatest(col("ma"), col("mb")).as("b_id"),
          col("containment"),
          when(col("ma") < col("mb"), col("na")).otherwise(col("nb")).as("an"),
          when(col("ma") < col("mb"), col("nb")).otherwise(col("na")).as("bn"))
      // within-class: identical sets — containment exactly 1, equal sizes
      // (ties resolve to the lesser id, the oracle's CASE convention)
      val within = ngramClasses(s, d).filter(size(col("members")) >= 2)
        .select(col("n"), explode(col("members")).as("ma"), col("members"))
        .select(col("n"), col("ma"), explode(col("members")).as("mb"))
        .filter(col("ma") < col("mb"))
        .select(col("ma").as("a_id"), col("mb").as("b_id"),
          lit(1.0).as("containment"), col("n").as("an"), col("n").as("bn"))
      cross.unionByName(within)
        .select(col("a_id"), col("b_id"),
          round(col("containment"), 4).as("containment"),
          when(col("an") <= col("bn"), col("a_id")).otherwise(col("b_id")).as("contained_id"))
        .orderBy("a_id", "b_id")
    },

    // Corpus-wide PARAGRAPH-level exact dedup — the CCNet/RefinedWeb step
    // that removes repeated boilerplate (headers, license blocks, quoted
    // passages) WITHIN surviving documents instead of dropping whole docs:
    // every paragraph keeps only its FIRST corpus occurrence (ordered by
    // doc_id, position) and documents are reassembled from their kept
    // paragraphs. The fixture's texts carry no structural separators, so
    // "paragraph" is a fixed 16-token segment — the same surrogate the
    // exact-substring-dedup line of work (segment/window hashing) uses on
    // unstructured text; the geometry is one shared constant with the
    // oracle. Cost is LINEAR, not pairwise: one exchange keyed by the
    // segment (first-occurrence rank), one doc_id agg to reassemble — the
    // same two-exchange shape as dup_ngram_corpus. At 100 TB the rank key
    // becomes xxhash64(segment) and the reassembly re-derives segment text
    // from the doc row, so the wide shuffle carries only scalars; at
    // fixture scale the text rides the exchange for oracle parity (DuckDB
    // has no xxhash64).
    Op(
      "dedup_paragraph",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |segs AS (
        |  SELECT doc_id, i AS seg_idx,
        |         array_to_string(toks[i * 16 + 1 : i * 16 + 16], ' ') AS seg
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(0, (len(toks) - 1) // 16)) AS i FROM t)),
        |ranked AS (
        |  SELECT doc_id, seg_idx, seg,
        |         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
        |  FROM segs)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |       string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup
        |FROM ranked WHERE rn = 1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val segLen = 16
      val segs = docs(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), posexplode(transform(
          sequence(lit(0), floor((size(col("toks")) - 1) / segLen).cast("int")),
          i => array_join(slice(col("toks"), i * segLen + 1, lit(segLen)), " "))))
        .toDF("doc_id", "seg_idx", "seg")
      // (r19 note: a groupBy(seg).agg(min(struct(doc_id, seg_idx))) — the
      // aggregate-only first-occurrence — was tried and measured SLOWER:
      // struct minima are not hash-aggregable, so Spark plans a
      // SortAggregate with a sort on BOTH sides of the exchange, vs the
      // window's one per-partition sort. Kept as the window.)
      import org.apache.spark.sql.expressions.Window
      segs
        .withColumn("rn", row_number().over(
          Window.partitionBy("seg").orderBy("doc_id", "seg_idx")))
        .filter(col("rn") === 1)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).cast("bigint").as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
            x => x.getField("seg")), " ").as("text_dedup"))
        .orderBy("doc_id")
    },

    // THE WHOLE RECIPE AS ONE PLAN: quality gate (Gopher rules) →
    // benchmark decontamination → near-dup canonical removal → temperature
    // language mixing — the four stages every pretraining corpus passes
    // through, composed declaratively so Catalyst sees one dataflow (each
    // stage's drop set attaches as a semi/anti join or a narrow broadcast
    // filter; nothing materializes between stages, and the mixing rates
    // are computed over the CLEANED corpus, as a real recipe orders it).
    // Stage costs are exactly the standalone ops': two doc-keyed quality
    // aggregations, a one-row broadcast gram set, the memoized pair-graph
    // labels, one bounded language-count aggregate. Scoped to the oracle
    // corpus (doc_id < 500) like the dedup family it builds on.
    Op(
      "corpus_pipeline",
      s"""WITH RECURSIVE
        |tokq AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |cq AS (SELECT doc_id, tok, COUNT(*) AS c FROM tokq GROUP BY 1, 2),
        |sig AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |         ROUND(SUM(c * len(tok)) / CAST(SUM(c) AS DOUBLE), 4) AS mean_tok_len,
        |         CAST(SUM(CASE WHEN tok IN (${Text.stopSqlList})
        |                       THEN c ELSE 0 END) AS BIGINT) AS stop_cnt,
        |         ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 4) AS top_frac,
        |         ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 4) AS ttr
        |  FROM cq GROUP BY doc_id),
        |ok AS (SELECT doc_id FROM sig
        |       WHERE n_tokens BETWEEN ${Text.qMinTok} AND ${Text.qMaxTok}
        |         AND mean_tok_len BETWEEN ${Text.qMinLen} AND ${Text.qMaxLen}
        |         AND stop_cnt >= ${Text.qMinStop} AND top_frac <= ${Text.qMaxTopFrac}
        |         AND ttr >= ${Text.qMinTtr}),
        |tl AS (SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents),
        |g AS (SELECT DISTINCT doc_id, gram FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 3),
        |         i -> concat_ws(' ', l[i], l[i+1], l[i+2], l[i+3]))) AS gram FROM tl)),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 100 = 7),
        |contam AS (SELECT DISTINCT doc_id FROM g JOIN bench USING (gram)
        |           WHERE doc_id % 100 <> 7),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |              WHERE doc_id < 500 AND len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks)),
        |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |p AS (SELECT a_id, b_id FROM (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2) pr
        |  JOIN cnt ca ON ca.doc_id = a_id JOIN cnt cb ON cb.doc_id = b_id
        |  WHERE inter / (ca.n + cb.n - inter) >= 0.5),
        |edges AS (SELECT a_id AS u, b_id AS v FROM p UNION SELECT b_id, a_id FROM p),
        |reach(node, r) AS (
        |  SELECT u, u FROM edges
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.node),
        |drop_ids AS (SELECT node FROM reach GROUP BY node HAVING node <> MIN(r)),
        |cleaned AS (
        |  SELECT d.doc_id, d.lang, d.source FROM documents d
        |  WHERE d.doc_id < 500
        |    AND d.doc_id IN (SELECT doc_id FROM ok)
        |    AND d.doc_id % 100 <> 7
        |    AND d.doc_id NOT IN (SELECT doc_id FROM contam)
        |    AND d.doc_id NOT IN (SELECT node FROM drop_ids)),
        |cnt2 AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM cleaned GROUP BY lang),
        |tot AS (SELECT SUM(CAST(sqrt(c) AS DECIMAL(18,6))) AS sw,
        |               CAST(SUM(c) AS BIGINT) AS n FROM cnt2),
        |rate AS (SELECT lang,
        |           least(round(0.5 * n * (CAST(CAST(sqrt(c) AS DECIMAL(18,6)) AS DOUBLE)
        |                                  / CAST(sw AS DOUBLE)) / c, 6), 1.0) AS r
        |         FROM cnt2, tot),
        |thr AS (SELECT lang,
        |          printf('%08x', CAST(least(floor(r * 4294967296), 4294967295) AS BIGINT)) AS h
        |        FROM rate)
        |SELECT c.doc_id, c.lang, c.source FROM cleaned c JOIN thr USING (lang)
        |WHERE substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 8) <= h
        |ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      // stage 1 — quality gate (exact quality_filter rules, rounded before
      // comparison so the decision cannot flip between engines)
      val cnts = docs(s, d)
        .select(col("doc_id"), explode(Text.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val okIds = cnts.groupBy("doc_id")
        .agg(
          sum("c").as("n"), count(lit(1)).as("dn"), max("c").as("tc"),
          sum(col("c") * length(col("tok"))).as("cs"),
          sum(when(col("tok").isin(Text.stopwords: _*), col("c")).otherwise(0L)).as("sc"))
        .select(
          col("doc_id"),
          col("n").cast("bigint").as("n_tokens"),
          round(col("cs") / col("n").cast("double"), 4).as("mlen"),
          col("sc").cast("bigint").as("stop_cnt"),
          round(col("tc") / col("n").cast("double"), 4).as("top_frac"),
          round(col("dn") / col("n").cast("double"), 4).as("ttr"))
        .filter(col("n_tokens").between(Text.qMinTok, Text.qMaxTok) &&
          col("mlen").between(Text.qMinLen, Text.qMaxLen) &&
          col("stop_cnt") >= Text.qMinStop && col("top_frac") <= Text.qMaxTopFrac &&
          col("ttr") >= Text.qMinTtr)
        .select("doc_id")
      // stage 2 — decontamination (1-row broadcast gram set, narrow filter)
      val isBench = col("doc_id") % 100 === 7
      val grams = Text.shinglesOfTokens(col("toks"), 4)
      val benchSet = docs(s, d).filter(isBench)
        .withColumn("toks", Text.tokens(lower(col("text"))))
        .select(explode(grams).as("gram"))
        .agg(collect_set(col("gram")).as("bench_grams"))
      // stage 3 — near-dup canonical drop list (memoized pair-graph labels)
      val labels = ModelCache.memo(s, d, "cluster_labels") { clusterLabels(s, d) }
      val dropIds = labels.filter(col("node") =!= col("lbl")).select(col("node").as("doc_id"))
      val cleaned = docs(s, d).filter(col("doc_id") < 500 && !isBench)
        .join(okIds, Seq("doc_id"), "left_semi")
        .withColumn("toks", Text.tokens(lower(col("text"))))
        .crossJoin(broadcast(benchSet))
        .filter(!arrays_overlap(grams, col("bench_grams")))
        .join(broadcast(dropIds), Seq("doc_id"), "left_anti")
        .select("doc_id", "lang", "source")
      // stage 4 — temperature mixing, rates over the CLEANED corpus
      val sqDec = sqrt(col("c")).cast("decimal(18,6)")
      val cnt2 = cleaned.groupBy("lang").agg(count(lit(1)).cast("bigint").as("c"))
      val tot = cnt2.agg(sum(sqDec).as("sw"), sum(col("c")).cast("bigint").as("n"))
      val r = least(
        round(lit(0.5) * col("n") * (sqDec.cast("double") / col("sw").cast("double")) /
          col("c"), 6),
        lit(1.0))
      val thresholds = cnt2.crossJoin(broadcast(tot))
        .select(col("lang"),
          format_string("%08x",
            least(floor(r * 4294967296.0).cast("bigint"), lit(4294967295L))).as("h"))
      cleaned
        .join(broadcast(thresholds), Seq("lang"))
        .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8) <= col("h"))
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }
  )

  /** The fuzzy_join pipeline WITHOUT memoization — exposed so PlanSpec can
    * assert the computation's physical shape (broadcast probe, single
    * keyed exchange) directly; the op wraps this in a memo that pins only
    * the bounded match list. Returns (match list, the transiently-cached
    * featurized parent to unpersist after materializing).
    */
  private[graft] def fuzzyMatches(s: SparkSession, d: String): (DataFrame, DataFrame) =
    fuzzyMatches(docs(s, d))

  /** Source-parameterized form: PlanSpec passes an UNCACHED raw read here —
    * a plan built over the session-cached fixture would be silently
    * substituted by the CacheManager with the already-materialized memo's
    * InMemoryRelation, hiding the very shape the test pins.
    */
  private[graft] def fuzzyMatches(docsDf: DataFrame): (DataFrame, DataFrame) = {
    val probeSources = Seq("src0", "src1", "src2", "src3", "src4")
    val sh = docsDf
      .filter(size(Text.tokens(col("text"))) >= 3)
      .repartition(docsDf.sparkSession.sparkContext.defaultParallelism) // one-split local file; see dedup_near
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        Text.shinglesOfTokens(col("toks"), 3).as("sh"))
      .cache()
    val corpus = sh.select(col("doc_id").as("c_id"), explode(col("sh")).as("s"))
    val probe = broadcast(
      sh.filter(col("source").isin(probeSources: _*))
        .select(col("doc_id").as("p_id"), explode(col("sh")).as("s2")))
    val cnt = sh.select(col("doc_id"), size(col("sh")).cast("bigint").as("n"))
    val pairs = corpus
      .join(probe, col("s") === col("s2") && col("p_id") =!= col("c_id"))
      .groupBy("p_id", "c_id").agg(count(lit(1)).cast("double").as("inter"))
      .join(cnt.toDF("p_id", "np"), "p_id")
      .join(cnt.toDF("c_id", "nc"), "c_id")
      .withColumn("jaccard", col("inter") / (col("np") + col("nc") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("p_id"), col("c_id"), round(col("jaccard"), 4).as("jaccard"))
    (pairs, sh)
  }

  /** Pair graphs at or below this many pairs run connected components as a
    * driver-side union-find (one bounded collect, microseconds of CPU, zero
    * iterative jobs) instead of distributed label propagation, whose
    * per-round shuffle/action overhead dominates on small graphs. Collected
    * rows are boxed (~150 B per pair with the Row wrapper and tuple), so
    * 200k pairs ≈ 30 MB transient on the driver — sampleCap-scale. The
    * scoped fixture graphs (≤ C(500,2) ≈ 125k pairs) stay under the cap;
    * larger graphs take the propagation path (pinned by DedupGraphSpec).
    */
  private val unionFindPairCap = 200000L

  /** Canonicalized near-dup EDGE set for the clustering ops (connected
    * components): exact-duplicate classes (identical distinct-shingle sets
    * — pairwise Jaccard exactly 1) collapse to one canonical doc BEFORE
    * the inverted-index pair join, qualify as canonical pairs, and re-enter
    * the graph as spanning stars ([[DupClasses.starEdges]]) instead of
    * |A|×|B| member-pair expansions. Components (and therefore labels) are
    * identical to the full pair graph's; edges are LINEAR in class size,
    * so a heavily-boilerplated corpus no longer feeds a quadratic edge set
    * to label propagation. The pair-contract ops (dedup_ngram /
    * dedup_containment / dedup_near / dedup_simhash) keep their full
    * expansions — there the pair set IS the output.
    */
  private def clusterEdges(s: SparkSession, d: String): DataFrame =
    ModelCache.memo(s, d, "cluster_edges") {
      // the canonical pair stats are the family's shared self-join; CC
      // only needs the qualifying canonical pairs plus class stars
      val canonicalPairs = pairStats(s, d)
        .filter(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.5)
        .select("a_id", "b_id")
      val edges = DupClasses.starEdges(canonicalPairs, ngramClasses(s, d)).cache()
      edges.count()
      edges
    }

  /** Converged min-label frame (node, lbl) over the near-dup pair graph.
    * Returned cached; intermediates and the edge frame are unpersisted.
    */
  private def clusterLabels(s: SparkSession, d: String): DataFrame = {
    val pairs = clusterEdges(s, d).select("a_id", "b_id")
    if (pairs.count() <= unionFindPairCap) {
      // union-find with path compression; attaching the larger root under
      // the smaller makes every root the component MINIMUM — the same
      // invariant the propagation loop converges to
      val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      import s.implicits._
      return nodes.toSeq.map(n => (n, find(n))).toDF("node", "lbl").cache()
    }
    propagateLabels(pairs)
  }

  /** Distributed min-label propagation — the at-scale CC path (graphs above
    * [[unionFindPairCap]]); DedupGraphSpec pins it against union-find on a
    * synthetic graph since the fixtures' pair graphs are all small.
    */
  private[graft] def propagateLabels(pairs: DataFrame): DataFrame = {
    val edges = pairs.union(pairs.select(col("b_id"), col("a_id")))
      .toDF("u", "v").cache()
    var labels = edges.select(col("u").as("node")).distinct()
      .withColumn("lbl", col("node")).cache()
    // labels only ever decrease, so the label sum strictly decreases while
    // anything changes — ONE scalar action per round detects convergence
    // (vs a join-and-count diff, which doubles the per-round job count).
    // coalesce covers the empty graph (sum over 0 rows is NULL, and an
    // empty corpus must yield an empty result, not an NPE).
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("lbl"), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    var rounds = 0
    var converged = prevSum == 0L && labels.isEmpty
    val maxRounds = 50 // propagation moves one hop per round (≈ diameter)
    while (!converged && rounds < maxRounds) {
      val next = edges.join(labels, edges("v") === labels("node"))
        .select(col("u").as("node"), col("lbl"))
        .union(labels)
        .groupBy("node").agg(min("lbl").as("lbl"))
        .cache()
      val sumNow = labelSum(next)
      labels.unpersist()
      labels = next
      converged = sumNow == prevSum
      prevSum = sumNow
      rounds += 1
    }
    edges.unpersist()
    // a silent non-converged exit would emit labels that are NOT the
    // component minimum (split dup groups, oracle mismatch) — fail loudly
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"dedup_cluster: min-label propagation not converged after $maxRounds rounds " +
          "(component diameter exceeds the cap)")
    }
    labels
  }
}
