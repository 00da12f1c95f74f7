package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared member-expansion for duplicate-class-canonicalized LSH dedup
  * (cosineLshPairs / dedup_near / dedup_simhash): after banding and the
  * exact recheck run over UNIQUE inputs, the duplicate classes re-expand
  * into the raw pair set — every member pair of a qualifying canonical
  * pair carries the canonical pair's metric (members are byte-identical
  * to their canonical), and within-class pairs carry the class's
  * self-metric. One implementation so the ma<mb dedup and the
  * least/greatest ordering can never diverge across the three ops.
  */
object DupClasses {

  /** `canonicalPairs` must carry `metric`, `a_members`, `b_members`
    * (already filtered to qualifying pairs); `classes` must carry
    * `members` and whatever `withinMetric` reads, PRE-FILTERED by the
    * op's own threshold on the self-metric. Returns (a_id, b_id, metric).
    */
  def expand(
      canonicalPairs: DataFrame,
      classes: DataFrame,
      metric: String,
      withinMetric: Column): DataFrame = {
    val cross = canonicalPairs
      .select(col(metric), explode(col("a_members")).as("ma"), col("b_members"))
      .select(col(metric), col("ma"), explode(col("b_members")).as("mb"))
      .select(least(col("ma"), col("mb")).as("a_id"),
        greatest(col("ma"), col("mb")).as("b_id"), col(metric))
    val within = classes.filter(size(col("members")) >= 2)
      .select(withinMetric.as(metric), explode(col("members")).as("ma"), col("members"))
      .select(col(metric), col("ma"), explode(col("members")).as("mb"))
      .filter(col("ma") < col("mb"))
      .select(col("ma").as("a_id"), col("mb").as("b_id"), col(metric))
    cross.unionByName(within)
  }

  /** Spanning-STAR edge set for connected components over duplicate-class-
    * canonicalized pairs — the clustering-path alternative to [[expand]]:
    * one edge per qualifying canonical pair plus one `canonical → member`
    * edge per member of every multi-member class. The components are
    * IDENTICAL to the fully-expanded member-pair graph's (a class is
    * internally connected through its canonical — exact duplicates are
    * near-dups of themselves under the callers' metrics, Jaccard/Hamming
    * of identical feature sets; cross-class connectivity rides the
    * canonical pair, whose member biclique the star replaces), while the
    * edge count stays LINEAR in class size: a million-copy boilerplate
    * class contributes 10⁶ star edges instead of the ~10¹² member pairs
    * that would otherwise feed label propagation at 100 TB.
    * `canonicalPairs` must carry (a_id, b_id) already filtered to
    * qualifying pairs; `classes` must carry `doc_id` (the canonical =
    * class minimum) and `members`.
    */
  def starEdges(canonicalPairs: DataFrame, classes: DataFrame): DataFrame = {
    val cross = canonicalPairs.select(col("a_id"), col("b_id"))
    val stars = classes.filter(size(col("members")) >= 2)
      .select(col("doc_id").as("a_id"), explode(col("members")).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
    cross.unionByName(stars)
  }
}
