package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable QUANTILE sketch state (r16 — the member completing the stored
  * sketch trio next to HLL distinct blobs and CMS frequency blobs): a
  * Greenwald–Khanna summary per group, serialized as a KB-sized binary
  * blob a warehouse stores per partition/day. Any later rollup merges the
  * blobs and queries percentiles WITHOUT rescanning — `approx_percentile`
  * answers one query; stored summaries answer every future rollup.
  *
  * The structure is Spark's own [[QuantileSummaries]] (the engine behind
  * `df.stat.approxQuantile`), which is mergeable by construction with the
  * GK guarantee: a queried quantile's TRUE rank lies within
  * relativeError × count of the target rank, and merging preserves the
  * bound. That rank bound is what the spec gates (the same
  * two-sided-guarantee discipline as the CMS op) — no sampling-based
  * estimator could pass it deterministically.
  *
  * Runs as a typed Aggregator, so Spark executes it partial + final
  * (map-side combine) like any built-in; the buffer serializes between
  * stages via java serialization (QuantileSummaries is Serializable).
  * Reference posture: deepdb-public answers percentile asks from model
  * state rather than rescans — this is the exact-plane warehouse analog.
  */
object QuantileState extends Aggregator[Double, QuantileSummaries, Array[Byte]] {

  /** Rank-error budget: |rank(est) − q·n| ≤ eps·n, preserved under merge. */
  val eps: Double = 0.001

  override def zero: QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold, eps)

  override def reduce(b: QuantileSummaries, x: Double): QuantileSummaries =
    b.insert(x)

  // GK merge requires compressed operands (the head buffer must be folded
  // into the sampled array first)
  override def merge(a: QuantileSummaries, b: QuantileSummaries): QuantileSummaries =
    a.compress().merge(b.compress())

  override def finish(b: QuantileSummaries): Array[Byte] = serialize(b.compress())

  override def bufferEncoder: Encoder[QuantileSummaries] =
    Encoders.javaSerialization[QuantileSummaries]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  def serialize(qs: QuantileSummaries): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    try oos.writeObject(qs) finally oos.close()
    bos.toByteArray
  }

  def deserialize(blob: Array[Byte]): QuantileSummaries = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(blob))
    try ois.readObject().asInstanceOf[QuantileSummaries] finally ois.close()
  }

  /** Percentile point queries against a (compressed) summary; an empty
    * summary yields NaN — the caller's SQL-NULL analog for a group with no
    * rows, which the stored-state ops never produce (their groups come
    * from the data itself).
    */
  def quantile(qs: QuantileSummaries, q: Double): Double =
    qs.query(q).getOrElse(Double.NaN)
}
