package graft.rspn

import org.apache.spark.sql.{DataFrame, Row}

/** Streaming model maintenance — M11's incremental insert driven by a live
  * stream. The reference's `aqp_spn.py::learn_incremental` assumes someone
  * hands it the new tuples; on Spark the natural "someone" is Structured
  * Streaming's `foreachBatch`, which delivers each micro-batch exactly once
  * per `batchId` (and MAY re-deliver a batch after a failure — hence the
  * ledger below). Usage:
  *
  * {{{
  *   val up = new SpnStreamUpdater(initialRoot, encode)
  *   events.writeStream.foreachBatch(up.apply _).start()
  *   ...
  *   Spn.prob(up.root, ranges)   // consistent snapshot, any time
  * }}}
  *
  * Design notes:
  *   - **Snapshot isolation for free.** `insertBatch` is copy-on-write, so
  *     `root` always returns a complete immutable tree; readers racing an
  *     update see either the pre- or post-batch model, never a torn one.
  *     This is the property that lets the estimator keep answering queries
  *     WHILE the stream runs — the reference's single-process update has
  *     nothing to say here.
  *   - **Idempotent re-delivery.** foreachBatch's contract is at-least-once
  *     per batchId on failure/retry; inserting a batch twice would double
  *     its weight in every leaf. The updater records the last applied
  *     batchId and drops replays — the same lastBatchId discipline every
  *     transactional foreachBatch sink documents.
  *   - **Driver-sized batches.** Rows collect to the driver because the
  *     update algorithm (like the reference's) is a single-machine
  *     tree-routing pass; a micro-batch is trigger-bounded, which is what
  *     makes this admissible where a full-table collect is not. At 100 TB
  *     the stream's RATE is the knob, not its total volume — and a
  *     firehose batch should be sampled exactly as training samples
  *     (Ensemble.sampleCap), trading CI width for bounded driver work.
  *   - `nRows` tracks the TOTAL ingested row count (pre-sampling scale
  *     factor — the `scaleRows` analog for estimates over the stream).
  */
final class SpnStreamUpdater(
    init: SpnNode,
    encode: Row => Array[Double],
    initRows: Long = 0L) {

  // (last applied batchId, total ingested rows, model root) — swapped
  // atomically under the lock; read without it (volatile snapshot)
  @volatile private var state: (Long, Long, SpnNode) = (-1L, initRows, init)

  /** Current model snapshot — immutable, safe to estimate against. */
  def root: SpnNode = state._3

  /** Total rows ingested (initial + every applied batch). */
  def nRows: Long = state._2

  /** Last applied batchId, -1 before the first batch. */
  def lastBatchId: Long = state._1

  /** The `foreachBatch` body. Serialized: micro-batches for one query
    * arrive in order, but two queries sharing an updater must not
    * interleave tree rebuilds.
    */
  def apply(batch: DataFrame, batchId: Long): Unit = synchronized {
    val (last, n, node) = state
    if (batchId <= last) return // re-delivered batch: already in the model
    val rows = batch.collect().map(encode)
    state = (batchId, n + rows.length, Update.insertBatch(node, rows))
  }
}
