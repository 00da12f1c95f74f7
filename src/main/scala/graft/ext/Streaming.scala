package graft.ext

import graft.Op
import graft.schema.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table (SURVEY §2.10, T1–T5).
  *
  * Each transform is written against a plain DataFrame so the SAME function
  * runs in batch (declared below, DuckDB-checkable) and on a streaming
  * source (`readStream`/MemoryStream — exercised in StreamingSpec with
  * watermarks). That is Structured Streaming's core contract: one plan,
  * incrementalized by the engine.
  */
object Streaming {

  private def events(s: SparkSession, d: String): DataFrame = Tables(s, d, "events")

  /** T1: 1-hour tumbling windows per event_type. */
  def tumbling(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** T2: 1-hour windows sliding every 15 minutes. */
  def sliding(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))

  /** T3: per-user session windows with a 30-minute inactivity gap. */
  def session(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"), col("session_window.start").as("session_start"), col("cnt"))

  /** T11: per-window top-k event types. The COUNTS are the incremental
    * part — the same tumbling aggregation Structured Streaming maintains in
    * state; the RANK is a presentation step over each window's final counts
    * that streaming execution runs inside `foreachBatch` on watermark-closed
    * windows (rank windows aren't incrementalizable, so production top-k
    * always splits exactly here — StreamingSpec drives that split over a
    * MemoryStream). Batch execution folds both into one plan: the agg and
    * the rank share the window-key grain. Ties break by event_type so the
    * cut is deterministic cross-engine.
    */
  def topkPerWindow(ev: DataFrame, k: Int = 3): DataFrame =
    rankTopK(
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("win_start"), col("event_type"), col("cnt")),
      k)

  /** Rank step of [[topkPerWindow]], shared with the streaming form's
    * foreachBatch so batch and stream cannot drift.
    */
  def rankTopK(counts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("win_start").orderBy(col("cnt").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
  }

  /** T6: stream-static enrichment — the canonical streaming-ingest pattern
    * at scale: the unbounded side joins a broadcast dimension statelessly
    * (Structured Streaming allows a static DataFrame on either side of an
    * inner join with no watermark/state).
    */
  def enrich(ev: DataFrame, customers: DataFrame): DataFrame =
    ev.join(broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("cnt"))

  /** T7: arbitrary stateful processing (`mapGroupsWithState`) — per-user
    * running event counts whose state persists across micro-batches. In
    * batch execution state starts empty and each group is processed once,
    * so the result equals a plain GROUP BY count (the DuckDB oracle);
    * StreamingSpec proves the cross-batch accumulation.
    */
  def runningCounts(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import s.implicits._
    ev.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (user, total)
      }
      .toDF("user_id", "cnt")
  }

  /** An in-flight session for [[sessionize]]: epoch-micro bounds + count.
    * Lives in `GroupState` across micro-batches in streaming execution.
    */
  case class OpenSession(startU: Long, lastU: Long, cnt: Long)

  /** T9: gap-based sessionization via `flatMapGroupsWithState` — the
    * hand-rolled analog of `session_window` (T3) for when per-session logic
    * outgrows the built-in (custom emission, session-local features). One
    * shared fold serves both executions:
    *
    *  - batch (`emitOpen = true`): each user is seen once, open sessions are
    *    flushed inline → result equals the gaps-and-islands oracle AND
    *    `session_window`'s output by construction;
    *  - streaming (`emitOpen = false`, EventTimeTimeout): closed sessions
    *    emit as soon as a later event proves the gap; the open session waits
    *    in state and is flushed by the watermark-driven timeout
    *    (StreamingSpec drives both the cross-batch merge and the timeout
    *    flush over a MemoryStream).
    *
    * Per-group memory is one user's micro-batch slice (bounded per key —
    * entity-keyed, not fact-sized); the sort inside a slice is what the
    * engine's shuffle-sort would otherwise do for session_window.
    */
  def sessionize(ev: DataFrame, emitOpen: Boolean,
      gapMicros: Long = 30L * 60 * 1000000): DataFrame = {
    val s = ev.sparkSession
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    val timeout =
      if (emitOpen) GroupStateTimeout.NoTimeout else GroupStateTimeout.EventTimeTimeout
    // the watermarked `ts` column rides along untouched: EventTimeTimeout
    // requires the event-time attribute to reach the stateful operator, and
    // a projection that only keeps unix_micros(ts) would strip the tag
    ev.select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed lastU + gap: no earlier-than-watermark event
            // can arrive, the open session is final
            val open = state.get
            state.remove()
            Iterator((user, open.startU, open.cnt))
          } else {
            val ts = rows.map(_._2).toArray
            java.util.Arrays.sort(ts)
            val closed = Array.newBuilder[(Long, Long, Long)]
            var open = state.getOption
            // gaps-and-islands over the sorted batch: RUNS of events
            // mutually within the gap, processed in order against the open
            // session's interval. Runs are >= gap apart from each other, so
            // each run either (a) ends more than a gap before the open
            // session starts — closed and final, no later run can attach to
            // it either (flatMapGroupsWithState does NOT drop late rows, and
            // state holds one open session, so a passed session can't
            // reopen); (b) starts more than a gap after the open session
            // ends — the open session closes, the run opens anew; or
            // (c) overlaps the open interval within the gap on either side —
            // merged. One rule set covers far-late folds, in-range late
            // merges, session turnover, AND a late run BRIDGED to the open
            // session by an intermediate event (the run carries the bridge,
            // so the merge is event-time exact when the chain arrives in one
            // batch). lastU only ever grows (max), keeping the timeout
            // timestamp monotonic; startU may regress — that is the merge
            // semantics, and the timeout below depends only on lastU.
            var i = 0
            while (i < ts.length) {
              var j = i + 1
              var last = ts(i)
              while (j < ts.length && ts(j) - last < gapMicros) { last = ts(j); j += 1 }
              val (s0, l0, c0) = (ts(i), last, (j - i).toLong)
              open = open match {
                case Some(o) if l0 < o.startU - gapMicros =>
                  closed += ((user, s0, c0)); Some(o)
                case Some(o) if s0 - o.lastU >= gapMicros =>
                  closed += ((user, o.startU, o.cnt)); Some(OpenSession(s0, l0, c0))
                case Some(o) =>
                  Some(OpenSession(math.min(o.startU, s0), math.max(o.lastU, l0), o.cnt + c0))
                case None => Some(OpenSession(s0, l0, c0))
              }
              i = j
            }
            if (emitOpen) {
              open.foreach(o => closed += ((user, o.startU, o.cnt)))
              state.remove()
            } else {
              open.foreach { o =>
                state.update(o)
                // never set a timeout at-or-before the current watermark
                // (Spark rejects it): a merge dominated by late events can
                // leave lastU + gap behind the watermark — flush at wm + 1ms
                val flushMs = o.lastU / 1000 + gapMicros / 1000
                state.setTimeoutTimestamp(math.max(flushMs, state.getCurrentWatermarkMs() + 1))
              }
            }
            closed.result().iterator
          }
      }
      .toDF("user_id", "tsu", "cnt")
      .select(col("user_id"), timestamp_micros(col("tsu")).as("session_start"), col("cnt"))
  }

  /** T8: stream-stream interval join — purchases matched to the same user's
    * clicks in the 30 minutes before the purchase. In batch this is an
    * equi-join on user_id with a range predicate (one shuffle, no cartesian);
    * in streaming the SAME condition is Spark's watermarked stream-stream
    * join (the time bound is what lets the engine expire join state) —
    * StreamingSpec runs it over two MemoryStreams with watermarks.
    */
  def intervalPairs(purchases: DataFrame, clicks: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") < col("p_ts"),
      joinType)
  }

  def intervalJoin(ev: DataFrame): DataFrame =
    intervalPairs(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"))
      .groupBy("p_id").agg(count(lit(1)).as("n_clicks"))

  /** T8b: stream-stream LEFT OUTER interval join — every purchase survives,
    * clicked-through or not. The outer semantics are what make this a
    * distinct streaming op: Spark can only emit the null-padded row once the
    * watermark proves no in-window click can still arrive, so the time bound
    * + both-side watermarks are REQUIRED (an unbounded outer join would hold
    * state forever). In batch it is a plain left outer join; counting the
    * match side (`count(c_user)`) makes unmatched purchases report 0.
    */
  def intervalPairsOuter(purchases: DataFrame, clicks: DataFrame): DataFrame =
    intervalPairs(purchases, clicks, "left_outer")

  def intervalJoinLeft(ev: DataFrame): DataFrame =
    intervalPairsOuter(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"))
      .groupBy("p_id").agg(count(col("c_user")).as("n_clicks"))

  /** T13 (round 9): Spark 4's `transformWithState` — the arbitrary-state
    * API that succeeds mapGroupsWithState. What it adds and this processor
    * exercises: MULTIPLE independently-typed state variables per key (the
    * old API forced one state object, so adding a metric meant a schema
    * migration of the whole blob). Per-user running count + running max,
    * each its own [[ValueState]] in the RocksDB store.
    */
  final class TwsCountMax
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Double), (Long, Long, Double)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var cnt: ValueState[Long] = _
    @transient private var mx: ValueState[Double] = _
    override def init(o: OutputMode, t: TimeMode): Unit = {
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      mx = getHandle.getValueState[Double]("mx",
        org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
    }
    override def handleInputRows(k: Long, rows: Iterator[(Long, Double)],
        tv: TimerValues): Iterator[(Long, Long, Double)] = {
      var c = if (cnt.exists()) cnt.get() else 0L
      var m = if (mx.exists()) mx.get() else Double.NegativeInfinity
      rows.foreach { r => c += 1; m = math.max(m, r._2) }
      cnt.update(c); mx.update(m)
      Iterator.single((k, c, m))
    }
  }

  /** T13b: event-time TIMERS through transformWithState — the inactivity
    * flush every session/abandonment pipeline needs: each user's timer is
    * re-armed to maxEventSeen + gap on every batch (old timer deleted —
    * timers accumulate otherwise), and when the WATERMARK passes the armed
    * time `handleExpiredTimer` emits the user's final count exactly once.
    * The max SEEN event time rides in state so a later micro-batch carrying
    * out-of-order (but not watermark-dropped) events older than the key's
    * previous max can never move the deadline BACKWARDS — that would flush
    * the session early and emit a duplicate final count. This is the
    * capability mapGroupsWithState exposed only as coarse per-group
    * timeouts; TWS timers are explicit, per-key, many-per-key and visible
    * to `listTimers`.
    */
  final class TwsInactivity(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp), (Long, Long)] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var cnt: ValueState[Long] = _
    @transient private var armed: ValueState[Long] = _
    override def init(o: OutputMode, t: TimeMode): Unit = {
      cnt = getHandle.getValueState[Long]("cnt",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(k: Long, rows: Iterator[(Long, java.sql.Timestamp)],
        tv: TimerValues): Iterator[(Long, Long)] = {
      val rs = rows.toSeq
      cnt.update((if (cnt.exists()) cnt.get() else 0L) + rs.length)
      // monotone deadline: the armed time only ever advances — an
      // out-of-order batch whose max is older than a previously seen event
      // keeps the existing deadline instead of pulling it earlier
      val prev = if (armed.exists()) armed.get() else Long.MinValue
      val at = math.max(prev, rs.map(_._2.getTime).max + gapMs)
      if (at != prev) {
        if (armed.exists()) getHandle.deleteTimer(prev)
        getHandle.registerTimer(at)
        armed.update(at)
      }
      Iterator.empty
    }
    override def handleExpiredTimer(k: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, Long)] = {
      val out = Iterator.single((k, if (cnt.exists()) cnt.get() else 0L))
      cnt.clear(); armed.clear()
      out
    }
  }

  /** The TWS query over an in-memory stream of (user_id, value) rows —
    * shared by the registry op (one batch, oracle-checked) and the spec
    * (two batches, cross-batch accumulation). Returns the memory-sink
    * table name; caller reads it after `processAllAvailable`.
    */
  def runTwsCountMax(
      s2: SparkSession,
      batches: Seq[Seq[(Long, Double)]]): String = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import s2.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val qn = s"tws_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = mem.toDS()
      .groupByKey(_._1)
      .transformWithState(new TwsCountMax, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events", "max_value")
      .writeStream.format("memory").queryName(qn).outputMode("update").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    qn
  }

  val ops: Seq[Op] = Seq(
    // T13: transformWithState driven END-TO-END inside the correctness
    // gate — a real streaming query (MemoryStream source, RocksDB state
    // store, memory sink) over a bounded slice of the events table, its
    // one-batch result hash-compared against the plain GROUP BY oracle.
    // COUNT and MAX are order-independent and float-exact, so the
    // streamed accumulation is oracle-identical regardless of row order.
    Op(
      "stream_tws_state",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, MAX(value) AS max_value
        |FROM events WHERE user_id < 50
        |GROUP BY user_id ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val s2 = s.newSession()
      // transformWithState requires the RocksDB provider; per-session conf
      // so sibling queries keep the default store
      s2.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // the feed is a bounded slice (≤50 keys), so 32 stateful partitions
      // buy nothing and cost 32 RocksDB store instances whose native +
      // block-cache allocations dominate GC under the driver's default 8g
      // heap (r17 judge isolation: 14.6 s at 8g vs 3.9 s at 28g). 4
      // partitions keep the same per-key semantics at 1/8 the store
      // footprint; a production TWS query sizes this to its key cardinality.
      s2.conf.set("spark.sql.shuffle.partitions", "4")
      s2.conf.set("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
      s2.conf.set("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "256")
      import s2.implicits._
      // the MemoryStream feed is a DRIVER-side collect, so it carries a hard
      // row cap: events grow linearly with SF (3.3k rows at sf0.1, ~330k at
      // sf10) and an uncapped slice would scale the driver footprint with
      // the dataset. 100k leaves every tested SF untouched (the oracle sees
      // the identical row set); past the cap the op is explicitly a bounded
      // demo feed — a production TWS query reads readStream, not a collect.
      val rows = events(s, d).filter(col("user_id") < 50)
        .select(col("user_id"), col("value")).limit(100000)
        .as[(Long, Double)].collect().toSeq
      val qn = runTwsCountMax(s2, Seq(rows))
      s2.table(qn)
        .select(col("user_id"), col("n_events").cast("bigint"), col("max_value"))
        .orderBy("user_id")
    },

    Op(
      "stream_tumbling",
      """SELECT date_trunc('hour', ts) AS win_start, event_type, COUNT(*) AS cnt,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
    )((s, d) => tumbling(events(s, d)).orderBy("win_start", "event_type")),

    // Sliding windows are epoch-aligned in Spark; DuckDB reproduces the set
    // of covering windows as bucket(ts) - k*slide for k in 0..3 (every ts is
    // covered by exactly windowLen/slide windows).
    Op(
      "stream_sliding",
      """SELECT win_start, event_type, COUNT(*) AS cnt FROM (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes') AS win_start,
        |         event_type
        |  FROM events, range(4) t(k))
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
    )((s, d) => sliding(events(s, d)).orderBy("win_start", "event_type")),

    // Session windows via gaps-and-islands in SQL. Spark starts a new
    // session when the gap is >= the timeout; with µs-resolution data an
    // exactly-30:00.000000 gap has measure zero (verified absent).
    Op(
      "stream_session",
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        |      FROM g)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS cnt
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin
    )((s, d) => session(events(s, d)).orderBy("user_id", "session_start")),

    Op(
      "stream_enrich",
      """SELECT c_mktsegment, event_type, COUNT(*) AS cnt
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    )((s, d) => enrich(events(s, d), Tables(s, d, "customer"))
      .orderBy("c_mktsegment", "event_type")),

    Op(
      "stream_topk",
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS win_start, event_type, COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT win_start, event_type, cnt,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY win_start
        |         ORDER BY cnt DESC, event_type) AS BIGINT) AS rk
        |FROM c QUALIFY rk <= 3 ORDER BY win_start, rk""".stripMargin
    )((s, d) => topkPerWindow(events(s, d)).orderBy("win_start", "rk")),

    Op(
      "stream_running_count",
      "SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id ORDER BY user_id"
    )((s, d) => runningCounts(events(s, d)).orderBy("user_id")),

    // Same gaps-and-islands oracle as stream_session: the hand-rolled
    // stateful fold must agree with session_window on batch data.
    Op(
      "stream_sessionize_state",
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        |      FROM g)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS cnt
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin
    )((s, d) => sessionize(events(s, d), emitOpen = true)
      .orderBy("user_id", "session_start")),

    Op(
      "stream_interval_join",
      """SELECT p.event_id AS p_id, COUNT(*) AS n_clicks
        |FROM events p JOIN events c
        |  ON c.user_id = p.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts < p.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin
    )((s, d) => intervalJoin(events(s, d)).orderBy("p_id")),

    // Left-outer variant: zero-click purchases appear with n_clicks = 0 —
    // the funnel-analysis shape (conversion WITHOUT a preceding touchpoint
    // is exactly the signal an inner join erases).
    Op(
      "stream_interval_join_left",
      """SELECT p.event_id AS p_id, COUNT(c.user_id) AS n_clicks
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id
        | AND c.ts >= p.ts - INTERVAL '30 minutes' AND c.ts < p.ts
        |GROUP BY 1 ORDER BY 1""".stripMargin
    )((s, d) => intervalJoinLeft(events(s, d)).orderBy("p_id")),

    // T12: STATEFUL funnel — the batch funnel_steps re-expressed as a
    // per-user forward fold in flatMapGroupsWithState, the form that runs
    // incrementally on a live event stream (state = one FunnelTimes triple
    // per user; a micro-batch advances each touched user's stage). Batch
    // execution processes each user's full sorted history once, which is
    // provably the same answer as the three-stage MIN-aggregate SQL — the
    // op shares funnel_steps' EXACT oracle string so the two executions
    // are pinned to one ground truth. StreamingSpec drives the cross-batch
    // stage advancement and the deadline rejection over a MemoryStream.
    Op(
      "funnel_steps_state",
      graft.exact.Extended.funnelOracleSql
    ) { (s, d) =>
      import s.implicits._
      val st = funnelStages(events(s, d), emitTransitions = false)
      val r = st.agg(
        sum(when(col("stage") >= 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("stage") >= 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("stage") >= 3, 1L).otherwise(0L)).as("n3")).head()
      val (n1, n2, n3) = (r.getLong(0), r.getLong(1), r.getLong(2))
      Seq((1L, "view", n1), (2L, "click", n2), (3L, "purchase", n3))
        .toDF("step", "event_type", "users")
        // same zero-entry guard as the batch form (the shared oracle
        // divides by NULLIF(n1, 0))
        .withColumn("conv_rate",
          when(lit(n1) =!= 0L, round(col("users") / lit(n1.toDouble), 4)))
        .orderBy("step")
    }
  )

  /** Per-user funnel progress: epoch-micro times of the first qualifying
    * view/click/purchase (−1 = not reached). Lives in GroupState across
    * micro-batches in streaming execution.
    */
  case class FunnelTimes(t1: Long, t2: Long, t3: Long) {
    def stage: Int = if (t3 >= 0) 3 else if (t2 >= 0) 2 else if (t1 >= 0) 1 else 0
  }

  /** The funnel fold behind [[ops]]' `funnel_steps_state`: events process
    * in event-time order within each micro-batch slice; a stage advances on
    * the FIRST event satisfying its ordering + 12 h deadline constraint
    * against the previous stage's recorded time. In-order processing makes
    * the forward fold equal the MIN-aggregate SQL: when a click is
    * examined, every earlier view has already been folded, so t1 is final.
    * The streaming contract is per-user event-time-monotone arrival across
    * micro-batches (the same assumption as any no-watermark stateful fold);
    * out-of-order history would need the sessionize-style run merging.
    *
    * emitTransitions=false (batch): one (user, final stage) row per user.
    * emitTransitions=true (streaming): a row only when a batch ADVANCES the
    * user's stage — the live conversion feed.
    */
  def funnelStages(ev: DataFrame, emitTransitions: Boolean): DataFrame = {
    val s = ev.sparkSession
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import s.implicits._
    val deadline = 12L * 3600 * 1000000
    ev.select(col("user_id"), unix_micros(col("ts")).as("tsu"), col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String)], state: GroupState[FunnelTimes]) =>
          val evs = rows.toArray.sortBy(r => (r._2, r._3))
          var st = state.getOption.getOrElse(FunnelTimes(-1L, -1L, -1L))
          val stage0 = st.stage
          evs.foreach { case (_, ts, tpe) =>
            tpe match {
              case "view" if st.t1 < 0 =>
                st = st.copy(t1 = ts)
              case "click" if st.t1 >= 0 && st.t2 < 0 &&
                  ts > st.t1 && ts <= st.t1 + deadline =>
                st = st.copy(t2 = ts)
              case "purchase" if st.t2 >= 0 && st.t3 < 0 &&
                  ts > st.t2 && ts <= st.t2 + deadline =>
                st = st.copy(t3 = ts)
              case _ => ()
            }
          }
          state.update(st)
          if (emitTransitions)
            (if (st.stage > stage0) Iterator((user, st.stage.toLong)) else Iterator.empty)
          else Iterator((user, st.stage.toLong))
      }
      .toDF("user_id", "stage")
  }
}
