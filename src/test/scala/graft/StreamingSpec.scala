package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real Structured Streaming behavior (T1/T4/T5): the same transforms the
  * batch oracles check, driven through MemoryStream with watermarks.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class CdcEv(op: String, event_type: String, value: Double)
  case class Chg(c_key: Long, op: String, c_status: Option[String], c_totalprice: Option[Double])

  test("tumbling window agg over a stream matches batch semantics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = ext.Streaming.tumbling(mem.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    mem.addData(
      Ev(1, ts("2024-01-01 00:10:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 00:50:00"), 1, "view", 2.0),
      Ev(3, ts("2024-01-01 01:10:00"), 2, "click", 3.0))
    q.processAllAvailable()
    val rows = spark.sql("select * from tumb order by win_start, event_type").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("cnt") == 2 && rows(0).getAs[Double]("sum_value") == 3.0)
    assert(rows(1).getAs[String]("event_type") == "click")
  }

  test("watermark drops events later than the threshold (T4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.format("memory").queryName("late").outputMode("append").start()
    mem.addData(Ev(1, ts("2024-01-01 00:10:00"), 1, "view", 1.0))
    q.processAllAvailable()
    // advance the watermark far past the first window...
    mem.addData(Ev(2, ts("2024-01-01 03:00:00"), 1, "view", 1.0))
    q.processAllAvailable()
    // ...then send a straggler into the closed 00:00 window: must be dropped.
    mem.addData(Ev(3, ts("2024-01-01 00:20:00"), 1, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.sql("select * from late order by window.start").collect()
    q.stop()
    assert(rows.length == 1, "only the closed 00:00 window is emitted in append mode")
    assert(rows(0).getAs[Long]("cnt") == 1, "the late event must not be counted")
  }

  test("stream-stream interval join matches in-window clicks only (T8)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = ext.Streaming.intervalPairs(
      purchases.toDF().withWatermark("ts", "1 hour"),
      clicks.toDF().withWatermark("ts", "1 hour"))
    val q = joined.writeStream.format("memory").queryName("ivj").outputMode("append").start()
    clicks.addData(
      Ev(10, ts("2024-01-01 00:40:00"), 1, "click", 0.0), // in window
      Ev(11, ts("2024-01-01 00:10:00"), 1, "click", 0.0), // too early (>30 min before)
      Ev(12, ts("2024-01-01 00:45:00"), 2, "click", 0.0)) // other user
    purchases.addData(Ev(1, ts("2024-01-01 01:00:00"), 1, "purchase", 9.0))
    q.processAllAvailable()
    val rows = spark.sql("select p_id, c_ts from ivj order by c_ts").collect()
    q.stop()
    assert(rows.length == 1, s"exactly the one in-window same-user click joins: ${rows.toSeq}")
    assert(rows(0).getLong(0) == 1L && rows(0).getTimestamp(1) == ts("2024-01-01 00:40:00"))
  }

  test("stream-stream LEFT OUTER interval join pads unmatched purchases after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val joined = ext.Streaming.intervalPairsOuter(
      purchases.toDF().withWatermark("ts", "10 minutes"),
      clicks.toDF().withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ivjl").outputMode("append").start()
    clicks.addData(Ev(10, ts("2024-01-01 00:50:00"), 2, "click", 0.0))
    purchases.addData(
      Ev(1, ts("2024-01-01 01:00:00"), 1, "purchase", 9.0), // no click: must survive
      Ev(2, ts("2024-01-01 01:00:00"), 2, "purchase", 9.0)) // clicked through
    q.processAllAvailable()
    // the matched row emits immediately; the null-padded row must NOT exist
    // yet — the watermark has not proven the click can't still arrive
    assert(spark.sql("select * from ivjl where p_id = 1").count() == 0,
      "outer row emitted before the watermark closed the join window")
    // advance BOTH watermarks (the join uses their minimum) past 01:00+30min
    purchases.addData(Ev(3, ts("2024-01-01 03:00:00"), 9, "purchase", 0.0))
    clicks.addData(Ev(11, ts("2024-01-01 03:00:00"), 9, "click", 0.0))
    q.processAllAvailable()
    q.processAllAvailable()
    val rows = spark.sql("select p_id, c_ts from ivjl where p_id in (1, 2) order by p_id").collect()
    q.stop()
    assert(rows.length == 2, s"both purchases must appear exactly once: ${rows.toSeq}")
    assert(rows(0).getLong(0) == 1L && rows(0).isNullAt(1),
      s"zero-click purchase must emit null-padded: ${rows(0)}")
    assert(rows(1).getLong(0) == 2L && rows(1).getTimestamp(1) == ts("2024-01-01 00:50:00"))
  }

  test("stateful dedup within watermark (T5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dedup = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = dedup.writeStream.format("memory").queryName("dedupq").outputMode("append").start()
    mem.addData(
      Ev(1, ts("2024-01-01 00:10:00"), 1, "view", 1.0),
      Ev(1, ts("2024-01-01 00:11:00"), 1, "view", 1.0), // duplicate id
      Ev(2, ts("2024-01-01 00:12:00"), 1, "view", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(9, ts("2024-01-01 09:00:00"), 1, "view", 1.0)) // flush watermark
    q.processAllAvailable()
    val n = spark.sql("select distinct event_id from dedupq").count()
    val total = spark.sql("select * from dedupq where event_id in (1,2)").count()
    q.stop()
    assert(total == 2, s"duplicate event_id must be emitted once, got $total")
    assert(n >= 2)
  }

  test("foreachBatch CDC apply: streamed change batches merge into a versioned parquet target") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // versioned target (write-new-read-latest — the log-free form of how a
    // lakehouse merge avoids overwriting the files it is reading)
    val root = java.nio.file.Files.createTempDirectory("cdc_target").toString
    var current = s"$root/v0"
    Seq((1L, "O", 10.0), (2L, "O", 20.0), (3L, "O", 30.0))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(current)
    val mem = MemoryStream[Chg]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val next = s"$root/v${id + 1}"
        exact.Composite.applyChanges(spark.read.parquet(current), batch)
          .write.mode("overwrite").parquet(next)
        current = next
        ()
      }
      .start()
    mem.addData(Chg(1L, "U", None, Some(11.0)), Chg(2L, "D", None, None))
    q.processAllAvailable()
    mem.addData(Chg(9L, "I", Some("NEW"), Some(90.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(current)
      .orderBy("o_orderkey")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "O", 11.0), (3L, "O", 30.0), (9L, "NEW", 90.0)),
      s"two streamed batches must leave update+survivor+insert: $rows")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("M11 streaming: foreachBatch incrementally updates the RSPN per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.rspn._

    val types = Array("click", "purchase", "view")
    def code(t: String): Double = types.indexOf(t).toDouble
    def row(t: String, v: Double): Array[Double] = Array(code(t), v)

    // seed model from an initial "offline" batch, as the reference trains
    // once and then applies learn_incremental to arriving tuples
    val seed = Array.tabulate(256)(i => row(types(i % 3), (i % 10).toDouble))
    val kinds: Array[Learn.ColKind] = Array(Learn.CategoricalCol(3), Learn.NumericCol)
    @volatile var model: SpnNode = Learn.learn(seed, kinds)
    val n0 = model.n

    val mem = MemoryStream[Ev]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // micro-batch → routed batch insert, immutable swap (readers keep
        // consistent snapshots between batches)
        val rows = batch.select("event_type", "value").collect()
          .map(r => row(r.getString(0), r.getDouble(1)))
        model = Update.insertBatch(model, rows)
      }
      .start()
    mem.addData((1 to 40).map(i => Ev(i, ts("2024-01-01 00:00:00"), 1, "view", 1.0)): _*)
    q.processAllAvailable()
    val afterFirst = model.n
    mem.addData((41 to 60).map(i => Ev(i, ts("2024-01-01 01:00:00"), 1, "click", 2.0)): _*)
    q.processAllAvailable()
    q.stop()

    assert(afterFirst == n0 + 40, s"first micro-batch not absorbed: ${model.n}")
    assert(model.n == n0 + 60, s"second micro-batch not absorbed: ${model.n}")
    // the all-"view" burst must shift P(view) up
    val viewRange: Array[ColRange] = Array(NominalSet(Array(code("view"))), null)
    val pView = Spn.prob(model, viewRange)
    assert(pView > 1.0 / 3 + 0.05, s"P(view)=$pView did not track the inserted burst")
  }

  test("M11b streaming: a CDC stream of inserts AND deletes maintains the RSPN") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.rspn._

    val types = Array("click", "purchase", "view")
    def code(t: String): Double = types.indexOf(t).toDouble
    def row(t: String, v: Double): Array[Double] = Array(code(t), v)

    val seed = Array.tabulate(240)(i => row(types(i % 3), (i % 10).toDouble))
    val kinds: Array[Learn.ColKind] = Array(Learn.CategoricalCol(3), Learn.NumericCol)
    @volatile var model: SpnNode = Learn.learn(seed, kinds)
    val n0 = model.n

    // the change-feed shape: each record is (op, tuple); one foreachBatch
    // applies the batch's inserts and deletes as TWO routed passes against
    // one immutable snapshot swap — the streaming face of CDC-maintained
    // model state
    val mem = MemoryStream[CdcEv]
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.select("op", "event_type", "value").collect()
        val ins = rows.filter(_.getString(0) == "I").map(r => row(r.getString(1), r.getDouble(2)))
        val del = rows.filter(_.getString(0) == "D").map(r => row(r.getString(1), r.getDouble(2)))
        model = Update.deleteBatch(Update.insertBatch(model, ins), del)
      }
      .start()
    // batch 1: a burst of views arrives
    mem.addData((1 to 60).map(_ => CdcEv("I", "view", 1.0)): _*)
    q.processAllAvailable()
    val pAfterBurst = Spn.prob(model, Array(NominalSet(Array(code("view"))), null))
    assert(model.n == n0 + 60)
    // batch 2: the same burst is retracted (a correction/retention sweep)
    mem.addData((1 to 60).map(_ => CdcEv("D", "view", 1.0)): _*)
    q.processAllAvailable()
    q.stop()

    assert(model.n == n0, s"retraction must restore the row ledger: ${model.n} vs $n0")
    val pView = Spn.prob(model, Array(NominalSet(Array(code("view"))), null))
    assert(pAfterBurst > 1.0 / 3 + 0.05, s"burst did not raise P(view): $pAfterBurst")
    // insert-then-delete of the identical batch is a near-identity; the
    // seed is uniform over types, so P(view) must return to ~1/3
    assert(math.abs(pView - 1.0 / 3) < 0.02,
      s"P(view)=$pView did not fall back to the seed distribution after retraction")
  }

  test("T12 stateful funnel: stages advance across micro-batches, deadlines reject (and batch == SQL shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = ext.Streaming.funnelStages(mem.toDF(), emitTransitions = true)
      .writeStream.format("memory").queryName("funnelq").outputMode("append").start()
    // batch 1: user 7 starts the funnel; user 8's click has no view yet
    mem.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
      Ev(2, ts("2024-01-01 10:00:00"), 8, "click", 1.0))
    q.processAllAvailable()
    // batch 2: user 7 converts to click (within 12 h); user 8 finally views
    mem.addData(
      Ev(3, ts("2024-01-01 11:00:00"), 7, "click", 1.0),
      Ev(4, ts("2024-01-01 11:30:00"), 8, "view", 1.0))
    q.processAllAvailable()
    // batch 3: user 7's purchase misses the 12 h deadline (t2 + 12.5 h);
    // user 8 clicks in time
    mem.addData(
      Ev(5, ts("2024-01-01 23:30:00"), 7, "purchase", 1.0),
      Ev(6, ts("2024-01-01 12:00:00"), 8, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("select user_id, stage from funnelq")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((7L, 1L), (7L, 2L), (8L, 1L), (8L, 2L)),
      s"transition feed mismatch: $got")
  }

  test("per-window top-k: streaming counts + foreachBatch rank match the batch form (T11)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // the production split: the windowed COUNT is the stateful streaming
    // aggregation (append mode — a window's counts emit once, when the
    // watermark closes it); the non-incrementalizable RANK runs per batch
    // of closed windows in foreachBatch, through the same rankTopK the
    // batch op uses.
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Timestamp, String, Long, Long)]
    val counts = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))
    val q = counts.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ext.Streaming.rankTopK(batch, 3)
          .collect()
          .foreach(r => sink.synchronized {
            sink += ((r.getAs[Timestamp]("win_start"), r.getAs[String]("event_type"),
              r.getAs[Long]("cnt"), r.getAs[Long]("rk")))
          })
      }
      .start()
    // hour 00: four types with counts 3/2/2/1 — the top-3 cut must drop
    // exactly "scroll" (count 1) and break the 2-2 tie by event_type.
    mem.addData(
      Ev(1, ts("2024-01-01 00:05:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 00:10:00"), 1, "view", 1.0),
      Ev(3, ts("2024-01-01 00:15:00"), 2, "view", 1.0),
      Ev(4, ts("2024-01-01 00:20:00"), 2, "click", 1.0),
      Ev(5, ts("2024-01-01 00:25:00"), 3, "click", 1.0),
      Ev(6, ts("2024-01-01 00:30:00"), 3, "buy", 1.0),
      Ev(7, ts("2024-01-01 00:35:00"), 4, "buy", 1.0),
      Ev(8, ts("2024-01-01 00:40:00"), 4, "scroll", 1.0))
    q.processAllAvailable()
    // advance the watermark past hour 00 so its windows close and emit.
    mem.addData(Ev(9, ts("2024-01-01 02:00:00"), 1, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val hour0 = sink.filter(_._1 == ts("2024-01-01 00:00:00")).sortBy(_._4)
    assert(hour0.map(t => (t._2, t._3, t._4)) ==
      Seq(("view", 3L, 1L), ("buy", 2L, 2L), ("click", 2L, 3L)),
      s"streamed top-3 of hour 00 wrong: $hour0")
    // and the batch rank over the same final counts agrees exactly
    val batchTop = ext.Streaming.rankTopK(
      Seq(
        (ts("2024-01-01 00:00:00"), "view", 3L),
        (ts("2024-01-01 00:00:00"), "buy", 2L),
        (ts("2024-01-01 00:00:00"), "click", 2L),
        (ts("2024-01-01 00:00:00"), "scroll", 1L)).toDF("win_start", "event_type", "cnt"),
      3).collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(batchTop == hour0.map(t => (t._2, t._3, t._4)).toSeq)
  }

  test("mapGroupsWithState carries running counts across micro-batches (T7)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = ext.Streaming.runningCounts(mem.toDF())
      .writeStream.format("memory").queryName("rc").outputMode("update").start()
    mem.addData(
      Ev(1, ts("2024-01-01 00:00:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 00:01:00"), 1, "view", 1.0),
      Ev(3, ts("2024-01-01 00:02:00"), 2, "click", 1.0))
    q.processAllAvailable()
    mem.addData(
      Ev(4, ts("2024-01-01 00:03:00"), 1, "view", 1.0),
      Ev(5, ts("2024-01-01 00:04:00"), 3, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("select * from rc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 1 emits (1,2),(2,1); batch 2 must emit (1,3) — the state
    // carried user 1's prior count — and (3,1)
    assert(Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).subsetOf(rows), s"got $rows")
  }

  test("stream-static broadcast join enriches a stream without state (T6)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[Ev]
    val q = ext.Streaming.enrich(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enr").outputMode("complete").start()
    mem.addData(
      Ev(1, ts("2024-01-01 00:00:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 00:01:00"), 1, "click", 1.0),
      Ev(3, ts("2024-01-01 00:02:00"), 2, "view", 1.0),
      Ev(4, ts("2024-01-01 00:03:00"), 9, "view", 1.0)) // no dim row: dropped
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("select * from enr").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(("BUILDING", "view", 1L), ("BUILDING", "click", 1L),
      ("MACHINERY", "view", 1L)), s"got $rows")
  }

  test("sessionize streams: cross-batch merge, out-of-order events, timeout flush (T9)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // 1-hour watermark delay: wide enough that a far-late event (below the
    // open session's start - gap but above the watermark) reaches the
    // operator — Spark drops sub-watermark rows before an EventTimeTimeout
    // stateful operator
    val q = ext.Streaming.sessionize(
        mem.toDF().withWatermark("ts", "1 hour"), emitOpen = false)
      .writeStream.format("memory").queryName("sessz").outputMode("append").start()
    // batch 1: one open session for user 1 (00:00, 00:10)
    mem.addData(
      Ev(1, ts("2024-01-01 00:00:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 00:10:00"), 1, "view", 1.0))
    q.processAllAvailable()
    // batch 2: 00:05 arrives LATE (t < state.lastU) but above the watermark —
    // it must merge without regressing the session bounds; 02:00 proves the
    // 30-min gap and closes the session at cnt=3
    mem.addData(
      Ev(3, ts("2024-01-01 00:05:00"), 1, "view", 1.0),
      Ev(4, ts("2024-01-01 02:00:00"), 1, "view", 1.0))
    q.processAllAvailable()
    // batch 3: TWO far-late events (more than a gap before the open
    // session's 02:00 start, above the 01:00 watermark) within one gap of
    // each other must fold into ONE closed session — not merge into or
    // regress the open session, and not emit per-event singletons
    mem.addData(
      Ev(5, ts("2024-01-01 01:10:00"), 1, "view", 1.0),
      Ev(8, ts("2024-01-01 01:15:00"), 1, "view", 1.0))
    q.processAllAvailable()
    // batches 4+5: another user's events push the watermark past
    // 02:00 + gap so the EventTimeTimeout flushes user 1's open session
    // (timeouts fire on the trigger AFTER the watermark advances)
    mem.addData(Ev(6, ts("2024-01-01 04:00:00"), 2, "view", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(7, ts("2024-01-01 04:01:00"), 2, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.sql("select * from sessz").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains((1L, ts("2024-01-01 00:00:00"), 3L)),
      s"closed session must merge the late event at its original start: $rows")
    assert(rows.contains((1L, ts("2024-01-01 01:10:00"), 2L)),
      s"contiguous far-late events must fold into one closed session: $rows")
    assert(!rows.contains((1L, ts("2024-01-01 01:15:00"), 1L)),
      s"far-late events within a gap must not emit per-event singletons: $rows")
    assert(rows.contains((1L, ts("2024-01-01 02:00:00"), 1L)),
      s"open session must be flushed by the watermark timeout: $rows")
  }

  test("sessionize streams: a late run bridged by an in-range event merges, not splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = ext.Streaming.sessionize(
        mem.toDF().withWatermark("ts", "2 hours"), emitOpen = false)
      .writeStream.format("memory").queryName("sessz_bridge").outputMode("append").start()
    // batch 1: open session at 02:00
    mem.addData(Ev(1, ts("2024-01-01 02:00:00"), 1, "view", 1.0))
    q.processAllAvailable()
    // batch 2: 01:20 and 01:25 are far-late vs the 02:00 start, but 01:32
    // bridges them (01:32 is within the 30-min gap of both 01:25 and
    // 02:00) — event-time-correct is ONE session from 01:20, not a closed
    // (01:20, 2) plus a session at 01:32 or 02:00
    mem.addData(
      Ev(2, ts("2024-01-01 01:20:00"), 1, "view", 1.0),
      Ev(3, ts("2024-01-01 01:25:00"), 1, "view", 1.0),
      Ev(4, ts("2024-01-01 01:32:00"), 1, "view", 1.0))
    q.processAllAvailable()
    // advance the watermark far enough to flush the open session
    mem.addData(Ev(5, ts("2024-01-01 08:00:00"), 2, "view", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(6, ts("2024-01-01 08:01:00"), 2, "view", 1.0))
    q.processAllAvailable()
    val rows = spark.sql("select * from sessz_bridge").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains((1L, ts("2024-01-01 01:20:00"), 4L)),
      s"bridged late run must merge into one session from 01:20: $rows")
    assert(!rows.exists(r => r._1 == 1L && r._3 < 4L),
      s"no fragment sessions for user 1: $rows")
  }

  test("parquet file sink with checkpoint: append-mode windows land exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("sink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sink_ckpt").toString
    val mem = MemoryStream[Ev]
    // append-mode windowed aggregate into a parquet directory — the real
    // production sink (memory sinks elsewhere in this suite are test-only);
    // the checkpoint is what makes a restart resume instead of recompute
    val q = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("cnt"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 00:10:00"), 1, "view", 1.0),
        Ev(2, ts("2024-01-01 00:20:00"), 1, "view", 1.0))
      q.processAllAvailable()
      // advance the watermark past the 00:00 window so append emits it
      mem.addData(Ev(3, ts("2024-01-01 03:00:00"), 1, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getTimestamp(0), r.getLong(1)))
      assert(rows.toSeq == Seq((ts("2024-01-01 00:00:00"), 2L)),
        s"exactly the closed window, exactly once: ${rows.toSeq}")
    } finally {
      // an assertion mid-test must not leave the query running against the
      // shared session or leak the temp dirs
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
    }
  }

  test("session window over a stream groups by inactivity gap (T3)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = ext.Streaming.session(mem.toDF())
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    mem.addData(
      Ev(1, ts("2024-01-01 00:00:00"), 7, "view", 1.0),
      Ev(2, ts("2024-01-01 00:10:00"), 7, "view", 1.0), // same session
      Ev(3, ts("2024-01-01 02:00:00"), 7, "view", 1.0)) // new session
    q.processAllAvailable()
    val rows = spark.sql("select * from sess order by session_start").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("cnt") == 2 && rows(1).getAs[Long]("cnt") == 1)
  }

  test("transformWithState carries both typed state vars across micro-batches (T13)") {
    // two batches: the second must ACCUMULATE onto the first's RocksDB
    // state (count grows, max is the max over both), and each key's final
    // row reflects every batch it appeared in
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val qn = ext.Streaming.runTwsCountMax(s2, Seq(
      Seq((1L, 5.0), (1L, 9.0), (2L, 3.0)),
      Seq((1L, 7.0), (3L, 1.0))))
    // Update-mode memory sink keeps one row per (key, batch) emission; the
    // LAST emission per key is the accumulated state
    val last = s2.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
    assert(last(1L) == (1L, 3L, 9.0), s"user 1 must accumulate across batches: ${last(1L)}")
    assert(last(2L) == (2L, 1L, 3.0))
    assert(last(3L) == (3L, 1L, 1.0))
  }

  test("transformWithState event-time timers flush inactive users once (T13b)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val ctx: org.apache.spark.sql.SQLContext = s2.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val q = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "5 minutes")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(
        new ext.Streaming.TwsInactivity(30L * 60 * 1000), // 30 min gap
        TimeMode.EventTime(), OutputMode.Update())
      .toDF("user_id", "n_events")
      .writeStream.format("memory").queryName("tws_timer").outputMode("update").start()
    // batch 1: both users active around t=0
    mem.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:01:00")),
      (2L, ts("2024-01-01 00:01:00")))
    q.processAllAvailable()
    assert(s2.sql("select * from tws_timer").isEmpty, "no timer may fire while active")
    // batch 2: only user 2 continues at t=45min; the watermark advances to
    // 40min — past user 1's armed 31min timer, NOT past user 2's re-armed one
    mem.addData((2L, ts("2024-01-01 00:45:00")))
    q.processAllAvailable()
    // timer firing is evaluated against the batch's watermark: one more
    // empty-ish batch lets the expired timer emit
    mem.addData((2L, ts("2024-01-01 00:46:00")))
    q.processAllAvailable()
    q.stop()
    val flushed = s2.sql("select * from tws_timer").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(flushed == Seq((1L, 2L)),
      s"exactly user 1 must flush with its 2 events: $flushed")
  }

  test("SpnStreamUpdater maintains the model from a live stream (M11c)") {
    import rspn._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 2-column model over (event_type code, value); types fixed up front so
    // both the stream path and the batch reference share one encoding
    val types = Seq("click", "purchase", "view")
    def encRow(t: String, v: Double): Array[Double] = Array(types.indexOf(t).toDouble, v)
    def enc(r: org.apache.spark.sql.Row): Array[Double] =
      Array(types.indexOf(r.getString(0)).toDouble, r.getDouble(1))
    val kinds: Array[Learn.ColKind] =
      Array(Learn.CategoricalCol(types.length), Learn.NumericCol)
    val viewRange: Array[ColRange] =
      Array(NominalSet(Array(types.indexOf("view").toDouble)), null)

    val rng = new scala.util.Random(11)
    def mkBatch(n: Int): Seq[(String, Double)] =
      Seq.fill(n)((types(rng.nextInt(3)), math.floor(rng.nextDouble() * 50)))
    val seed = Seq.fill(60)((types(rng.nextInt(3)), math.floor(rng.nextDouble() * 50)))
    val b1 = mkBatch(25)
    val b2 = mkBatch(40)

    val root0 = Learn.learn(seed.map { case (t, v) => encRow(t, v) }.toArray, kinds)
    val up = new SpnStreamUpdater(root0, enc, initRows = seed.length.toLong)

    val mem = MemoryStream[(String, Double)]
    val q = mem.toDF().toDF("event_type", "value")
      .writeStream.foreachBatch(up.apply _).start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    val afterB1 = Spn.prob(up.root, viewRange)
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()

    // the streamed model is bit-identical (in every estimate) to inserting
    // the same batches sequentially outside any stream
    val ref = Update.insertBatch(
      Update.insertBatch(root0, b1.map { case (t, v) => encRow(t, v) }.toArray),
      b2.map { case (t, v) => encRow(t, v) }.toArray)
    assert(up.nRows == seed.length + b1.length + b2.length)
    assert(up.root.n == ref.n)
    assert(Spn.prob(up.root, viewRange) == Spn.prob(ref, viewRange),
      "streamed model diverged from the sequential batch path")
    for (v <- Seq(10.0, 25.0, 40.0)) {
      val r: Array[ColRange] = Array(null, NumRange(0.0, v))
      assert(Spn.prob(up.root, r) == Spn.prob(ref, r), s"diverged on value<=$v")
    }
    // the model genuinely moved across micro-batches (not a frozen root)
    assert(up.lastBatchId >= 1, "foreachBatch must have delivered two batches")
    assert(Spn.prob(up.root, viewRange) != afterB1 || up.root.n != seed.length + b1.length)

    // re-delivery of an already-applied batchId is a no-op (the failure
    // -recovery path foreachBatch documents)
    val before = up.root
    up(Seq(("view", 1.0)).toDF("event_type", "value"), up.lastBatchId)
    assert(up.root eq before, "replayed batchId must not touch the model")
  }
}
