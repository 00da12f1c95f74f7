package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property lock on streaming sessionization (ext/Streaming.sessionize,
  * the round-7 far-late run-fold rewrite): for RANDOM event sets split
  * across RANDOM micro-batch boundaries with arbitrary intra-batch
  * disorder, the emitted sessions must equal the batch oracle exactly —
  * same users, same starts, same counts.
  *
  * Batches partition the time-sorted sequence (disorder lives INSIDE a
  * batch, the micro-batch reality where a trigger's rows arrive unordered);
  * unbounded CROSS-batch lateness is provably not oracle-equivalent for
  * any online sessionizer that ever emits (an already-emitted session
  * cannot merge with a bridge that arrives after it), and the example
  * tests in StreamingSpec pin the documented folding behavior for those
  * far-late arrivals instead.
  */
/** Top level: Catalyst's encoder codegen cannot instantiate a case class
  * nested inside a scalacheck Properties object.
  */
case class SessEv(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

object SessionizeProps extends Properties("sessionize") {
  import TestSpark._

  // each case drives a real streaming query — keep the case count sane
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val gapMinutes = 30L
  private val baseMicros = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
  private val qid = new java.util.concurrent.atomic.AtomicInteger

  /** (user, minute-offset) events: up to 3 users × up to 10 events each,
    * minutes over a 10-hour span so gaps of every size occur.
    */
  private val genEvents: Gen[List[(Long, Long)]] = for {
    nUsers <- Gen.choose(1, 3)
    sizes <- Gen.listOfN(nUsers, Gen.choose(1, 10))
    mins <- Gen.listOfN(sizes.sum, Gen.choose(0L, 600L))
  } yield {
    val users = sizes.zipWithIndex.flatMap { case (n, u) => List.fill(n)((u + 1).toLong) }
    users.zip(mins)
  }

  private val genCuts: Gen[List[Int]] = Gen.listOfN(3, Gen.choose(0, 30))

  /** Batch oracle: per-user gaps-and-islands over sorted event times. */
  private def oracle(events: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    events.groupBy(_._1).flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      var i = 0
      while (i < ts.length) {
        var j = i + 1
        var last = ts(i)
        while (j < ts.length && ts(j) - last < gapMinutes) { last = ts(j); j += 1 }
        out += ((u, ts(i), (j - i).toLong))
        i = j
      }
      out
    }.toSet

  /** Drive the real streaming operator: contiguous batches of the sorted
    * sequence, each internally SHUFFLED, then a sentinel user advances the
    * watermark so every open session flushes through EventTimeTimeout.
    */
  private def runEngine(
      events: Seq[(Long, Long)], cuts: Seq[Int], shuffleSeed: Long): Set[(Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sorted = events.sortBy(_._2)
    val bounds = cuts.map(c => math.min(c, sorted.length)).sorted
    val batches = (0 +: bounds :+ sorted.length).sliding(2)
      .map { case Seq(a, b) => sorted.slice(a, b) }
      .filter(_.nonEmpty).toList
    val rng = new scala.util.Random(shuffleSeed)
    val name = s"sessprop${qid.incrementAndGet()}"
    val mem = MemoryStream[SessEv]
    val q = ext.Streaming.sessionize(
        mem.toDF().withWatermark("ts", "1 minute"),
        emitOpen = false, gapMicros = gapMinutes * 60_000_000L)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      var id = 0L
      batches.foreach { b =>
        val shuffled = rng.shuffle(b)
        mem.addData(shuffled.map { case (u, m) =>
          id += 1
          SessEv(id, new Timestamp((baseMicros + m * 60_000_000L) / 1000L), u, "view", 1.0)
        }: _*)
        q.processAllAvailable()
      }
      // sentinel far past every session's close: first trigger advances the
      // watermark, second fires the timeouts it armed
      val far = baseMicros / 1000L + 48L * 3600 * 1000
      mem.addData(SessEv(-1, new Timestamp(far), 9999L, "view", 1.0))
      q.processAllAvailable()
      mem.addData(SessEv(-2, new Timestamp(far + 60000), 9999L, "view", 1.0))
      q.processAllAvailable()
      spark.sql(s"select * from $name").collect()
        .map(r => (r.getLong(0),
          (r.getTimestamp(1).getTime * 1000L - baseMicros) / 60_000_000L,
          r.getLong(2)))
        .filter(_._1 != 9999L).toSet
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  property("random batch splits + intra-batch disorder reproduce the batch oracle exactly") =
    forAll(genEvents, genCuts, Gen.choose(0L, Long.MaxValue)) { (events, cuts, seed) =>
      events.isEmpty || {
        val expected = oracle(events)
        val got = runEngine(events, cuts, seed)
        val ok = got == expected
        if (!ok) println(s"events=$events cuts=$cuts seed=$seed\nexpected=$expected\ngot=$got")
        ok
      }
    }
}
