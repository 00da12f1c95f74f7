package graft.ext

import graft.Op
import graft.schema.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * processed by a per-partition decode stage.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake standing in for (e.g.) a JPEG decoder — but the
  * Spark-side shape is the real thing: binary column in, `mapPartitions`
  * batch over it (one decoder init per partition, the pattern a real codec
  * needs), typed feature struct out. Swapping `decodeStub` for an actual
  * codec changes no plan shape.
  */
object Multimodal {

  final case class Blob(doc_id: Long, payload: Array[Byte])
  final case class Decoded(doc_id: Long, n_bytes: Long, head_byte: Long, checksum: Long)

  /** Deterministic fake decode: byte length, first byte, additive checksum —
    * stands in for width/height/pixels of a real decoder.
    */
  def decodeStub(b: Blob): Decoded = {
    var sum = 0L
    var i = 0
    while (i < b.payload.length) { sum += (b.payload(i) & 0xff); i += 1 }
    Decoded(
      b.doc_id,
      b.payload.length.toLong,
      if (b.payload.nonEmpty) (b.payload(0) & 0xff).toLong else -1L,
      sum)
  }

  final case class Resized(doc_id: Long, n_bytes: Long, resized_bytes: Long, resized_checksum: Long)

  /** Deterministic fake resize: keep every `stride`-th byte — the byte-stream
    * analog of image downsampling. Same contract as decodeStub: swap for a
    * real scaler, plan shape unchanged.
    */
  def resizeStub(b: Blob, stride: Int): Resized = {
    var sum = 0L
    var n = 0L
    var i = 0
    while (i < b.payload.length) {
      sum += (b.payload(i) & 0xff); n += 1; i += stride
    }
    Resized(b.doc_id, b.payload.length.toLong, n, sum)
  }

  final case class FrameSample(doc_id: Long, n_frames: Long, n_sampled: Long, sampled_checksum: Long)

  /** Deterministic fake frame sampler: payload viewed as fixed 16-byte
    * frames, every 2nd full frame sampled and checksummed — the video
    * every-Nth-frame pattern.
    */
  def frameSampleStub(b: Blob): FrameSample = {
    val frameSize = 16
    val nFrames = b.payload.length / frameSize
    var sum = 0L
    var sampled = 0L
    var f = 0
    while (f < nFrames) {
      var i = f * frameSize
      val end = i + frameSize
      while (i < end) { sum += (b.payload(i) & 0xff); i += 1 }
      sampled += 1
      f += 2
    }
    FrameSample(b.doc_id, nFrames.toLong, sampled, sum)
  }

  val ops: Seq[Op] = Seq(
    // Binary ingest → per-partition decode → typed features. n_bytes /
    // head_byte / checksum are all SQL-derivable from the same bytes, so the
    // stub pipeline stays oracle-checkable end to end.
    Op(
      "multimodal_decode",
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       CAST(ascii(text) AS BIGINT) AS head_byte,
        |       CAST(list_sum(list_transform(range(1, length(text) + 1), i -> ascii(text[i]))) AS BIGINT) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val blobs = Tables(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Blob]
      blobs
        .mapPartitions { it =>
          // real codecs initialize per-partition state here (decoder handles,
          // thread-local buffers); the stub needs none.
          it.map(decodeStub)
        }
        .toDF()
        .orderBy("doc_id")
    },

    // Resize stage: every-4th-byte downsample, per-partition like a real
    // scaler. The stub arithmetic is SQL-derivable, so oracle-checked.
    Op(
      "multimodal_resize",
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS n_bytes,
        |       CAST(len(range(1, length(text) + 1, 4)) AS BIGINT) AS resized_bytes,
        |       CAST(COALESCE(list_sum(list_transform(range(1, length(text) + 1, 4),
        |                                             i -> ascii(text[i]))), 0) AS BIGINT) AS resized_checksum
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Blob]
        .mapPartitions(_.map(resizeStub(_, 4)))
        .toDF()
        .orderBy("doc_id")
    },

    // Frame sampling: 16-byte frames, every 2nd frame kept — the video
    // every-Nth-frame pattern, oracle-checked through the same byte math.
    Op(
      "multimodal_framesample",
      """SELECT doc_id,
        |       CAST(length(text) // 16 AS BIGINT) AS n_frames,
        |       CAST(len(range(0, CAST(length(text) // 16 AS INT), 2)) AS BIGINT) AS n_sampled,
        |       CAST(COALESCE(list_sum(list_transform(range(0, CAST(length(text) // 16 AS INT), 2),
        |             f -> list_sum(list_transform(range(f * 16 + 1, f * 16 + 17),
        |                                          i -> ascii(text[i]))))), 0) AS BIGINT) AS sampled_checksum
        |FROM documents ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[Blob]
        .mapPartitions(_.map(frameSampleStub))
        .toDF()
        .orderBy("doc_id")
    }
  )
}
