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
    }
  )
}
