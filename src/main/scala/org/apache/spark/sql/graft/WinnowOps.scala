package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (the MOSS scheme) as ONE codegen'd pass
  * per document — semantically identical to the r16 higher-order-function
  * formulation
  *
  * {{{
  *   explode(array_distinct(transform(sequence(1, len - (w-1)),
  *     i => array_min(slice(
  *       transform(sequence(1, len), p => md5(substr(txt, p, k).cast("binary"))),
  *       i, w)))))
  * }}}
  *
  * but ~5× cheaper per gram position: the HOF chain is interpreted per
  * element and pays, per position, a substring copy, a fresh MessageDigest
  * (commons-codec `md5Hex` allocates one per call), a 32-char hex string,
  * and then per window a slice allocation + UTF8String min + a distinct
  * hash set over hex strings. Here one reused MD5 instance digests each
  * gram's bytes in place (no substring materialization), window minima
  * compare raw 16-byte digests (unsigned lexicographic — exactly the hex
  * string order, hex being a monotone byte→chars map), and only selected
  * minima are hex-encoded. Output values and the distinct set are
  * bit-identical (ExtOpsSpec pins equality against the HOF formulation).
  */
case class WinnowFingerprints(left: Expression, right: Expression, k: Int, w: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(txt: Any, len: Any): Any =
    WinnowUtil.winnow(txt.asInstanceOf[UTF8String], len.asInstanceOf[Int], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l) =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowUtil.winnow($t, $l, $k, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WinnowUtil {
  private val hexDigits = "0123456789abcdef".getBytes("US-ASCII")

  /** All distinct window-min md5 fingerprints of `txt`, replicating the HOF
    * formulation exactly: gram positions are 1..len over the CODEPOINTS of
    * `txt` (len is computed by the caller from the pre-lowercase text, so a
    * position may exceed `txt`'s end — `substr` semantics truncate the gram
    * there, down to empty); each gram's md5 is over its UTF-8 bytes; window
    * i covers positions i..i+w-1; minima are by hex-string order (== raw
    * digest order); distinct keeps first occurrence.
    */
  def winnow(txt: UTF8String, len: Int, k: Int, w: Int): ArrayData = {
    val nWin = len - (w - 1)
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    val bytes = txt.getBytes
    val nChars = txt.numChars()
    // byte offset of each codepoint start (offs(nChars) = end)
    val offs = new Array[Int](nChars + 1)
    var ci = 0
    var bo = 0
    while (ci < nChars) {
      offs(ci) = bo
      bo += UTF8String.numBytesForFirstByte(bytes(bo))
      ci += 1
    }
    offs(nChars) = bytes.length
    val md = MessageDigest.getInstance("MD5")
    val dig = new Array[Array[Byte]](len)
    var p = 0
    while (p < len) {
      val s0 = offs(math.min(p, nChars))
      val e0 = offs(math.min(p + k, nChars))
      md.update(bytes, s0, e0 - s0)
      dig(p) = md.digest() // digest() also resets for the next gram
      p += 1
    }
    val out = new java.util.LinkedHashSet[UTF8String]()
    var lastMin = -1 // consecutive windows usually share their min position
    var i = 0
    while (i < nWin) {
      var m = i
      var j = i + 1
      while (j < i + w) {
        if (compareDigests(dig(j), dig(m)) < 0) m = j
        j += 1
      }
      if (m != lastMin) {
        out.add(hex(dig(m)))
        lastMin = m
      }
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  private def compareDigests(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val cs = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      cs(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      cs(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(cs)
  }
}

object WinnowOps {
  /** Distinct winnowing fingerprints (array<string>) of a lowercased text
    * column; `len` is the gram-position count (length(original) - (k-1)).
    */
  def winnowFps(txt: Column, len: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(
      ExpressionUtils.expression(txt), ExpressionUtils.expression(len), k, w))
}
