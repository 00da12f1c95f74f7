package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined n-gram shingles of a token array — the shared
  * featurization of the dedup/decontamination/corpus-stats family, as ONE
  * codegen'd pass per row.
  *
  * Semantically identical to the HOF formulation
  * `array_distinct(transform(sequence(0, size(tk)-n), i =>
  * concat_ws(" ", element_at(tk, i+1) … element_at(tk, i+n))))` (empty when
  * size(tk) < n), but the lambda there is interpreted per gram position —
  * per gram it binds a lambda variable, evaluates an n-ary `concat_ws`
  * through the generic expression path, and boxes the result; then
  * `array_distinct` makes a second pass. Here each gram's bytes are copied
  * once into a presized buffer and deduped in a LinkedHashSet in the same
  * loop. Values, order (first occurrence) and the distinct set are
  * bit-identical (ExtOpsSpec-pinned against the HOF reference).
  */
case class DistinctShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(arr: Any): Any =
    ShingleUtil.distinctShingles(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ShingleUtil.distinctShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleUtil {
  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** Distinct n-gram shingles (space-joined), first-occurrence order; empty
    * when the array holds fewer than n tokens. Null elements are skipped
    * exactly like the HOF reference's `concat_ws` skips null arguments
    * (r19 ADVICE: the tokenizer never produces them, but the public Column
    * API must not NPE on a contract its signature doesn't state).
    */
  def distinctShingles(arr: ArrayData, n: Int): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return EMPTY
    val toks = new Array[UTF8String](sz)
    var j = 0
    while (j < sz) { toks(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j); j += 1 }
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= sz - n) {
      var len = 0
      var nn = 0 // non-null tokens in this window
      var q = 0
      while (q < n) {
        val t = toks(i + q)
        if (t != null) { len += t.numBytes(); nn += 1 }
        q += 1
      }
      if (nn > 1) len += nn - 1 // separators join non-null tokens only
      val bytes = new Array[Byte](len)
      var pos = 0
      var first = true
      q = 0
      while (q < n) {
        val t = toks(i + q)
        if (t != null) {
          if (!first) { bytes(pos) = ' '; pos += 1 }
          first = false
          t.writeToMemory(bytes, Platform.BYTE_ARRAY_OFFSET + pos)
          pos += t.numBytes()
        }
        q += 1
      }
      out.add(UTF8String.fromBytes(bytes))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }
}

object ShingleOps {
  /** Distinct space-joined n-gram shingles of an `array<string>` column
    * (codegen'd single pass; null array propagates null — callers wrap).
    */
  def distinctShingles(tk: Column, n: Int): Column =
    ExpressionUtils.column(DistinctShingles(ExpressionUtils.expression(tk), n))
}
