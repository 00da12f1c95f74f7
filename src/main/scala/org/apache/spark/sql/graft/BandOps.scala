package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** 0-based index of the FIRST position where two `array<long>` columns hold
  * equal elements; -1 when none match.
  *
  * The LSH band joins use it to keep each colliding candidate pair exactly
  * once — at its first colliding band — turning the former
  * `.distinct()` (a full partial-agg + exchange + final-agg pass over the
  * band-join output, which at loose thresholds is several× the distinct
  * pair count) into a codegen'd per-row predicate over the two (small)
  * band-key arrays the join rows already carry.
  */
case class FirstEqualIndex(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  // r19 ADVICE: fail misuse at analysis time — a non-long array would read
  // garbage through getLong and silently DROP candidate pairs. Element
  // nullability is allowed (a null element equals nothing, handled below):
  // rejecting containsNull=true outright would break callers whose key
  // expressions Spark merely cannot prove non-null.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"FirstEqualIndex requires two array<bigint> inputs, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
         |      $a.getLong($i) == $b.getLong($i)) { ${ev.value} = $i; break; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BandOps {
  /** First index where two long-array columns agree, -1 if none (codegen). */
  def firstEqualIndex(a: Column, b: Column): Column =
    ExpressionUtils.column(FirstEqualIndex(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
