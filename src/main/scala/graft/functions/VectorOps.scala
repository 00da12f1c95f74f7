package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for float-vector dot products.
  *
  * The composable form (`aggregate(zip_with(...))`) allocates an intermediate
  * array per row and evaluates the lambda interpreted — fine for one pass
  * over a column, ruinous inside an O(n²) similarity join. This expression
  * generates a primitive fused multiply-add loop inside whole-stage codegen
  * (the (b) tier of the custom-operator preference order: a scalar
  * `Expression` with `doGenCode`, before any custom physical operator).
  *
  * Arithmetic contract: elementwise float→double widening (exact), left-to-
  * right double accumulation — bit-identical to the HOF formulation and to
  * DuckDB's list_dot_product on DOUBLE[], so oracle checks are unaffected.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** dot(a, b) over two array<float> columns, computed in double. */
  def dotf(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductF(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** cosine(a, b) given precomputed L2 norms (pass sqrt(dotf(v,v))). */
  def cosineWithNorms(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)
}
