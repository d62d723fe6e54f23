package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two `array<double>` columns.
  *
  * Replaces the `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` builtin
  * composition: Spark evaluates higher-order array lambdas INTERPRETED
  * (one closure call per element), which made the interpreted fold the
  * hot path of every ANN / embedding-similarity operator. This
  * expression is a tight fused multiply-add loop inside whole-stage
  * codegen — the preference order the engine follows everywhere:
  * builtin functions, then a custom codegen `Expression`, never a UDF.
  *
  * Semantics match the builtin composition exactly so DuckDB's
  * `list_reduce` left fold stays bit-for-bit reproducible:
  *   - summation is the in-array left fold (`(((0 + p0) + p1) + ...)`,
  *     `s += a[i] * b[i]` in index order);
  *   - any null element yields NULL (like `x * y` with a null side),
  *     as does a length mismatch (`zip_with` null-pads the short side);
  *   - two empty arrays fold to 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with ExpectsInputTypes {

  // Seq[DataType] narrows ExpectsInputTypes' Seq[AbstractDataType]
  // (the abstract type itself is private[sql])
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayMath {

  /** Left-fold dot product of two `array<double>` columns (codegen). */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
