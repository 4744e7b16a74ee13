package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the float-vector dot product — the one
  * hot scalar kernel where the built-in compositional form
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is measurably wrong at
  * scale: higher-order functions are interpreted per element and allocate
  * an intermediate array per row, which multiplies out badly in pairwise
  * similarity joins (candidate pairs x 64 dims x allocation churn).
  *
  * Semantics are IDENTICAL to the compositional form and to DuckDB's
  * `list_dot_product` on `DOUBLE[]`: cast each float to double (exact),
  * multiply, accumulate strictly left-to-right — so swapping this in
  * changes no oracle-checked result bit.
  *
  * Codegen: participates in whole-stage codegen via doGenCode (a tight
  * primitive loop over the two ArrayData buffers, no allocation).
  */
case class FloatDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot_product"
  // Can return null even for non-null inputs (ragged lengths / null
  // elements), independent of child nullability.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // Null/ragged parity with the compositional form: zip_with pads a
  // shorter array with null and null elements poison the fold, so both
  // cases must yield NULL here too (a dimension bug upstream surfaces
  // instead of being silently masked by truncation).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-API surface for [[FloatDotProduct]] (classic-mode bridge). */
  def fdot(a: Column, b: Column): Column =
    Bridge.column(FloatDotProduct(Bridge.expression(a), Bridge.expression(b)))
}
