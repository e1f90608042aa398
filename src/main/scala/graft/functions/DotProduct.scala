package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two float-array columns.
  *
  * The composable formulation (`aggregate(zip_with(...))`) uses
  * Catalyst higher-order functions, which are interpreted per element
  * and sit outside whole-stage codegen — the hot loop of brute-force
  * similarity search (SURVEY "similarity search" extension) pays for
  * it. This expression generates a tight Java loop instead and stays
  * inside WholeStageCodegen.
  *
  * Semantics: left-to-right fold of Σ double(x_i) * double(y_i) over
  * min(len) elements — the exact operation sequence of both the HOF
  * form and DuckDB's list_dot_product, so results are bit-identical
  * (the oracle contract). A null ELEMENT in either array (possible
  * only when the input type's containsNull is true) yields NULL,
  * matching the null propagation of `aggregate(zip_with(a,b,*),+)`.
  * Equal-length inputs are assumed for HOF equivalence (zip_with pads
  * the shorter array with nulls; this folds over min(len) instead).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  /** Whether either child array type admits null elements; when false
    * (the common case for parquet embeddings) the per-element null
    * checks compile away entirely. */
  private lazy val elementsNullable: Boolean = Seq(left, right).exists {
    _.dataType match {
      case org.apache.spark.sql.types.ArrayType(_, containsNull) => containsNull
      case _ => false
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
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
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column wrapper: dot_product(a, b) as a codegen'd expression. */
  def dot(a: Column, b: Column): Column =
    toColumn(DotProduct(toExpression(a), toExpression(b)))
}
