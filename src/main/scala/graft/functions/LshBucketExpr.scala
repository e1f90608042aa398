package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Whole LSH bucket signature as ONE codegen'd expression: quantize
  * each float component once (xi = round-half-up(x * 1e6), exactly
  * Spark's `round` on doubles), accumulate all plane votes in a
  * single pass over the array, pack sign bits into the bucket long.
  *
  * The composable formulation (per-plane `aggregate(zip_with(...))`
  * columns) re-evaluates the quantization transform once PER PLANE
  * through interpreted higher-order functions — 8x the rounding work
  * and no codegen. This expression does one pass inside
  * WholeStageCodegen; the sign matrix rides along as a codegen
  * reference object.
  *
  * Bit j of the result = (Σ_i signs(j)(i) * xi_i) > 0 — identical
  * integer arithmetic to the HOF form and the DuckDB oracle replay
  * (order-independent: integer addition).
  */
case class LshBucketExpr(child: Expression, signs: Array[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_lsh_bucket"

  private def nPlanes: Int = signs.length

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Long](nPlanes)
    var i = 0
    while (i < n) {
      val xi = LshBucketExpr.halfUp(arr.getFloat(i).toDouble * 1e6)
      var j = 0
      while (j < nPlanes) {
        if (i < signs(j).length) acc(j) += signs(j)(i) * xi
        j += 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nPlanes) { if (acc(j) > 0) bucket |= 1L << j; j += 1 }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.addReferenceObj("signs", signs, "long[][]")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xi = ctx.freshName("xi")
      s"""
         |int $n = $a.numElements();
         |long[] $acc = new long[${nPlanes}];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = graft.functions.LshBucketExpr.halfUp(((double) $a.getFloat($i)) * 1e6);
         |  for (int $j = 0; $j < ${nPlanes}; $j++) {
         |    if ($i < $s[$j].length) $acc[$j] += $s[$j][$i] * $xi;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $j = 0; $j < ${nPlanes}; $j++) {
         |  if ($acc[$j] > 0) ${ev.value} |= 1L << $j;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Round half away from zero at scale 0 — bit-identical to Spark's
    * `round(double)` (BigDecimal HALF_UP) and DuckDB's round(). */
  def halfUp(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def bucket(embedding: Column, signs: Array[Array[Long]]): Column =
    toColumn(LshBucketExpr(toExpression(embedding), signs))
}
