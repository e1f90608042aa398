package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All k-byte-window polynomial rolling hashes of a string in ONE
  * O(len) pass: `rolling_hash(text, k)[i]` is the hash of bytes
  * [i, i+k) (0-based), so a string of n bytes yields n-k+1 hashes
  * (empty array when n < k).
  *
  * This is the 100 TB leg of the exact substring-duplication audit
  * ([[graft.ops.dedup.SubstringDup]]): the multiplicity exchange
  * carries an 8-byte long instead of the k-byte window text — at
  * k = 20 that is 60%+ less shuffle payload, and the window
  * materialization cost drops from O(n·k) substring copies to O(n)
  * multiply-adds. Hash equality stands in for string equality with
  * collision odds ~n²/2⁶⁴ (≈10⁻⁸ at 10⁸ windows) — fine for an
  * audit/dedup gate; the exact-text variant remains the
  * oracle-exact form.
  *
  * h(i) = Σ_j bytes[i+j]·M^(k-1-j) (mod 2⁶⁴), M an odd 64-bit
  * multiplier, advanced by h(i+1) = (h(i) − bytes[i]·M^(k-1))·M +
  * bytes[i+k]. Wrapping Long arithmetic — identical in interpreted
  * and generated code by construction. Byte-oriented: on ASCII
  * corpora window indices coincide with character positions; for
  * multi-byte text the indices are byte offsets (document or
  * normalize upstream).
  *
  * A Catalyst expression with `doGenCode` (not a UDF, not a HOF):
  * the whole scan→hash→explode pipeline stays inside
  * WholeStageCodegen.
  */
case class RollingHash(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"window size k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  /** M^(k-1) mod 2⁶⁴, for removing the outgoing byte. */
  private lazy val mPow: Long = {
    var p = 1L
    for (_ <- 1 until k) p *= RollingHash.M
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var h = 0L
    var j = 0
    while (j < k) { h = h * RollingHash.M + (bytes(j) & 0xffL); j += 1 }
    out(0) = h
    var i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xffL) * mPow) * RollingHash.M + (bytes(i + k - 1) & 0xffL)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val M = s"${RollingHash.M}L"
      s"""
         |byte[] $bytes = $a.getBytes();
         |int $n = $bytes.length;
         |int $m = $n - $k + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$m];
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) $h = $h * $M + ($bytes[$i] & 0xffL);
         |  $out[0] = $h;
         |  for (int $i = 1; $i < $m; $i++) {
         |    $h = ($h - ($bytes[$i - 1] & 0xffL) * ${mPow}L) * $M + ($bytes[$i + $k - 1] & 0xffL);
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Odd 64-bit multiplier (Knuth/PCG LCG constant) — full-period mod
    * 2⁶⁴, good byte diffusion after k≥4 steps. */
  val M: Long = 6364136223846793005L

  /** Column wrapper: all k-byte-window rolling hashes of `text`. */
  def windowHashes(text: Column, k: Int): Column =
    toColumn(RollingHash(toExpression(text), k))
}
