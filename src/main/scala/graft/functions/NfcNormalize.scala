package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonical normalization as a native codegen'd
  * expression — the text-canonicalization step that must run BEFORE
  * any hash-keyed dedup or exact string groupBy: "é" arrives from
  * crawls both precomposed (U+00E9) and decomposed (U+0065 U+0301),
  * and without canonical composition the two forms hash to different
  * dedup keys and different LSH shingles for byte-identical-looking
  * text. Spark has no built-in normalizer (the usual fallback is a
  * Scala UDF — an opaque box to codegen); this expression calls the
  * JDK's `java.text.Normalizer` (Unicode canonical composition, no
  * external deps — the q142 javax.imageio move for text) from inside
  * WholeStageCodegen. NFC (not NFKC): canonical equivalence only,
  * compatibility folding (ligatures, full-width) changes meaning and
  * belongs to a separate, deliberate policy step.
  *
  * ASCII fast path: `UTF8String.isFullAscii` skips the JDK call for
  * the overwhelmingly-ASCII crawl majority — no allocation, no
  * String round-trip on the hot path. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Static helper the generated code calls. ASCII strings are
    * NFC-normal by construction — return the input untouched. */
  def normalize(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** Column wrapper: NFC canonical composition, codegen'd. */
  def nfc(c: Column): Column = toColumn(NfcNormalize(toExpression(c)))
}
