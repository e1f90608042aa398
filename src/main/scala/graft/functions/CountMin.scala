package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a native TypedImperativeAggregate — the
  * heavy-hitter companion to [[HyperLogLog]]: D=4 rows x W=256
  * buckets of exact long counters (8 KB per group through the
  * shuffle, element-wise sum merge). Point estimate = min over rows
  * of the counter at that row's bucket — overestimates only, never
  * under (the CMS contract).
  *
  * Deterministic cross-engine: one md5-60bit hash per value (the
  * corpus convention), row i's bucket = byte i of the hash
  * ((h >> 8i) & 255 == (h // 256^i) % 256 in SQL). Counters are exact
  * integers, so the DuckDB oracle replays the whole sketch and the
  * estimates hash-match bit-for-bit.
  */
case class CountMin(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import CountMin._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(c: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HyperLogLog.hash60(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < D) {
        c(i * W + ((h >>> (8 * i)) & (W - 1)).toInt) += 1
        i += 1
      }
    }
    c
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(c: Array[Long]): Any = new GenericArrayData(c)

  override def serialize(c: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(c.length * 8)
    bb.asLongBuffer().put(c)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMin =
    copy(child = newChild)
}

/** Merge aggregate over STORED CMS sketches — element-wise counter
  * SUM across input sketch rows (CMS's lossless union, the additive
  * twin of [[HllMerge]]'s register max). Completes the mergeable-
  * sketch architecture for heavy hitters: persist one sketch per
  * (partition dimension — day, lang, source), answer any rollup's
  * point estimates by summing counters, never re-scanning the token
  * stream. Merging per-partition sketches is EXACTLY the sketch of
  * the union (integer sums commute), spec- and oracle-verified. */
case class CmsMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import CountMin._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_merge"
  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(c: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      // fail LOUDLY on a wrong-width sketch (schema drift, truncated
      // write, different D/W constants): a partial sum would silently
      // undercount — violating CMS's never-underestimate contract —
      // the same silent-width divergence the Bloom probe guards against
      require(arr.length == D * W,
        s"graft_cms_merge: sketch width ${arr.length} != ${D * W} (D*W); " +
          "input was not built by graft_cms with these constants")
      var i = 0
      while (i < D * W) { c(i) += arr(i); i += 1 }
    }
    c
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(c: Array[Long]): Any = new GenericArrayData(c)

  override def serialize(c: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(c.length * 8)
    bb.asLongBuffer().put(c)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMerge =
    copy(child = newChild)
}

object CountMin {
  import org.apache.spark.sql.GraftExpressionBridge._
  import org.apache.spark.sql.functions._

  /** Depth (independent-ish hash rows) and width (buckets per row). */
  val D = 4
  val W = 256

  def cms(c: Column): Column =
    toColumn(CountMin(toExpression(c)).toAggregateExpression())

  /** Column form: union of stored sketch arrays (counter sums). */
  def cmsMerge(c: Column): Column =
    toColumn(CmsMerge(toExpression(c)).toAggregateExpression())

  /** Point estimate of `token`'s count from a sketch array column:
    * min over rows of counters[i*W + bucket_i(token)], with bucket_i
    * derived from the same md5-60bit hash the update path uses. */
  def estimate(sketch: Column, token: Column): Column = {
    val h = conv(substring(md5(token), 1, 15), 16, 10).cast("long")
    val perRow = (0 until D).map { i =>
      element_at(sketch,
        (lit(i * W) + shiftright(h, 8 * i).bitwiseAND(lit((W - 1).toLong)) + 1).cast("int"))
    }
    least(perRow: _*)
  }
}
