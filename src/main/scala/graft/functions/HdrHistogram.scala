package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** HDR-histogram quantile sketch as a native TypedImperativeAggregate
  * — the rank-statistics member of the mergeable-sketch family
  * ([[HyperLogLog]] distincts, [[CountMin]] heavy hitters, this for
  * quantiles). Buckets are exponential-with-linear-subdivision (the
  * HdrHistogram / DDSketch-style layout): values below 2^K are exact;
  * above, each power-of-two octave splits into 2^K linear sub-buckets,
  * so every bucket's width is at most 2^-K of its value — a fixed
  * RELATIVE error (K=5 → ≤ 3.2%) over the full long range in
  * (64-K)*2^K = 1888 long counters (~15 KB per group through the
  * shuffle).
  *
  * Unlike a sampling sketch (GK/KLL/t-digest), the bucket of a value
  * is a pure function of the value — so counts are integers, merge is
  * element-wise SUM, and the merged sketch of a union EQUALS the
  * directly-built sketch bit-for-bit regardless of grouping or order
  * (the property q146/q147 verify for HLL/CMS). That merge-invariance
  * is what makes it the 100 TB shape: persist one sketch row per
  * (entity, day), answer any window/rollup's p50/p99 by summing
  * counters, never re-scanning values. And because bucket index and
  * bucket lower bound are integer bit arithmetic (msb = binary digit
  * count - 1), a SQL oracle can replay the whole sketch exactly —
  * no transcendental log calls whose last ulp an engine could round
  * differently.
  *
  * Quantile read-out rule (deterministic, integer-exact): rank
  * r = ceil(n * p), answer = LOWER bound of the first bucket whose
  * cumulative count reaches r — a value v' with v' <= true_quantile
  * < v'*(1+2^-K) (above 2^K; exact below).
  *
  * Negative inputs clamp to bucket 0 (the catalog feeds sizes/counts,
  * which are non-negative; the clamp keeps a stray negative from
  * indexing out of range); nulls are skipped.
  */
case class HdrHistogram(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import HdrHistogram._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hdr"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](B)

  override def update(c: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) c(bucketOf(v.asInstanceOf[Long])) += 1
    c
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < B) { a(i) += b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HdrHistogram =
    copy(child = newChild)
}

/** WEIGHTED [[HdrHistogram]]: bucket counters accumulate a weight
  * column instead of 1 — the sketch of a weighted distribution
  * ("where does the corpus's TOKEN MASS sit by document length",
  * not "how many documents have each length"). Same buckets, same
  * integer counters, same exact merge-invariance; the quantile
  * read-out's rank is over total weight. Null/negative weights
  * contribute 0 (a negative weight would corrupt the monotone
  * cumulative scan the read-out depends on). */
case class HdrWeighted(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  import HdrHistogram._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hdr_weighted"
  override def createAggregationBuffer(): Array[Long] = new Array[Long](B)

  override def update(c: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null) {
      val wl = w.asInstanceOf[Long]
      if (wl > 0L) c(bucketOf(v.asInstanceOf[Long])) += wl
    }
    c
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < B) { a(i) += b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrWeighted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrWeighted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HdrWeighted =
    copy(left = newLeft, right = newRight)
}

/** Merge aggregate over STORED HDR sketches — element-wise counter
  * sum, width-guarded like [[CmsMerge]]: the rollup path that turns a
  * per-(entity, day) sketch table into any window's quantiles with
  * sketch-count-sized shuffles. */
case class HdrMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import HdrHistogram._

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hdr_merge"
  override def createAggregationBuffer(): Array[Long] = new Array[Long](B)

  override def update(c: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray()
      require(arr.length == B,
        s"graft_hdr_merge: sketch width ${arr.length} != $B; " +
          "input was not built by graft_hdr with K=" + K)
      var i = 0
      while (i < B) { c(i) += arr(i); i += 1 }
    }
    c
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < B) { a(i) += b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HdrMerge =
    copy(child = newChild)
}

object HdrHistogram {
  import org.apache.spark.sql.GraftExpressionBridge._
  import org.apache.spark.sql.functions._

  /** Sub-bucket bits: 2^K linear sub-buckets per octave → relative
    * error ≤ 2^-K. */
  val K = 5
  /** Dense sketch width: values < 2^K map to buckets 0..2^K-1; a
    * value with msb m ≥ K maps to (m-K+1)*2^K + ((v >> (m-K)) - 2^K),
    * so the largest positive long (msb 62) tops out below (64-K)*2^K. */
  val B = (64 - K) * (1 << K)

  /** Bucket index of a non-negative long (negatives clamp to 0). */
  def bucketOf(v0: Long): Int = {
    val v = if (v0 < 0L) 0L else v0
    if (v < (1L << K)) v.toInt
    else {
      val m = 63 - java.lang.Long.numberOfLeadingZeros(v)
      ((m - K + 1) << K) + ((v >>> (m - K)) - (1L << K)).toInt
    }
  }

  /** Lower bound of bucket `b` — the quantile read-out value. */
  def lowerBoundOf(b: Int): Long =
    if (b < (1 << K)) b.toLong
    else ((1L << K) + (b & ((1 << K) - 1))) << ((b >> K) - 1)

  /** Aggregate a LongType column into a sketch (array of B counters). */
  def hdr(c: Column): Column =
    toColumn(HdrHistogram(toExpression(c)).toAggregateExpression())

  /** Weighted sketch: counters accumulate `w` (LongType; w < 1 and
    * null contribute nothing) at `v`'s bucket. */
  def hdrWeighted(v: Column, w: Column): Column =
    toColumn(HdrWeighted(toExpression(v), toExpression(w)).toAggregateExpression())

  /** Union of stored sketch arrays (counter sums). */
  def hdrMerge(c: Column): Column =
    toColumn(HdrMerge(toExpression(c)).toAggregateExpression())

  /** Total count in a sketch column. */
  def total(sketch: Column): Column =
    aggregate(sketch, lit(0L), (acc, x) => acc + x)

  /** p-quantile (p = num/den, integer-exact rank ceil(n*num/den)) of
    * a sketch column: lower bound of the first bucket whose running
    * count reaches the rank. Pure integer HOF arithmetic over the
    * 1888-long array — runs post-aggregation on group-count-sized
    * data, never on the corpus. Empty sketch → 0. */
  def quantile(sketch: Column, num: Int, den: Int): Column = {
    val n = total(sketch)
    // ceil(n*num/den) via integer div — no float detour
    val r = call_function("div", n * num + (den - 1), lit(den.toLong))
    // scan: acc = (cum, ans); ans = first bucket index whose cum >= r
    val idx = sequence(lit(0), lit(B - 1))
    val scanned = aggregate(
      zip_with(sketch, idx, (c, i) => struct(c.as("c"), i.as("i"))),
      struct(lit(0L).as("cum"), lit(-1).as("ans")),
      (acc, x) => struct(
        (acc.getField("cum") + x.getField("c")).as("cum"),
        when(acc.getField("ans") === -1 &&
          acc.getField("cum") + x.getField("c") >= r, x.getField("i"))
          .otherwise(acc.getField("ans")).as("ans")),
      acc => acc.getField("ans"))
    // bucket index -> lower bound, as Column arithmetic (the shift
    // amount is data-dependent, so the SQL shiftleft form)
    val b = scanned
    val sub = lit(1L << K) + b.bitwiseAND(lit((1 << K) - 1))
    when(b < (1 << K), greatest(b, lit(0)).cast(LongType))
      .otherwise(call_function("shiftleft", sub,
        call_function("shiftright", b, lit(K)) - 1).cast(LongType))
  }
}
