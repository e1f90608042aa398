package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-LAYOUT
  * operator for 100 TB scans: interleaving the bits of d quantized
  * dimensions into one sort key makes a range-partitioned, sorted
  * write produce files whose per-column min/max spans are narrow in
  * EVERY dimension at once, so parquet row-group stats prune scans
  * filtered on any subset of the dimensions (the Delta/Iceberg
  * OPTIMIZE ZORDER BY idea, done with plain Spark primitives: a
  * codegen'd bit-interleave Column + repartitionByRange +
  * sortWithinPartitions).
  *
  * The interleave is pure integer Column arithmetic (shifts, masks,
  * bitwise OR folds) — whole-stage-codegen'd, no UDF, and exactly
  * replayable by a SQL oracle. Dimensions must be pre-quantized to
  * [0, 2^bits) by the caller (bucket ids, not raw values): the z
  * value of d dims x `bits` bits occupies d*bits low bits of a long.
  */
object ZOrder {

  /** Morton interleave of `dims` (each a non-negative integral Column
    * < 2^bits): bit i of dim j lands at output bit i*d + j, so dim 0
    * owns the least-significant lane. d * bits must fit a long. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val d = dims.size
    require(d >= 1 && bits >= 1 && d * bits <= 63,
      s"need 1 <= dims and dims*bits <= 63, got d=$d bits=$bits")
    val terms = for {
      i <- 0 until bits
      j <- 0 until d
    } yield shiftleft(
      shiftright(dims(j).cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Lay `df` out in z-order over the given quantized dimensions:
    * range-partition on the z value (partition count from
    * spark.sql.shuffle.partitions unless given), sort within
    * partitions, drop the helper column. Writing the result yields
    * the multi-dim-prunable file layout; the z column itself is
    * dropped because layout — not schema — is the product. */
  def layoutByZ(df: DataFrame, dims: Seq[Column], bits: Int,
                numParts: Int = 0): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val z = "__z"
    df.withColumn(z, zValue(dims, bits))
      .repartitionByRange(parts, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }
}
