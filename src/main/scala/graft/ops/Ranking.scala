package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorts, top-k and chunked wide rows (SURVEY T1/T2/W6/W7).
  *
  * Reference: generic `sort_data`/`top_n` helpers (`/root/reference/
  * src/weekly/processors/base.py:455-481`), the culling-reason custom
  * sort chunked into 15-wide rows (`culling.py:258-309`), ROWNUM sort
  * indexes (`schedule.py:901-903`).
  */
object Ranking {

  /** Global top-k by `ord` (desc via caller's Column). orderBy+limit —
    * Spark plans TakeOrderedAndProject: per-partition top-k then a
    * single-reduce merge, no full sort at scale. */
  def topK(df: DataFrame, k: Int, ord: Seq[Column]): DataFrame =
    df.orderBy(ord: _*).limit(k)

  /** Per-group top-k via row_number (W6 per group). */
  def topKPerGroup(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                   k: Int, rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** T2: order rows by `ord`, assign 1-based sort index, and fold each
    * consecutive `width` rows into one wide row with columns
    * <valueCol>_1.._<width> keyed by chunk_no (reference culling.py:
    * 258-309 packs 15 reason strings per SUB row). The global window
    * is BOUNDED BY USAGE: inputs are one farm-report section's rows
    * (tens, per culling.py's per-farm loop), never a corpus relation —
    * a corpus-sized global rank belongs to [[DistributedRank]]. */
  def chunkWide(df: DataFrame, ord: Seq[Column], valueCol: String,
                width: Int): DataFrame = {
    val w = Window.orderBy(ord: _*)
    val idx = df.withColumn("__i", row_number().over(w) - 1)
    val cells = (0 until width).map(i =>
      max(when(col("__i") % width === i, col(valueCol))).as(s"${valueCol}_${i + 1}"))
    idx.groupBy((col("__i") / width).cast("long").as("chunk_no"))
      .agg(cells.head, cells.tail: _*)
  }
}
