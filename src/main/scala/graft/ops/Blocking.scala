package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocking utilities for entity resolution: candidate pairs are only
  * ever generated INSIDE a blocking key (the standard ER discipline
  * that keeps the pairwise stage at block^2, never corpus^2), and
  * oversized blocks are dropped BEFORE any pair expansion exists.
  *
  * Why the cap is load-bearing at 100 TB: a hot block of m rows
  * contributes m^2/2 pairs, and hot blocks form exactly where real
  * data is worst — boilerplate names, empty strings, default values.
  * An unselective block carries no matching signal (everything
  * matches everything), so dropping it loses nothing; production
  * pipelines route such records through an additional, more
  * selective blocking pass instead. This mirrors the suite's own
  * `Dedup.candidatePairs` maxBucket and `Dedup.invertedJaccard`
  * maxDf caps. */
object Blocking {

  /** Rows whose block has at most `maxBlock` members. The per-block
    * count is a window over the block keys — one hash exchange,
    * disk-spillable, and the SAME distribution the pairwise
    * self-join needs next, so Catalyst plans no extra shuffle for
    * the probe side. No id array or pair row ever materializes for
    * a dropped block. */
  def capBlocks(df: DataFrame, blockCols: Seq[String], maxBlock: Int): DataFrame = {
    val w = Window.partitionBy(blockCols.map(col): _*)
    df.withColumn("__block_n", count(lit(1)).over(w))
      .filter(col("__block_n") <= maxBlock)
      .drop("__block_n")
  }
}
