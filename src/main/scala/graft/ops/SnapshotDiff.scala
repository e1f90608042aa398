package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Row-level diff of two table snapshots on a natural key — the
  * reference's post-migration validation workflow
  * (`/root/reference/compare_backup.py:98-170`: current vs *_BAK
  * tables, per-column compare with numeric tolerance 0.01 and
  * missing-value coalescing to 0, per-key verdict + diff listing).
  *
  * Spark-first: ONE full outer join on the key (both sides shuffle on
  * the key once; at 100 TB the snapshots co-partition/bucket on the
  * same key so the exchange disappears), per-column comparison as
  * codegen'd expressions, differing column names collected into an
  * array — no driver-side row loop over keys like the reference's
  * cursor scan.
  */
object SnapshotDiff {

  /** Per key: status MATCH / DIFF / ONLY_LEFT / ONLY_RIGHT, the number
    * of differing compare columns and their names (sorted, joined —
    * deterministic). Numeric columns compare with |l - r| > tol after
    * null -> 0 coalescing (the reference's `val or 0`); everything
    * else compares null-safe exact (<=>). */
  def diff(left: DataFrame, right: DataFrame, keys: Seq[String],
           compareCols: Seq[String], tol: Double = 0.01): DataFrame = {
    val l = left.select((keys ++ compareCols).map(col): _*)
      .withColumn("__l", lit(1))
    val r = right.select((keys ++ compareCols).map(col): _*)
    val rRenamed = r.columns.foldLeft(r)((df, c) =>
      if (keys.contains(c)) df else df.withColumnRenamed(c, s"__r_$c"))
      .withColumn("__r", lit(1))
    val joined = l.join(rRenamed, keys, "full_outer")

    val numeric: String => Boolean = c =>
      left.schema(c).dataType == DoubleType || left.schema(c).dataType == FloatType

    def differs(c: String): Column = {
      val (a, b) = (col(c), col(s"__r_$c"))
      if (numeric(c))
        abs(coalesce(a, lit(0.0)) - coalesce(b, lit(0.0))) > tol
      else !(a <=> b)
    }

    val diffCols = array_sort(concat(compareCols.map(c =>
      when(differs(c), array(lit(c))).otherwise(array().cast("array<string>"))): _*))
    joined
      .withColumn("status",
        when(col("__r").isNull, "ONLY_LEFT")
          .when(col("__l").isNull, "ONLY_RIGHT")
          .when(size(diffCols) > 0, "DIFF")
          .otherwise("MATCH"))
      .withColumn("n_diffs",
        when(col("status") === "DIFF", size(diffCols).cast("long")).otherwise(0L))
      .withColumn("diff_cols",
        when(col("status") === "DIFF", array_join(diffCols, ",")).otherwise(""))
      .select((keys.map(col) ++ Seq(col("status"), col("n_diffs"), col("diff_cols"))): _*)
  }
}
