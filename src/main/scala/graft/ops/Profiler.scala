package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiler — the ANALYZE TABLE / data-quality-report
  * operator every ingestion pipeline runs before trusting a feed:
  * per column, non-null count, exact distinct count, min and max
  * (rendered as strings for a uniform tall schema), plus the row
  * count.
  *
  * All statistics come from ONE aggregation over ONE scan: the
  * multiple COUNT(DISTINCT) columns plan as a single Expand +
  * aggregate pass (Catalyst's standard multi-distinct strategy), so
  * the scan cost is paid once no matter how many columns are
  * profiled. The wide one-row result is unpivoted driver-free with
  * `stack`. At 100 TB: one shuffle of Expand partials, no per-column
  * jobs, no collect. Exact distincts are the correctness baseline;
  * swap `count_distinct` for `approx_count_distinct` (HLL) when the
  * profile itself need not be exact. */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, count_distinct(_))

  /** The 100 TB default the exact profile's docstring names, now a
    * first-class variant: `approx_count_distinct` (HLL++, relative
    * standard deviation `rsd`, default 5%) replaces the exact
    * distincts. Beyond trading exactness for memory, this DELETES the
    * Expand: multi-column exact distincts plan as one Expand that
    * multiplies the scan's rows by 4x|cols| before aggregating, while
    * the HLL sketch is a plain aggregate — the wide row aggregates in
    * a single pass with NO row multiplication at all. Every other
    * statistic (row/non-null counts, min/max) stays exact.
    * CurationSpec gates the sketch against the exact profile at 3x
    * rsd, mirroring the q87 approx-percentile twin. */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(c, rsd))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctOf: org.apache.spark.sql.Column =>
                            org.apache.spark.sql.Column): DataFrame = {
    // positional aliases: the unpivot below re-parses names, so the
    // generated identifiers must be quotable regardless of what the
    // source columns are called ("order key", "a.b", quotes, ...)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(col(c)).as(s"c${i}__nn"),
      distinctOf(col(c)).as(s"c${i}__nd"),
      min(col(c)).cast("string").as(s"c${i}__mn"),
      max(col(c)).cast("string").as(s"c${i}__mx"))
    } :+ count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    def lit_(c: String) = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stackArgs = cols.indices.map(i =>
      s"${lit_(cols(i))}, c${i}__nn, c${i}__nd, c${i}__mn, c${i}__mx").mkString(", ")
    wide.selectExpr("__n AS n_rows",
        s"stack(${cols.length}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_value, max_value)")
      .select("col_name", "n_rows", "n_nonnull", "n_distinct",
        "min_value", "max_value")
  }
}
