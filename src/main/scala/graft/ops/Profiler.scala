package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler — the ANALYZE TABLE / data-quality-report operator
  * every ingestion pipeline runs before trusting a feed: per column,
  * non-null count, exact distinct count, min and max (rendered as
  * strings for a uniform tall schema), plus the row count.
  *
  * The exact profile runs TWO aggregation branches over the scan and
  * cross-joins their single rows: the multi-distinct branch (Catalyst's
  * standard Expand + aggregate pass — one Expand no matter how many
  * columns) and a keyless min/max/count branch. Why not one combined
  * aggregate: min/max over a string column carry an IMMUTABLE
  * aggregation buffer, which forces the whole aggregate from
  * HashAggregate to SortAggregate — and under the Expand that means
  * every one of the (|cols|+1) x N expanded rows is SORTED on the
  * distinct grouping key before the partial agg (measured as the whole
  * q105 clock at sf0.1: 5.0 s, a full sort of 3M expanded rows inside
  * one scan task). Split, the distinct branch keeps only long count
  * buffers (pure HashAggregate, no Sort node at any scale) and the
  * min/max branch is a keyless streaming fold (no grouping keys = no
  * required child ordering = no Sort, no row multiplication). The
  * cross join is a one-row broadcast. The wide one-row result is
  * unpivoted driver-free with `stack`. At 100 TB: two scans of pruned
  * columns instead of one corpus-wide sort — scans are the cheap side
  * of that trade at every scale. Exact distincts are the correctness
  * baseline; swap `count_distinct` for `approx_count_distinct` (HLL)
  * when the profile itself need not be exact. */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // exact multi-distinct: split branches (see object doc — the
    // combined form sorts the Expand output under SortAggregate)
    val ndAggs = cols.zipWithIndex.map { case (c, i) =>
      count_distinct(col(c)).as(s"c${i}__nd")
    }
    unpivot(cols, minMaxWide(df, cols)
      .crossJoin(df.agg(ndAggs.head, ndAggs.tail: _*)))
  }

  /** The 100 TB default when exactness is not required:
    * `approx_count_distinct` (HLL++, relative standard deviation
    * `rsd`, default 5%) replaces the exact distincts. The sketch is a
    * plain aggregate with a mutable buffer, so this variant stays ONE
    * single-pass keyless aggregate over ONE scan: no Expand, no row
    * multiplication, no second branch. Every other statistic
    * (row/non-null counts, min/max) stays exact. CurationSpec gates
    * the sketch against the exact profile at 3x rsd, mirroring the
    * q87 approx-percentile twin. */
  def profileApprox(df: DataFrame, cols: Seq[String],
                    rsd: Double = 0.05): DataFrame = {
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(col(c)).as(s"c${i}__nn"),
      approx_count_distinct(col(c), rsd).as(s"c${i}__nd"),
      min(col(c)).cast("string").as(s"c${i}__mn"),
      max(col(c)).cast("string").as(s"c${i}__mx"))
    } :+ count(lit(1)).as("__n")
    unpivot(cols, df.agg(aggs.head, aggs.tail: _*))
  }

  /** Keyless non-null-count/min/max/rowcount branch: a single
    * streaming fold (SortAggregate without grouping keys plans no
    * Sort node). */
  private def minMaxWide(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(col(c)).as(s"c${i}__nn"),
      min(col(c)).cast("string").as(s"c${i}__mn"),
      max(col(c)).cast("string").as(s"c${i}__mx"))
    } :+ count(lit(1)).as("__n")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Wide one-row (c<i>__nn/__nd/__mn/__mx..., __n) -> tall profile.
    * Positional aliases: the unpivot re-parses names, so the generated
    * identifiers must be quotable regardless of what the source
    * columns are called ("order key", "a.b", quotes, ...). */
  private def unpivot(cols: Seq[String], wide: DataFrame): DataFrame = {
    def lit_(c: String) = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stackArgs = cols.indices.map(i =>
      s"${lit_(cols(i))}, c${i}__nn, c${i}__nd, c${i}__mn, c${i}__mx").mkString(", ")
    wide.selectExpr("__n AS n_rows",
        s"stack(${cols.length}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_value, max_value)")
      .select("col_name", "n_rows", "n_nonnull", "n_distinct",
        "min_value", "max_value")
  }
}
