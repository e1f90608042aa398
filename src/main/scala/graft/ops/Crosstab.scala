package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-column pivots via conditional aggregation (SURVEY A3/A4).
  *
  * The reference builds its crosstabs (parity x status sow matrix,
  * 13-metric x 7-day shipment grid, task x D1..D7 schedule) with
  * explicit per-cell sums (`/root/reference/src/weekly/processors/
  * base.py:421-453`, `modon.py:150-243`, `shipment.py:356-568`,
  * `schedule.py:901-930`). `sum(when(...))` with a FIXED column list is
  * preferred over `.pivot(col)` because the output schema is static
  * (no extra distinct-values job) and whole-stage codegen keeps the
  * whole aggregation in one pass.
  */
object Crosstab {

  /** groupBy(rows).agg( per v in values: agg(when(pivot === v, value)) ). */
  def sumWhen(df: DataFrame, rows: Seq[String], pivot: Column,
              values: Seq[String], value: Column,
              prefix: String = "c_"): DataFrame = {
    val aggs = values.map(v =>
      sum(when(pivot === v, value).otherwise(lit(null))).as(s"$prefix$v"))
    df.groupBy(rows.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  def countWhen(df: DataFrame, rows: Seq[String], pivot: Column,
                values: Seq[String], prefix: String = "n_"): DataFrame = {
    val aggs = values.map(v =>
      count(when(pivot === v, lit(1))).as(s"$prefix$v"))
    df.groupBy(rows.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
