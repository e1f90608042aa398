package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calendar spine + left join (SURVEY J7).
  *
  * The reference generates a 7-day list with CONNECT BY LEVEL <= 7 and
  * left-joins daily slaughter aggregates so empty days surface as
  * explicit rows (`/root/reference/src/weekly/data_loader.py:500-536`;
  * NULL-vs-0 contract at `shipment.py:266-289`).
  */
object DateSpine {

  /** One row per day in [start, end], inclusive, column `day: date`. */
  def daily(spark: SparkSession, start: String, end: String): DataFrame =
    spark.range(1).select(
      explode(sequence(to_date(lit(start)), to_date(lit(end)))).as("day"))

  /** Left-join daily facts onto the spine; `fill` maps column name ->
    * default used when the day has no row (0 for counts, or keep null
    * to preserve the reference's NULL-day contract). */
  def leftJoin(spine: DataFrame, daily: DataFrame, dayCol: String,
               fill: Map[String, Any]): DataFrame = {
    val joined = spine.join(daily, spine("day") === daily(dayCol), "left")
      .drop(dayCol)
    fill.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }
  }
}
