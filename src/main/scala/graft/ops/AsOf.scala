package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY J3/J4): for each probe row, the latest event row
  * of the same key with event.time <= probe.time.
  *
  * Reference forms: theta self-join + MIN KEEP DENSE_RANK
  * (`/root/reference/src/weekly/processors/weaning.py:145-162`) and a
  * per-sow backwards scan in Python (`accident.py:129-174`).
  *
  * Implementation is the scalable union+window formulation: tag events
  * and probes, union, then `last(value, ignoreNulls)` over
  * (key ORDER BY time, side, tie) rowsBetween(unboundedPreceding, 0).
  * ONE shuffle on the key, no quadratic theta join — survives 100 TB
  * where the naive `probe JOIN events ON e.t <= p.t` (a range join)
  * would explode. Events sort before probes at equal time, so the join
  * is inclusive (<=); ties among events resolve to max `tie`.
  */
object AsOf {

  /** @param events  rows providing values (key, time, tie, attach...)
    * @param probes  rows receiving values (key, time, ...)
    * @param keys    equi-join keys present in both
    * @param time    time column name present in both
    * @param tie     unique-per-event tiebreak column in `events`
    * @param attach  event columns to carry to the probe, emitted as
    *                asof_<name>
    */
  def join(events: DataFrame, probes: DataFrame, keys: Seq[String],
           time: String, tie: String, attach: Seq[String]): DataFrame = {
    val probeCols = probes.columns
    val payload = struct((Seq(time, tie) ++ attach).distinct.map(col): _*)

    val e = events.select(
      keys.map(col) ++ Seq(col(time).as("__t"), lit(0).as("__side"),
        col(tie).cast("long").as("__tie"), payload.as("__payload")) ++
        probeCols.filterNot(keys.contains).map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val p = probes.select(
      keys.map(col) ++ Seq(col(time).as("__t"), lit(1).as("__side"),
        lit(Long.MaxValue).as("__tie"),
        lit(null).cast(e.schema("__payload").dataType).as("__payload")) ++
        probeCols.filterNot(keys.contains).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    e.unionByName(p)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        attach.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
