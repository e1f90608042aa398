package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prev/next event attachment (SURVEY J2/W4).
  *
  * The reference self-joins the work log on exact SEQ±1 to attach the
  * previous/next event per sow (`/root/reference/src/weekly/
  * data_loader.py:299-327`). Over an ordered, gapless per-key ordinal
  * this is exactly lag/lead; Spark's window form is one shuffle and no
  * join. For the literal SEQ±1-with-gaps semantics use `viaSelfJoin`.
  */
object PrevNext {

  /** Attach `lag(attach)` / `lead(attach)` per key, ordered by `ord`
    * (must be total per key). Emits columns prev_<c> / next_<c>. */
  def viaWindow(df: DataFrame, keys: Seq[String], ord: Seq[Column],
                attach: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    attach.foldLeft(df) { (d, c) =>
      d.withColumn(s"prev_$c", lag(col(c), 1).over(w))
        .withColumn(s"next_$c", lead(col(c), 1).over(w))
    }
  }

  /** Literal SEQ±1 equi-self-join (reference semantics when the
    * ordinal has gaps after filtering — SURVEY §7.4 risk 4): a gap
    * yields NULL neighbours even though an earlier/later row exists. */
  def viaSelfJoin(df: DataFrame, keys: Seq[String], seqCol: String,
                  attach: Seq[String]): DataFrame = {
    def side(tag: String): DataFrame =
      df.select((keys :+ seqCol).map(c => col(c).as(s"__${tag}_$c")) ++
        attach.map(c => col(c).as(s"${tag}_$c")): _*)

    def cond(d: DataFrame, tag: String, offset: Int): Column =
      keys.map(k => col(k) === d(s"__${tag}_$k")).reduce(_ && _) &&
        col(seqCol) + offset === d(s"__${tag}_$seqCol")

    val prev = side("prev")
    val next = side("next")
    df.join(prev, cond(prev, "prev", -1), "left")
      .join(next, cond(next, "next", 1), "left")
      .drop((keys :+ seqCol).flatMap(c => Seq(s"__prev_$c", s"__next_$c")): _*)
  }
}
