package graft

import org.apache.spark.sql.functions._
import graft.sources.JdbcSource

/** The JDBC slicing algebra, proven against in-memory frames: the
  * generated predicates are ordinary SQL boolean expressions, so
  * their partition property (every row in EXACTLY one slice) is
  * checkable without a database. */
class JdbcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def partitionProperty(preds: Seq[String], values: Seq[Option[Long]]): Unit = {
    val df = values.toDF("k").select(col("k").cast("long").as("k"))
    val counts = preds.map(p => df.filter(expr(p.replace("k IS NULL", "k IS NULL"))).count())
    assert(counts.sum == values.size.toLong,
      s"slices must cover every row exactly once: ${counts.mkString(",")} vs ${values.size}")
  }

  test("rangePredicates: no gaps, no overlaps, nulls and out-of-bounds rows owned") {
    val preds = JdbcSource.rangePredicates("k", 0L, 99L, 4)
    assert(preds.size == 4)
    // in-range, below-lower, above-upper, and NULL all land somewhere —
    // and nowhere twice
    val values: Seq[Option[Long]] =
      (0L to 99L).map(Some(_)) ++ Seq(Some(-50L), Some(1000L), None, None)
    partitionProperty(preds, values)
  }

  test("rangePredicates: degenerate ranges collapse to one full-table slice") {
    assert(JdbcSource.rangePredicates("k", 7L, 7L, 8) == Seq("1=1"))
    assert(JdbcSource.rangePredicates("k", 0L, 99L, 1) == Seq("1=1"))
    // more slices than values: clamps instead of emitting empty slices
    val preds = JdbcSource.rangePredicates("k", 0L, 2L, 10)
    assert(preds.size == 3)
    partitionProperty(preds, (0L to 2L).map(Some(_)))
  }

  test("idListPredicates: every id in exactly one IN-list slice") {
    val ids = Seq(1L, 2L, 3L, 848L, 1234L, 1387L, 2807L)
    val preds = JdbcSource.idListPredicates("k", ids, 3)
    assert(preds.size == 3)
    partitionProperty(preds, ids.map(Some(_)))
    // ids absent from the list match no slice
    val df = Seq(999L).toDF("k")
    assert(preds.map(p => df.filter(expr(p)).count()).sum == 0L)
  }

  test("connectionProps carries the fetchsize knob") {
    val p = JdbcSource.connectionProps("svc", "pw", fetchSize = 5000)
    assert(p.getProperty("fetchsize") == "5000" && p.getProperty("user") == "svc")
  }
}
