package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned JDBC source — the live leg of S1. The reference reads
  * its operational store per farm on a thread pool
  * (src/weekly/data_loader.py:209-277); the Spark-native form is ONE
  * `spark.read.jdbc(url, table, predicates, props)` whose predicate
  * list carves the table so every executor pulls an independent
  * slice in parallel — no driver-side fan-out, no thread pool.
  *
  * No database exists in this sandbox, so the `load` call itself is a
  * thin passthrough; everything that can be wrong — the slicing
  * algebra (gaps or overlaps silently drop or duplicate rows), NULL
  * routing, option hygiene — is pure and unit-tested by applying the
  * generated predicates to in-memory frames (they are ordinary SQL
  * boolean expressions in both worlds).
  */
object JdbcSource {

  /** `num` WHERE-clause predicates that partition the closed range
    * [lower, upper] of `column` with NO gaps and NO overlaps:
    * stride-sized half-open slices, first slice additionally owning
    * `column IS NULL` and everything below, last slice unbounded
    * above — every row of the table lands in EXACTLY one slice even
    * when values fall outside the sampled bounds (the mirror of
    * Spark's own JDBCRelation.columnPartition contract). `num <= 1`
    * or a degenerate range collapses to one full-table predicate. */
  def rangePredicates(column: String, lower: Long, upper: Long,
                      num: Int): Seq[String] = {
    require(upper >= lower, s"upper $upper < lower $lower")
    val n = math.max(1, math.min(num.toLong, upper - lower + 1).toInt)
    if (n == 1) return Seq("1=1")
    val stride = (upper - lower + 1).toDouble / n
    val cuts = (1 until n).map(i => lower + math.round(i * stride))
    val first = s"$column < ${cuts.head} OR $column IS NULL"
    val middle = cuts.sliding(2).map { case Seq(lo, hi) =>
      s"$column >= $lo AND $column < $hi" }.toSeq
    val last = s"$column >= ${cuts.last}"
    (first +: middle) :+ last
  }

  /** One predicate per id bucket for a NON-range key (the per-farm
    * read): ids hash-bucketed driver-side into `num` IN-lists. The
    * reference's farm loop becomes `num` independent slices; a farm
    * list small enough to enumerate is small enough to IN-list. */
  def idListPredicates(column: String, ids: Seq[Long], num: Int): Seq[String] = {
    require(ids.nonEmpty, "empty id list")
    val n = math.max(1, math.min(num, ids.size))
    ids.groupBy(id => (id % n + n) % n).toSeq.sortBy(_._1).map {
      case (_, bucket) => s"$column IN (${bucket.sorted.mkString(",")})"
    }
  }

  /** Connection options every slice shares. fetchsize is the one
    * knob that matters at scale (row-at-a-time cursors starve the
    * scan); pushDownPredicate stays on so catalyst filters reach the
    * DB on top of the slice predicates. */
  def connectionProps(user: String, password: String,
                      fetchSize: Int = 10000): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("user", user)
    p.setProperty("password", password)
    p.setProperty("fetchsize", fetchSize.toString)
    p
  }

  /** The assembled read: one slice per predicate, each an independent
    * task. Untestable without a live database — kept to the single
    * passthrough call so nothing here can hide logic. */
  def read(spark: SparkSession, url: String, table: String,
           predicates: Seq[String],
           props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, predicates.toArray, props)
}
