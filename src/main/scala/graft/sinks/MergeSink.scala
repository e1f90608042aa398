package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.UpsertMerge

/** Format-abstracted keyed MERGE sink (SURVEY S7) — ONE entry point
  * with two physical paths:
  *
  *  - [[mergeIntoTable]]: a TRUE two-branch `MERGE INTO` statement
  *    (`WHEN MATCHED THEN UPDATE` + `WHEN NOT MATCHED THEN INSERT`)
  *    executed through `spark.sql` against any V2 table format with
  *    row-level-operation support (Delta, Iceberg, Hudi). The
  *    statement is exactly what the reference's daily weather MERGE
  *    does (`weather.py:1697-1732`); `insertOnly = true` is the
  *    mid-range variant that never updates (`weather.py:2420-2443`).
  *    No Delta/Iceberg ships in this sandbox, so MergeSinkSpec
  *    EXECUTES the emitted statement against an in-repo V2 table
  *    implementing the public row-level-operation connector API
  *    (graft.v2.GraftMemCatalog, group-based — Spark's own MERGE
  *    rewrite plans the ReplaceData) and additionally holds both
  *    paths to an independent row-wise interpreter of the statement.
  *  - [[mergeIntoParquet]]: the plain-parquet fallback — the
  *    crash-recovering staging-swap ([[Sinks.upsertParquet]]
  *    machinery) with [[UpsertMerge]] supplying the same matched/
  *    not-matched semantics as a one-shuffle partial aggregation.
  *
  * BOTH paths enforce a key-unique SOURCE eagerly, before touching
  * the target. This is deliberately STRICTER than raw MERGE INTO
  * (which throws only when dup source rows match an existing target
  * row, and on a not-matched-only dup silently inserts the key
  * twice): the facade's contract is keyed-upsert into a key-unique
  * table, and the parquet path's aggregation would otherwise
  * arbitrarily resolve what the executed statement duplicates — one
  * facade must not have two behaviors. Callers dedup first
  * (LatestRecord) like any MERGE user would. The incoming frame is
  * cached around the check-then-merge pair so a non-deterministic
  * source cannot pass the gate with one set of rows and merge with
  * another. Key equality is NULL-SAFE (`<=>`) on both paths: the
  * parquet path's groupBy treats null keys as one group, so the
  * emitted ON clause must too. */
object MergeSink {

  /** The canonical two-branch MERGE statement for `table`, reading
    * from the registered view `sourceView` with columns `cols`.
    * `insertOnly = true` drops the WHEN MATCHED branch. Backtick-
    * quoted identifiers; key equality null-safe. A table whose key
    * set equals its column set degenerates to insert-only (nothing
    * to UPDATE). */
  def mergeStatement(table: String, sourceView: String, cols: Seq[String],
                     keys: Seq[String], insertOnly: Boolean = false): String = {
    require(keys.nonEmpty && keys.forall(cols.contains), s"bad keys $keys for $cols")
    val on = keys.map(k => s"t.`$k` <=> s.`$k`").mkString(" AND ")
    val nonKeys = cols.filterNot(keys.contains)
    val matched =
      if (insertOnly || nonKeys.isEmpty) ""
      else "WHEN MATCHED THEN UPDATE SET " +
        nonKeys.map(c => s"t.`$c` = s.`$c`").mkString(", ") + "\n"
    val ins = cols.map(c => s"`$c`").mkString(", ")
    val vals = cols.map(c => s"s.`$c`").mkString(", ")
    s"""MERGE INTO $table t
       |USING $sourceView s
       |ON $on
       |${matched}WHEN NOT MATCHED THEN INSERT ($ins) VALUES ($vals)""".stripMargin
  }

  /** The shared key-unique-source gate (see the object scaladoc):
    * one aggregation over the small-by-contract incoming side,
    * BEFORE any write. Callers pass an already-cached frame so the
    * gate and the merge read the same materialization. */
  private def requireKeyUnique(incoming: DataFrame, keys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val dup = incoming.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"MERGE source has multiple rows for key ${dup.headOption.orNull} — " +
        "a keyed merge must not arbitrarily resolve (parquet path) or " +
        "duplicate (MERGE INTO not-matched dups) them; dedup the source " +
        "first (LatestRecord)")
  }

  /** Execute the two-branch MERGE against a catalog table whose
    * format supports row-level operations. The incoming frame is
    * registered as a temp view for the statement's USING clause;
    * the key-unique gate runs first on the same cached frame. */
  def mergeIntoTable(spark: SparkSession, table: String, incoming: DataFrame,
                     keys: Seq[String], insertOnly: Boolean = false): Unit = {
    val inc = incoming.cache()
    try {
      requireKeyUnique(inc, keys)
      val view = "graft_merge_src_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      inc.createOrReplaceTempView(view)
      try spark.sql(mergeStatement(
        table, view, inc.columns.toSeq, keys, insertOnly))
      finally spark.catalog.dropTempView(view)
      ()
    } finally inc.unpersist()
  }

  /** Parquet fallback: identical matched/not-matched semantics via
    * the staging-swap (all-or-nothing promote, crash recovery and
    * concurrent-reader old-or-new atomicity inherited from
    * [[Sinks.upsertParquet]]'s machinery). The shared key-unique
    * gate runs first, on the same cached frame the merge reads. */
  def mergeIntoParquet(spark: SparkSession, path: String, incoming: DataFrame,
                       keys: Seq[String], insertOnly: Boolean = false): Unit = {
    val inc = incoming.cache()
    try {
      requireKeyUnique(inc, keys)
      Sinks.mergeParquet(spark, inc, path, keys,
        if (insertOnly) UpsertMerge.insertIfAbsent else UpsertMerge.upsert)
    } finally inc.unpersist()
  }
}
