package graft

import java.nio.file.Files
import graft.sinks.MergeSink

/** Contract spec for the format-abstracted MERGE sink: the emitted
  * two-branch MERGE INTO statement defines the semantics; an
  * INDEPENDENT row-wise interpreter of that statement (a per-key
  * mutable map — nothing shared with UpsertMerge's one-shuffle
  * aggregation) and the parquet staging-swap path must produce
  * identical tables on the same inputs, for both the update and the
  * insert-only branch shapes. No MERGE-capable table format ships in
  * this sandbox, so statement EXECUTION against Delta/Iceberg is the
  * one leg that stays environment-bound (mergeIntoTable wires it);
  * the statement text itself is asserted exactly. */
class MergeSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_merge").toString

  // the naive interpreter: WHEN MATCHED (null-safe key equality) THEN
  // UPDATE all non-key columns / WHEN NOT MATCHED THEN INSERT; with
  // insertOnly the matched branch is absent. Key-unique source assumed
  // (the MERGE precondition both paths share).
  private def interpret(target: Seq[(Option[Long], String, Int)],
                        source: Seq[(Option[Long], String, Int)],
                        insertOnly: Boolean): Seq[(Option[Long], String, Int)] = {
    val byKey = scala.collection.mutable.LinkedHashMap(
      target.map(r => r._1 -> r): _*)
    source.foreach { s =>
      if (byKey.contains(s._1)) { if (!insertOnly) byKey(s._1) = s }
      else byKey(s._1) = s
    }
    byKey.values.toSeq
  }

  private def df(rows: Seq[(Option[Long], String, Int)]) =
    rows.toDF("k", "name", "v")

  private val target = Seq(
    (Option(1L), "one", 10), (Option(2L), "two", 20),
    (None, "nullkey", 30)) // null key: <=> must match it
  private val source = Seq(
    (Option(2L), "TWO", 22),      // matched -> update (or skip)
    (None, "NULLKEY", 33),        // matched via null-safe equality
    (Option(4L), "four", 44))     // not matched -> insert

  private def runBoth(insertOnly: Boolean): Unit = {
    val path = tmp() + (if (insertOnly) "/t_ins" else "/t_up")
    MergeSink.mergeIntoParquet(spark, path, df(target), Seq("k"))
    MergeSink.mergeIntoParquet(spark, path, df(source), Seq("k"), insertOnly)
    val got = spark.read.parquet(path)
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.getInt(2)))
      .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2))
    val want = interpret(target, source, insertOnly)
      .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2))
    assert(got.toSeq == want,
      s"insertOnly=$insertOnly: parquet path ${got.toSeq} vs statement semantics $want")
  }

  test("parquet path equals the MERGE statement semantics (update branch)") {
    runBoth(insertOnly = false)
  }

  test("parquet path equals the MERGE statement semantics (insert-only)") {
    runBoth(insertOnly = true)
  }

  test("emitted statement is the canonical two-branch MERGE INTO") {
    val got = MergeSink.mergeStatement(
      "lake.weather", "src_v", Seq("k", "name", "v"), Seq("k"))
    assert(got ==
      """MERGE INTO lake.weather t
        |USING src_v s
        |ON t.`k` <=> s.`k`
        |WHEN MATCHED THEN UPDATE SET t.`name` = s.`name`, t.`v` = s.`v`
        |WHEN NOT MATCHED THEN INSERT (`k`, `name`, `v`) VALUES (s.`k`, s.`name`, s.`v`)""".stripMargin,
      got)
    val ins = MergeSink.mergeStatement(
      "lake.weather", "src_v", Seq("k", "v"), Seq("k"), insertOnly = true)
    assert(!ins.contains("WHEN MATCHED") &&
      ins.contains("WHEN NOT MATCHED THEN INSERT (`k`, `v`)"), ins)
    // all-key table: nothing to update -> matched branch drops itself
    val allKeys = MergeSink.mergeStatement(
      "t", "s_v", Seq("a", "b"), Seq("a", "b"))
    assert(!allKeys.contains("WHEN MATCHED"), allKeys)
  }

  test("mergeIntoTable emits SQL the session parser accepts (no MERGE-capable format here)") {
    // the statement must be syntactically valid MERGE SQL: against a
    // plain parquet session-catalog table Spark parses + analyzes it
    // and rejects it only at the table-capability check, proving the
    // emitted text is executable exactly where the format supports
    // row-level operations
    spark.sql("DROP TABLE IF EXISTS graft_merge_contract")
    Seq((1L, "a")).toDF("k", "s").write.saveAsTable("graft_merge_contract")
    val e = intercept[Exception] {
      MergeSink.mergeIntoTable(spark, "graft_merge_contract",
        Seq((2L, "b")).toDF("k", "s"), Seq("k"))
    }
    val msg = e.toString.toUpperCase
    assert(msg.contains("MERGE") || msg.contains("ROW-LEVEL") ||
      msg.contains("UNSUPPORTED"), s"unexpected failure class: $e")
    spark.sql("DROP TABLE IF EXISTS graft_merge_contract")
  }
}
