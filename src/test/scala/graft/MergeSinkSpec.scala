package graft

import java.nio.file.Files
import graft.sinks.MergeSink

/** Contract spec for the format-abstracted MERGE sink, THREE legs
  * held to one semantics: (1) an INDEPENDENT row-wise interpreter of
  * the emitted statement (a per-key mutable map — nothing shared with
  * UpsertMerge's one-shuffle aggregation); (2) the parquet
  * staging-swap path; (3) the statement EXECUTED for real — no
  * Delta/Iceberg ships in this sandbox, so [[graft.v2.
  * GraftMemCatalog]] implements the public row-level-operation
  * connector API and Spark's own MERGE rewrite (ReplaceData over a
  * full-outer MergeRows) runs the emitted SQL end to end. All three
  * must agree on the same inputs, for both the update and the
  * insert-only branch shapes; the statement text is also asserted
  * exactly, and a dup-keyed source is rejected on every path. */
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

  test("parquet path rejects a duplicate-key source exactly like MERGE INTO would") {
    val path = tmp() + "/t_dup"
    MergeSink.mergeIntoParquet(spark, path, df(target), Seq("k"))
    val before = spark.read.parquet(path).count()
    val dupSource = df(Seq((Option(2L), "TWO", 22), (Option(2L), "two2", 23)))
    val e = intercept[IllegalArgumentException] {
      MergeSink.mergeIntoParquet(spark, path, dupSource, Seq("k"))
    }
    assert(e.getMessage.contains("multiple rows"), e.getMessage)
    // the loud failure happened BEFORE any write touched the target
    assert(spark.read.parquet(path).count() == before,
      "a rejected merge must leave the target untouched")
  }

  test("empty source and empty target degenerate cleanly on the parquet path") {
    val path = tmp() + "/t_empty"
    // empty source into an ABSENT target: creates the (empty) table
    MergeSink.mergeIntoParquet(spark, path, df(Nil), Seq("k"))
    assert(spark.read.parquet(path).count() == 0)
    // real rows into the empty table, then an empty source = no-op
    MergeSink.mergeIntoParquet(spark, path, df(target), Seq("k"))
    MergeSink.mergeIntoParquet(spark, path, df(Nil), Seq("k"))
    assert(spark.read.parquet(path).count() == target.size.toLong)
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

  // ---- REAL executed MERGE INTO: third leg of the contract --------
  // graft.v2.GraftMemCatalog implements the public row-level-
  // operation connector API (group-based, the Delta/Iceberg
  // copy-on-write posture), so mergeIntoTable's emitted statement
  // EXECUTES here through Spark's own MERGE rewrite (ReplaceData) —
  // update and insert-only branches both checked against the same
  // row-wise interpreter the parquet path is held to.
  private def memTable(name: String,
                       rows: Seq[(Option[Long], String, Int)],
                       mode: String = "group"): String = {
    spark.conf.set("spark.sql.catalog.graftmem",
      classOf[graft.v2.GraftMemCatalog].getName)
    val cat = spark.sessionState.catalogManager.catalog("graftmem")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("ns"), name)
    if (cat.tableExists(ident)) cat.dropTable(ident)
    val props = new java.util.HashMap[String, String]()
    props.put(graft.v2.GraftMemStore.ModeProperty, mode)
    cat.createTable(ident, df(rows).schema,
      Array.empty[org.apache.spark.sql.connector.expressions.Transform],
      props)
    val t = s"graftmem.ns.$name"
    df(rows).writeTo(t).append()
    t
  }

  /** Both row-level table shapes the emitted statement must execute
    * through: group-based (ReplaceData, copy-on-write) and
    * delta-based (WriteDelta, positional merge-on-read). */
  private val modes = Seq("group", "delta")

  private def readBack(t: String): Seq[(Option[Long], String, Int)] =
    spark.table(t).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.getInt(2)))
      .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2)).toSeq

  modes.foreach { mode =>
    test(s"the emitted MERGE INTO EXECUTES against a $mode-based V2 table (update branch)") {
      val t = memTable(s"m_up_$mode", target, mode)
      MergeSink.mergeIntoTable(spark, t, df(source), Seq("k"))
      val want = interpret(target, source, insertOnly = false)
        .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2))
      assert(readBack(t) == want,
        s"executed MERGE ($mode) ${readBack(t)} vs statement semantics $want")
    }

    test(s"the emitted MERGE INTO EXECUTES against a $mode-based V2 table (insert-only)") {
      val t = memTable(s"m_ins_$mode", target, mode)
      MergeSink.mergeIntoTable(spark, t, df(source), Seq("k"), insertOnly = true)
      val want = interpret(target, source, insertOnly = true)
        .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2))
      assert(readBack(t) == want,
        s"executed insert-only MERGE ($mode) ${readBack(t)} vs statement semantics $want")
    }
  }

  test("the delta-based plan really is a WriteDelta (not a ReplaceData rewrite)") {
    // the matrix is only a matrix if the two modes take different
    // rewrites: assert the optimized plan class per mode
    def planFor(mode: String): String = {
      val t = memTable(s"m_plan_$mode", target, mode)
      val view = "m_plan_src"
      df(source).createOrReplaceTempView(view)
      try spark.sessionState.executePlan(
        spark.sessionState.sqlParser.parsePlan(
          MergeSink.mergeStatement(t, view, Seq("k", "name", "v"), Seq("k"))))
        .optimizedPlan match {
          // MERGE executes eagerly; the rewritten command hides
          // behind the CommandResult wrapper
          case cr: org.apache.spark.sql.catalyst.plans.logical.CommandResult =>
            cr.commandLogicalPlan.getClass.getSimpleName
          case other => other.getClass.getSimpleName
        }
      finally spark.catalog.dropTempView(view)
    }
    assert(planFor("group").contains("ReplaceData"), planFor("group"))
    assert(planFor("delta").contains("WriteDelta"), planFor("delta"))
  }

  test("the executed-MERGE leg rejects a duplicate-key source like the parquet leg") {
    // raw MERGE INTO would silently insert a not-matched dup key
    // TWICE — the facade is deliberately stricter and gates BOTH
    // paths identically, so one pipeline cannot behave differently
    // per sink format
    val t = memTable("m_dup", target)
    val dupSource = df(Seq((Option(9L), "nine", 90), (Option(9L), "NINE", 91)))
    val e = intercept[IllegalArgumentException] {
      MergeSink.mergeIntoTable(spark, t, dupSource, Seq("k"))
    }
    assert(e.getMessage.contains("multiple rows"), e.getMessage)
    assert(readBack(t) == target.sortBy(r => (r._1.getOrElse(Long.MinValue), r._2)),
      "a rejected merge must leave the V2 table untouched")
  }

  test("all FOUR paths agree: group MERGE == delta MERGE == parquet staging-swap == interpreter") {
    val tg = memTable("m_tri_g", target, "group")
    MergeSink.mergeIntoTable(spark, tg, df(source), Seq("k"))
    val td = memTable("m_tri_d", target, "delta")
    MergeSink.mergeIntoTable(spark, td, df(source), Seq("k"))
    val path = tmp() + "/t_tri"
    MergeSink.mergeIntoParquet(spark, path, df(target), Seq("k"))
    MergeSink.mergeIntoParquet(spark, path, df(source), Seq("k"))
    val viaParquet = spark.read.parquet(path).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1), r.getInt(2)))
      .sortBy(r => (r._1.getOrElse(Long.MinValue), r._2)).toSeq
    assert(readBack(tg) == viaParquet,
      s"executed group MERGE ${readBack(tg)} vs parquet path $viaParquet")
    assert(readBack(td) == viaParquet,
      s"executed delta MERGE ${readBack(td)} vs parquet path $viaParquet")
  }

  test("against a NON-row-level v1 table the statement fails only at the capability check") {
    // the negative leg: against a plain parquet session-catalog table
    // Spark parses + analyzes the emitted statement and rejects it
    // only at the table-capability check — the same SQL that executes
    // against the row-level-capable catalog above
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
