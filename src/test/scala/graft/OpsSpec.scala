package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("LatestRecord: agg and window forms agree on a total order") {
    val df = Seq(
      (1, "a", 1, "x"), (1, "a", 3, "y"), (1, "a", 2, "z"),
      (1, "b", 7, "p"), (2, "a", 1, "q")).toDF("farm", "pig", "seq", "v")
    val viaAgg = LatestRecord.viaAgg(df, Seq("farm", "pig"), Seq("seq"))
      .orderBy("farm", "pig").collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3)))
    val viaWin = LatestRecord.viaWindow(df, Seq("farm", "pig"), Seq(col("seq")))
      .select("farm", "pig", "seq", "v")
      .orderBy("farm", "pig").collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3)))
    assert(viaAgg.toSeq == Seq((1, "a", 3, "y"), (1, "b", 7, "p"), (2, "a", 1, "q")))
    assert(viaAgg.toSeq == viaWin.toSeq)
  }

  test("PrevNext.viaSelfJoin honours SEQ gaps (reference SEQ±1 semantics)") {
    // seq 1,2,4: row 4 must see NO prev (gap), row 2 must see no next
    val df = Seq((1, "a", 1, "G"), (1, "a", 2, "B"), (1, "a", 4, "E"))
      .toDF("farm", "pig", "seq", "g")
    val out = PrevNext.viaSelfJoin(df, Seq("farm", "pig"), "seq", Seq("g"))
      .orderBy("seq").collect()
    assert(out.map(_.getAs[String]("prev_g")).toSeq == Seq(null, "G", null))
    assert(out.map(_.getAs[String]("next_g")).toSeq == Seq("B", null, null))
    // while the window form bridges the gap
    val win = PrevNext.viaWindow(df, Seq("farm", "pig"), Seq(col("seq")), Seq("g"))
      .orderBy("seq").collect()
    assert(win.map(_.getAs[String]("prev_g")).toSeq == Seq(null, "G", "B"))
  }

  test("AsOf.join equals the naive theta-join formulation") {
    val rng = new scala.util.Random(7)
    val events = (1 to 200).map(_ => (rng.nextInt(5), rng.nextInt(1000), rng.nextInt(100000), rng.nextDouble()))
      .toDF("k", "t", "tie", "v")
    val probes = (1 to 100).map(i => (rng.nextInt(6), rng.nextInt(1000), i))
      .toDF("k", "t", "pid")
    val got = AsOf.join(events, probes, Seq("k"), "t", "tie", Seq("v"))
      .select("pid", "asof_v").orderBy("pid")
      .collect().map(r => (r.getInt(0), Option(r.get(1))))
    // naive: per probe, event with max (t, tie) among t <= probe.t
    val evRows = events.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val exp = probes.collect().map { p =>
      val (k, t, pid) = (p.getInt(0), p.getInt(1), p.getInt(2))
      val cands = evRows.filter(e => e._1 == k && e._2 <= t)
      (pid, if (cands.isEmpty) None else Some(cands.maxBy(e => (e._2, e._3))._4))
    }.sortBy(_._1)
    assert(got.toSeq == exp.toSeq)
  }

  test("UpsertMerge: incoming wins; insertIfAbsent keeps old") {
    val old = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "n", "v")
    val inc = Seq((1, "a", 99), (3, "c", 30)).toDF("k", "n", "v")
    val up = UpsertMerge.upsert(old, inc, Seq("k")).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getInt(2)))
    assert(up.toSeq == Seq((1, 99), (2, 20), (3, 30)))
    val ifa = UpsertMerge.insertIfAbsent(old, inc, Seq("k")).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getInt(2)))
    assert(ifa.toSeq == Seq((1, 10), (2, 20), (3, 30)))
    val di = UpsertMerge.deleteInsert(old, inc, Seq("k")).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getInt(2)))
    assert(di.toSeq == Seq((1, 99), (2, 20), (3, 30)))
  }

  test("UpsertMerge property: re-applying the same batch is a no-op (idempotence)") {
    // the sink-family hardening: a retried/duplicated batch must not
    // change the target — MERGE and delete+insert are both idempotent
    // on (target ∘ batch), and insert-if-absent trivially so. Random
    // keyed batches over a deterministic LCG, overlapping + disjoint.
    var seed = 0xcafeL
    def next(mod: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % mod + mod) % mod).toInt
    }
    for (round <- 1 to 3) {
      val old = (1 to 20).map(k => (k, s"o$k", next(100))).toDF("k", "n", "v")
      val inc = (1 to 10).map(_ => next(30)).distinct
        .map(k => (k, s"i$k", next(100))).toDF("k", "n", "v")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("k").collect().map(r =>
          (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
      for (op <- Seq[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =>
                     org.apache.spark.sql.DataFrame](
          UpsertMerge.upsert(_, _, Seq("k")),
          UpsertMerge.insertIfAbsent(_, _, Seq("k")),
          UpsertMerge.deleteInsert(_, _, Seq("k")))) {
        val once = op(old, inc)
        val twice = op(once, inc)
        assert(canon(twice) == canon(once), s"round $round must be idempotent")
      }
    }
  }

  test("TextOps PII scrub: counts and typed placeholders, non-PII text untouched") {
    import graft.ops.text.TextOps
    val df = Seq(
      ("mail a.b+c@ex-ample.co.kr or x@y.io, call 010-123-4567, host 10.0.255.3", 2, 1, 1,
        "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP>"),
      // version strings / bare digits / undashed numbers must survive
      ("v1.2 beta, build 20251112, at 3.14 degrees", 0, 0, 0,
        "v1.2 beta, build 20251112, at 3.14 degrees"))
      .toDF("text", "e", "p", "i", "want")
    val got = df.select(TextOps.nEmails(col("text")), TextOps.nPhones(col("text")),
        TextOps.nIpv4s(col("text")), TextOps.redactPii(col("text")),
        col("e"), col("p"), col("i"), col("want")).collect()
    got.foreach { r =>
      assert((r.getInt(0), r.getInt(1), r.getInt(2)) == (r.getInt(4), r.getInt(5), r.getInt(6)))
      assert(r.getString(3) == r.getString(7))
    }
  }

  test("TextOps Gopher ratios: alpha-word and symbol-word rules fire on planted walls") {
    import graft.ops.text.TextOps
    val df = Seq(
      // 4 of 5 words alphabetic -> 0.8; one '#' + one '...' over 5 words -> 0.4
      ("the quick brown fox 99", 0.8, 0.0),
      ("see # this ... now", 0.6, 0.4),
      ("all words are letters", 1.0, 0.0))
      .toDF("text", "wantAlpha", "wantSym")
    df.select(TextOps.alphaWordRatio(col("text")), TextOps.symbolWordRatio(col("text")),
        col("wantAlpha"), col("wantSym")).collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(2), s"alpha: $r")
      assert(r.getDouble(1) == r.getDouble(3), s"sym: $r")
    }
  }

  test("TextOps urlCanon: port/www/utm/fragment/case variants alias to one identity") {
    import graft.ops.text.TextOps
    val df = Seq(
      "https://www.Site.COM:443/a/b/?utm_source=x&utm_c=y",
      "HTTPS://site.com/a/b",
      "https://site.com:80/a/b/#frag",
      "https://site.com/a/b").toDF("url")
    val canon = df.select(TextOps.urlCanon(col("url"))).collect().map(_.getString(0))
    assert(canon.toSet == Set("https://site.com/a/b"), canon.mkString(", "))
    // a non-default port and a real (non-utm) query are PRESERVED
    val kept = Seq("https://site.com:8080/a?id=3").toDF("url")
      .select(TextOps.urlCanon(col("url"))).head.getString(0)
    assert(kept == "https://site.com:8080/a?id=3", kept)
  }

  test("TextOps urlCanon is idempotent: canon(canon(u)) == canon(u)") {
    import graft.ops.text.TextOps
    val urls = Seq(
      "https://www.Site.COM:443/a/b/?utm_source=x",
      "HTTPS://site.com/a/b",
      "https://site.com:8080/a?id=3",
      "http://h.example.org/x/y/z/#f",
      "not a url at all").toDF("url")
    val twice = urls
      .select(TextOps.urlCanon(col("url")).as("c1"))
      .select(col("c1"), TextOps.urlCanon(col("c1")).as("c2"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not a fixed point: ${r.getString(0)} -> ${r.getString(1)}"))
  }

  test("scd2: changed keys version, no-op and absent keys pass, nulls compare null-safe") {
    val cur = Seq(
      (1L, Option(10.0), "2024-01-01", "9999-12-31", "Y"),
      (2L, Option.empty[Double], "2024-01-01", "9999-12-31", "Y"),
      (3L, Option(5.0), "2024-01-01", "9999-12-31", "Y"))
      .toDF("k", "v", "valid_from", "valid_to", "is_current")
    val upd = Seq((1L, Option(11.0)), (2L, Option.empty[Double])).toDF("k", "v")
    val out = UpsertMerge.scd2(cur, upd, "k", Seq("v"), "2024-06-01")
    // key 1 changed -> closed + fresh; key 2: null -> null is a NO-OP
    // (null-safe compare); key 3 absent from updates -> untouched
    assert(out.count() == 4)
    val k1 = out.filter(col("k") === 1).orderBy("valid_from").collect()
    assert(k1.map(_.getAs[String]("is_current")).toSeq == Seq("N", "Y"))
    assert(k1(0).getAs[String]("valid_to") == "2024-06-01")
    assert(k1(1).getAs[Double]("v") == 11.0)
    assert(out.filter(col("k") === 2).count() == 1)
    assert(out.filter(col("k") === 3).head.getAs[String]("is_current") == "Y")
  }

  test("ReInit: guards protect data; master cascades only when week rows are gone") {
    import graft.pipeline.ReInit
    val master = Seq((100, 2025, 45), (101, 2025, 45), (200, 2025, 46))
      .toDF("master_seq", "report_year", "report_week_no")
    val week = Seq((100, 1), (100, 2), (101, 1), (200, 5))
      .toDF("master_seq", "farm_no")
    val sub = Seq((100, 1), (200, 5)).toDF("master_seq", "farm_no")
    val log = Seq((100, 2), (999, 9)).toDF("master_seq", "farm_no")
    val orig = ReInit.Frames(master, week, sub, log)
    // production guard: nothing deleted even with the flag set
    val prod = ReInit.reInit(orig, 2025, 45, None, testMode = false,
      initAll = false, initWeek = true)
    assert(prod.master.count() == 3 && prod.week.count() == 4)
    // farm-restricted week init: master 100 loses farm 1 but keeps
    // farm 2 -> master stays; master 101 loses its only farm -> gone
    val wf = ReInit.reInit(orig, 2025, 45, Some(Seq(1)), testMode = true,
      initAll = false, initWeek = true)
    assert(wf.master.select("master_seq").collect().map(_.getInt(0)).toSet ==
      Set(100, 200))
    assert(wf.week.count() == 2 && wf.jobLog.count() == 2) // log rows untouched (farm 2, 9)
    // unrestricted week init: both 2025/45 masters cascade away, the
    // other week's master and the orphan log row survive
    val wa = ReInit.reInit(orig, 2025, 45, None, testMode = true,
      initAll = false, initWeek = true)
    assert(wa.master.select("master_seq").collect().map(_.getInt(0)).toSeq == Seq(200))
    assert(wa.week.count() == 1 && wa.weekSub.count() == 1 && wa.jobLog.count() == 1)
    // NULL farm_no under a doomed master SURVIVES a farm-scoped delete
    // (SQL IN-list semantics: farm_no IN (1) never matches NULL)
    val subNull = Seq((100, Option(1)), (100, Option.empty[Int]))
      .toDF("master_seq", "farm_no")
    val wn = ReInit.reInit(ReInit.Frames(master, week, subNull, log),
      2025, 45, Some(Seq(1)), testMode = true, initAll = false, initWeek = true)
    assert(wn.weekSub.count() == 1 && wn.weekSub.head.isNullAt(1),
      "the NULL-farm row must be retained, the farm-1 row deleted")
    // init-all WITH a farm list: farm-scoped week cascade runs, but
    // masters are NEVER deleted — the reference's _delete_all_test_data
    // skips the master delete whenever farm_list is given
    // (orchestrator.py:730-731), even for masters with zero week rows
    // left (here: 101 loses its only farm-1 week row but survives)
    val af = ReInit.reInit(orig, 2025, 45, Some(Seq(1)), testMode = true,
      initAll = true, initWeek = false)
    assert(af.master.count() == 3, "init-all+farms must retain EVERY master")
    assert(af.week.select("master_seq").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(100, 200), "farm-1 week rows under doomed masters must go")
    // unrestricted init-all still cascades masters (no week rows remain)
    val aa = ReInit.reInit(orig, 2025, 45, None, testMode = true,
      initAll = true, initWeek = false)
    assert(aa.master.count() == 0 && aa.week.count() == 0)
  }

  test("scd2: new keys insert as fresh members; duplicate updates canonicalize") {
    val cur = Seq((1L, Option(10.0), "2024-01-01", "9999-12-31", "Y"))
      .toDF("k", "v", "valid_from", "valid_to", "is_current")
    // key 9 has no current row -> fresh insert; key 1 sent TWICE with
    // different values -> one closed + ONE fresh (max-by-struct wins),
    // never two versions from the fan-out
    val upd = Seq((9L, Option(7.0)), (1L, Option(11.0)), (1L, Option(10.5)))
      .toDF("k", "v")
    val out = UpsertMerge.scd2(cur, upd, "k", Seq("v"), "2024-06-01")
    assert(out.count() == 3)
    val k9 = out.filter(col("k") === 9).collect()
    assert(k9.length == 1 && k9(0).getAs[String]("is_current") == "Y" &&
      k9(0).getAs[String]("valid_from") == "2024-06-01" &&
      k9(0).getAs[Double]("v") == 7.0)
    val k1 = out.filter(col("k") === 1).orderBy("valid_from").collect()
    assert(k1.map(_.getAs[String]("is_current")).toSeq == Seq("N", "Y"))
    assert(k1(1).getAs[Double]("v") == 11.0) // max tracked-struct row won
  }

  test("Buckets: upper-inclusive edges") {
    val df = Seq(3.0, 10.0, 10.5, 40.0, 41.0).toDF("x")
      .select(Buckets.byUpperEdges(col("x"), Seq(10, 40), Seq("lo", "mid", "hi")).as("b"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("lo", "lo", "mid", "mid", "hi"))
  }

  test("Ranking.chunkWide packs rows in order") {
    val df = Seq("e", "d", "c", "b", "a").toDF("v")
    val out = Ranking.chunkWide(df, Seq(col("v")), "v", 2).orderBy("chunk_no").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSeq ==
      Seq((0L, "a", Some("b")), (1L, "c", Some("d")), (2L, "e", None)))
  }

  test("Materialize.localize: staged path is bit-equal to the collect path and pins nothing") {
    import graft.ops.Materialize
    // query-shaped input: aggregation with nulls, longs, doubles, strings
    val src = Seq((1L, "a", Some(1.5)), (1L, "a", None), (2L, "b", Some(2.0)),
        (3L, null.asInstanceOf[String], Some(0.25)))
      .toDF("k", "s", "v")
      .groupBy("k", "s").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    val local = Materialize.localize(src) // default: driver collect
    assert(local.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    val dir = java.nio.file.Files.createTempDirectory("graft_localize").toString
    spark.conf.set(Materialize.StagingDirKey, dir)
    try {
      val staged = Materialize.localize(src)
      // same names + types (nullability WIDENS on the staged path —
      // Spark marks every file-source column nullable by design) and
      // bit-equal data both ways
      assert(staged.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        local.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        s"${staged.schema} vs ${local.schema}")
      assert(staged.exceptAll(local).isEmpty && local.exceptAll(staged).isEmpty,
        "staged and collect paths must be bit-equal")
      // the staged frame is an ordinary parquet leaf: no cached or
      // checkpointed blocks are pinned by holding it
      assert(staged.queryExecution.executedPlan.toString.contains("parquet"),
        "staged localize must return a parquet scan")
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        "neither path may pin storage")
      // empty frame round-trips with names/types intact
      val empty = Materialize.localize(src.limit(0))
      assert(empty.count() == 0 &&
        empty.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
          src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
      // clearStaging reclaims every per-call staging table (the
      // job-boundary cleanup for iterative callers) — but ONLY this
      // application's namespace: a sibling process's staging tables
      // under the same shared dir survive (the bench+verify-on-one-
      // box hazard)
      val appDir = new org.apache.hadoop.fs.Path(
        dir, spark.sparkContext.applicationId)
      val fs = appDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.listStatus(appDir)
        .count(_.getPath.getName.startsWith("localize_")) == 2,
        "localize must namespace staging tables under the application id")
      val foreign = new org.apache.hadoop.fs.Path(
        dir, "app-other/localize_foreign")
      fs.mkdirs(foreign)
      Materialize.clearStaging(spark)
      assert(!fs.exists(appDir),
        "clearStaging must delete this application's staging namespace")
      assert(fs.exists(foreign),
        "clearStaging must NOT touch another application's namespace")
      // the crashed-run reclaim: a STALE sibling namespace goes,
      // a fresh one (possibly live) stays
      Materialize.clearStaleStaging(spark, olderThanMs = 0L)
      assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, "app-other")),
        "clearStaleStaging must reclaim aged-out sibling namespaces")
      val fresh = new org.apache.hadoop.fs.Path(dir, "app-fresh/localize_x")
      fs.mkdirs(fresh)
      Materialize.clearStaleStaging(spark) // default 7-day cutoff
      assert(fs.exists(fresh),
        "a namespace younger than the cutoff must survive")
    } finally spark.conf.unset(Materialize.StagingDirKey)
  }

  test("DateSpine fills missing days") {
    val daily = Seq(("2024-01-02", 5L)).toDF("d", "n")
      .select(to_date(col("d")).as("d"), col("n"))
    val out = DateSpine.leftJoin(DateSpine.daily(spark, "2024-01-01", "2024-01-03"),
        daily, "d", Map("n" -> 0L))
      .orderBy("day").collect().map(_.getLong(1))
    assert(out.toSeq == Seq(0L, 5L, 0L))
  }
}
