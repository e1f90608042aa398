package graft.devtools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry
import graft.core.Tables
import graft.ops.dedup.{BandStore, Dedup}

/** Dev harness: the TWO-DECADE shuffle-linearity certification for the
  * dedup/substring family (SCALE.md). The sf1 bench gate catches a
  * regression at one scale point; a wrong EXPONENT — a plan that is
  * linear at 60k docs and quadratic at 6M — only shows as the slope of
  * a multi-decade curve. This tool runs the five incremental-dedup
  * headliners at sf0.1 / sf1 / sf10 (GenScale rungs: each decade is a
  * 10x corpus with realistic token stats and NO planted cross-copy
  * duplicates — see GenScale's stride-permutation note), measures the
  * per-run SHUFFLE BYTES (the load-independent metric this repo gates
  * on) next to the min clock, and prints the per-decade byte exponent
  *   e = log(bytes_hi / bytes_lo) / log(chars_hi / chars_lo)
  * flagging e > 1.15 as SUPERLINEAR. Clock exponents are printed too
  * but NOT gated: wall time on one box mixes spill/GC/page-cache
  * effects that say nothing about the 1000-executor plan; bytes on
  * the wire is the quantity that survives the translation.
  *
  * Two extra rows isolate the bucketed band store's probe:
  *  - q206_probe_scaled: the batch grows WITH the corpus (the odd
  *    half + planted re-crawls probe a store of the even half) —
  *    certifies the steady-state increment cost is linear in the
  *    INCREMENT.
  *  - q206_probe_fixed: a FIXED 2.5k-doc batch probes the growing
  *    store — certifies the standing corpus contributes ~ZERO bytes
  *    per probe regardless of its size (the StoreProbeAB flat curve,
  *    re-measured on real corpus growth instead of the synthetic
  *    amplifier). Expected exponent ~0; gated at e < 0.3.
  * Store builds happen once per rung OUTSIDE the probe timing (the
  * steady state of an incremental pipeline amortizes the build over
  * every future batch; q206_store_dedup still measures build+probe).
  *
  * Usage: ScaleDecade [reps] [label=dir ...] — defaults to 3 reps over
  * sf0.1=/root/testdata/sf0.1, sf1=/root/repo/tmp/sf1,
  * sf10=/root/repo/tmp/sf10. Exits 1 on a gated-exponent breach or a
  * failed query. Results go into SCALE.md; NOT part of the library.
  */
object ScaleDecade {
  private val CatalogQueries = Seq(
    "q44_ngram_jaccard",
    "q129_incremental_dedup",
    "q181_substring_dup",
    "q185_substring_dup_hashed",
    "q206_store_dedup")

  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(s => scala.util.Try(s.toInt).toOption)
      .map(math.max(1, _)).getOrElse(3)
    val rungs: Seq[(String, String)] =
      if (args.length > 1) args.drop(1).toSeq.map { a =>
        val Array(l, d) = a.split("=", 2); (l, d)
      }
      else Seq(
        "sf0.1" -> "/root/testdata/sf0.1",
        "sf1" -> "/root/repo/tmp/sf1",
        "sf10" -> "/root/repo/tmp/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_decade_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Bench's listener + drain discipline: per-run shuffle write sums
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })
    def drained(): Long = {
      try org.apache.spark.GraftMetricsBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      catch { case _: java.util.concurrent.TimeoutException =>
        System.err.println("[decade] listener bus drain timed out") }
      shuffleBytes.get()
    }
    def cleanup(): Unit = { spark.catalog.clearCache(); System.gc() }

    // min clock + min per-run shuffle MB over `reps` runs of a thunk
    def measure(thunk: () => Unit): (Double, Double, Boolean) = {
      var failed = false
      val runs = (1 to reps).map { _ =>
        val sh0 = drained()
        val t0 = System.nanoTime()
        try thunk() catch { case e: Throwable =>
          failed = true
          System.err.println(s"[decade] FAILED: ${e.getClass.getName}: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val mb = (drained() - sh0) / 1048576.0
        cleanup()
        (dt, mb)
      }
      (runs.map(_._1).min, runs.map(_._2).min, failed)
    }

    def f2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    // JIT/codegen warm pass on the smallest SF (outside any timing)
    CatalogQueries.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      cleanup()
    }

    // rung size = total text chars (the corpus-scale denominator; doc
    // count is printed for the table)
    case class Rung(label: String, dir: String, docs: Long, chars: Double)
    val sized = rungs.map { case (l, d) =>
      val m = Tables.documents(spark, d)
        .agg(count(lit(1)), sum("n_chars")).head()
      Rung(l, d, m.getLong(0), m.getLong(1).toDouble)
    }
    sized.foreach(r => println(
      s"[decade] rung ${r.label}: ${r.docs} docs, ${(r.chars / 1e6).round} M chars (${r.dir})"))

    // results(query)(rungLabel) = (sec, mb, failed)
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[String, (Double, Double, Boolean)]]
    def record(q: String, rung: String, v: (Double, Double, Boolean)): Unit = {
      results.getOrElseUpdate(q,
        scala.collection.mutable.LinkedHashMap.empty) += rung -> v
      println(s"[decade] $rung $q min=${f2(v._1)}s shuffle=${f2(v._2)}MB" +
        (if (v._3) " FAILED-REPS" else ""))
    }

    sized.foreach { r =>
      CatalogQueries.foreach { q =>
        record(q, r.label, measure(() =>
          SparkEntry.queries(q)(spark, r.dir)
            .write.format("noop").mode("overwrite").save()))
      }

      // ---- store-probe rows: build the rung's standing store ONCE
      val docs = Tables.documents(spark, r.dir)
      val ref = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"))
      def recrawls(src: DataFrame): DataFrame =
        src.select((col("doc_id") + (1L << 60)).as("doc_id"),
          concat_ws(" ",
            expr("slice(split(text, '\\\\s+'), 1, 3)"),
            expr("slice(split(text, '\\\\s+'), 5, 1000000)")).as("text"))
      val scaledBatch = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"))
        .unionByName(recrawls(docs.filter(col("doc_id") % 2 === 0 && col("n_chars") >= 300)))
      // deterministic fixed batch (the StoreProbeAB pick): 2k odd docs
      // + 500 re-crawls, SAME absolute ids on every rung (GenScale
      // copies shift by 1e9, so low ids are the shared sf0.1 originals).
      // The flat gate is only meaningful on rungs that SATURATE these
      // limits (sf0.1+, where the odd half >= 2000): on a smaller rung
      // the "fixed" batch still grows with the corpus and the exponent
      // reads as real growth (observed 0.60 on a sf0.01->sf0.1 smoke)
      // materialized OUTSIDE the probe timing (the StoreProbeAB
      // discipline, hardened): the orderBy+limit pick itself shuffles
      // its per-partition top-k, which grows with the RUNG (more
      // input partitions), and a lazy batch re-runs that pick inside
      // every probe — the first measured curve read 2.78 -> 15.86 MB
      // of pure harness shuffle on a genuinely flat probe. A parquet
      // round-trip (not .cache()) survives the between-reps
      // clearCache(); the re-read is a zero-shuffle scan.
      val fixedPath = java.nio.file.Files
        .createTempDirectory(s"decade_fixed_${r.label}").toString
      docs.filter(col("doc_id") % 2 === 1)
        .orderBy("doc_id").limit(2000).select(col("doc_id"), col("text"))
        .unionByName(recrawls(docs
          .filter(col("doc_id") % 2 === 0 && col("n_chars") >= 300)
          .orderBy("doc_id").limit(500)))
        .write.mode("overwrite").parquet(fixedPath)
      val fixedBatch = spark.read.parquet(fixedPath)
      val table = "decade_bands_" + r.label.replace(".", "_")
      BandStore.reset(spark, table)
      BandStore.write(
        Dedup.lshBands(Dedup.minHashText(ref, "doc_id", "text"), "doc_id"), table)
      def probe(batch: DataFrame): Unit = {
        BandStore.dedupAgainstStoreScoped(
          spark, table, ref, batch, "doc_id", "text") { j =>
          j.filter(col("jaccard") >= 0.5).count(); ()
        }
      }
      record("q206_probe_scaled", r.label, measure(() => probe(scaledBatch)))
      record("q206_probe_fixed", r.label, measure(() => probe(fixedBatch)))
      BandStore.reset(spark, table)
      cleanup()
    }

    // ---- exponents per adjacent decade; gate bytes, report clock
    println("\n| query | " + sized.map(r =>
      s"${r.label} s / MB").mkString(" | ") + " | byte exp | clock exp |")
    var breach = false
    results.foreach { case (q, byRung) =>
      val cells = sized.map { r =>
        val (s, mb, failed) = byRung(r.label)
        if (failed) "FAILED" else s"${f2(s)} / ${f2(mb)}"
      }
      val pairs = sized.sliding(2).toSeq ++
        (if (sized.length > 2) Seq(Seq(sized.head, sized.last)) else Nil)
      def exps(sel: ((Double, Double, Boolean)) => Double): Seq[Double] =
        pairs.flatMap { case Seq(lo, hi) =>
          val (a, b) = (byRung(lo.label), byRung(hi.label))
          if (a._3 || b._3 || sel(a) <= 0 || sel(b) <= 0) None
          else Some(math.log(sel(b) / sel(a)) / math.log(hi.chars / lo.chars))
        }
      val be = exps(_._2)
      val ce = exps(_._1)
      val anyFailed = byRung.values.exists(_._3)
      // GATED on the FULL-SPAN exponent (last element of be: first ->
      // last rung), not the per-decade max: a df-cap family crosses
      // its saturation window in SOME decade (q44 measured 1.37 then
      // -0.08 — a transition bump, 0.65 across the two decades), and
      // per-decade gating would flag exactly the behavior the cap
      // exists to produce. Per-decade exponents are still printed for
      // the eye. q206_probe_fixed must stay FLAT (e < 0.3); everything
      // else ~linear (e <= 1.15 across the span).
      val gate = if (q == "q206_probe_fixed") 0.3 else 1.15
      val flag = be.lastOption.exists(_ > gate) || anyFailed
      if (flag) breach = true
      println(s"| $q | " + cells.mkString(" | ") + " | " +
        be.map(f2).mkString(", ") + (if (flag) " **SUPERLINEAR/FAILED**" else "") +
        " | " + ce.map(f2).mkString(", ") + " |")
    }
    spark.stop()
    if (breach) { System.err.println("[decade] GATE BREACH"); sys.exit(1) }
  }
}
