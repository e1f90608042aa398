package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.dedup.Dedup
import graft.ops.text.TextOps

/** The training-data side's WeeklyReportJob: one DAG that takes a raw
  * document table through the standard curation funnel —
  *
  *   exact dedup (content hash, keep min id)
  *   -> near-dup removal (MinHash/LSH candidates, shingle Jaccard >=
  *      tau, drop the larger id of each surviving pair)
  *   -> quality gate (length + stopword composite)
  *
  * — emitting the curated corpus plus a per-language funnel of counts
  * at every stage (the numbers a pipeline owner actually watches).
  * Every stage is the already-verified operator; the composition is
  * itself hash-gated by q91. At 100 TB each arrow is one shuffle-
  * bounded stage over the same partitioning; nothing here is
  * driver-side.
  */
object CorpusCurationJob {

  val Stopwords: Seq[String] = Seq("the", "a")

  /** The pipeline's intermediate stage frames. When `cache` is set the
    * multi-consumer frames (uniq, deduped) are cached — callers that
    * materialize more than one consumer MUST unpersist them (see
    * funnel/run) or cached partitions accumulate across calls.
    * Shingles are NOT cached: shingleSet is a pure map-side
    * projection off the cached uniq rows, so each consumer re-derives
    * it for free inside its own stage instead of materializing the
    * ~50x-exploded shingle rows. */
  private case class Stages(uniq: DataFrame,
                            deduped: DataFrame, curated: DataFrame,
                            releaseJaccard: () => Unit) {
    def unpersist(): Unit = {
      uniq.unpersist(); deduped.unpersist(); releaseJaccard()
    }
  }

  private def stages(docs: DataFrame, jaccardTau: Double,
                     minQuality: Double, cache: Boolean): Stages = {
    def maybeCache(df: DataFrame) = if (cache) df.cache() else df
    // exact dedup survivors in ONE shuffle (min_by(struct), no
    // agg+join-back — the keep-set is corpus-sized at scale, that
    // join could never broadcast)
    val uniq = maybeCache(Dedup.exactKeep(docs, "doc_id", "text"))
    // near-dup: drop the larger id of every >= tau candidate pair.
    // signature branch is map-only (MinHashSig); the verifier derives
    // shingles AFTER the candidate restriction (jaccardText) — no
    // stage of the funnel explodes a corpus-wide n-gram relation
    val sig = Dedup.minHashText(uniq, "doc_id", "text", 3, 16)
    val cand = Dedup.candidatePairs(
      Dedup.lshBands(sig, "doc_id", n = 16, rowsPerBand = 4), "doc_id")
    // releasable handle: jaccard's internal pair/candidate-shingle caches are
    // freed by Stages.unpersist together with the stage frames — no
    // cached partitions outlive a funnel()/run() call
    val jh = Dedup.jaccardTextReleasable(cand, uniq, "doc_id", "text", 3)
    val dupIds = jh.df
      .filter(col("jaccard") >= jaccardTau)
      .select(col("id_b").as("doc_id")).distinct()
    val deduped = maybeCache(uniq.join(dupIds, Seq("doc_id"), "left_anti"))
    // quality gate
    val curated = deduped.filter(
      TextOps.qualityScore(col("text"), Stopwords) >= minQuality)
    Stages(uniq, deduped, curated, jh.release)
  }

  /** Curated documents after the three gates (single-consumer lineage:
    * no caching needed — one pass end to end). */
  def curate(docs: DataFrame, jaccardTau: Double = 0.7,
             minQuality: Double = 0.5): DataFrame =
    stages(docs, jaccardTau, minQuality, cache = false).curated

  private def funnelFrame(docs: DataFrame, st: Stages): DataFrame = {
    def stage(df: DataFrame, name: String) =
      df.groupBy("lang").agg(count(lit(1)).as(name))
    stage(docs, "n_input")
      .join(stage(st.uniq, "n_exact"), Seq("lang"), "left")
      .join(stage(st.deduped, "n_neardup"), Seq("lang"), "left")
      .join(stage(st.curated, "n_quality"), Seq("lang"), "left")
      .select(col("lang"),
        col("n_input"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"))
      .orderBy("lang")
  }

  /** Per-language funnel: input / after-exact / after-neardup /
    * after-quality counts (the verified composition surface). Stage
    * frames are cached during computation: every stage count re-reads
    * its predecessor — without the caches each count re-runs the
    * whole upstream dedup (measured ~4x the wall time). The counts
    * are materialized HERE
    * (bounded: one row per language) so the caches can be released
    * before returning — no cached partitions outlive the call. At
    * cluster scale these become checkpoints/tables between stages. */
  def funnel(docs: DataFrame, jaccardTau: Double = 0.7,
             minQuality: Double = 0.5): DataFrame = {
    val st = stages(docs, jaccardTau, minQuality, cache = true)
    try {
      val out = funnelFrame(docs, st)
      val rows = out.collect() // one row per language — driver-safe
      docs.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), out.schema)
    } finally st.unpersist()
  }

  /** Run end-to-end: write the curated corpus and the funnel stats —
    * BOTH derived from one cached pipeline (a second stages() pass
    * would recompute the entire dedup), released on exit. */
  def run(spark: SparkSession, docs: DataFrame, outDir: String): Unit = {
    val st = stages(docs, jaccardTau = 0.7, minQuality = 0.5, cache = true)
    try {
      st.curated.write.mode("overwrite").parquet(s"$outDir/curated")
      funnelFrame(docs, st).write.mode("overwrite").parquet(s"$outDir/funnel")
    } finally st.unpersist()
  }
}
