package graft.devtools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.dedup.Dedup

/** Dev harness: the adversarial-skew measurement for SCALE.md.
  *
  * A boilerplate template shared by millions of pages is the worst
  * input LSH dedup sees at corpus scale: every document lands in the
  * SAME (band, band_key) bucket, so an uncapped pair expansion is
  * N^2 — at 100 TB, an executor OOM or a runaway stage. The cap in
  * [[Dedup.candidatePairs]] (window count over the bucket key, filter
  * before any id list exists) bounds the expansion to maxBucket^2/2
  * per bucket regardless of skew. EmptyInputSpec proves the semantics
  * on tiny frames; this probe MEASURES the wall-clock shape at sf1
  * row counts (millions of identical docs) so the claim "bounded,
  * never quadratic" has a number attached.
  *
  * Prints: n_docs, wall seconds for the full shingle->minhash->band->
  * candidatePairs count, and the pair count (must be 0 — a bucket
  * that un-selective carries no pairwise signal).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 6000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the boilerplate corpus: n docs, one shared template text
    val template = "terms of service all rights reserved contact us " +
      "privacy policy cookie notice copyright holder site map"
    val docs = spark.range(n).select(col("id").as("doc_id"),
      lit(template).as("text"))

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = f
      println(f"SKEW $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  result=$v")
    }

    timed(s"all-identical n=$n: pairs") {
      val bands = Dedup.lshBands(
        Dedup.minHashText(docs, "doc_id", "text", 3, 16), "doc_id", 16, 4)
      Dedup.candidatePairs(bands, "doc_id").count()
    }

    // contrast: same row count, natural text (unique per doc) — the
    // pair stage sees selective buckets, the cap never engages
    val natural = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit(s"w$i"), ((col("id") + i * 7919) % 1000))): _*).as("text"))
    timed(s"natural n=$n: pairs") {
      val bands = Dedup.lshBands(
        Dedup.minHashText(natural, "doc_id", "text", 3, 16), "doc_id", 16, 4)
      Dedup.candidatePairs(bands, "doc_id").count()
    }
    spark.stop()
  }
}
