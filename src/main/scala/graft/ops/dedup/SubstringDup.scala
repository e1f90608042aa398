package graft.ops.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-duplication audit (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better" — the ExactSubstr
  * metric): for every document, the fraction of its characters lying
  * inside a length-k window that occurs ≥2 times anywhere in the
  * corpus (including self-repetition within one document).
  *
  * Lee et al. build a corpus-wide suffix array; the Spark-native
  * equivalent is the windowed form: every k-char window becomes a row,
  * window multiplicity is one hash exchange, and the per-document
  * duplicated-character total collapses overlapping flagged windows
  * with the classic coverage identity — a window at position i adds
  * min(k, i - prev_flagged_i) covered characters (k when disjoint from
  * the previous flagged window, the overlap-free remainder otherwise),
  * so no interval-merge grouping pass is needed.
  *
  * Scale posture: the explode is map-side (O(corpus chars) rows of one
  * k-char window each); multiplicity is a count over a window-keyed
  * exchange (high-cardinality key — no skew funnel); the per-document
  * pass is keyed by doc_id. At 100 TB the window text would be
  * replaced by a 64-bit rolling hash before the exchange (8 B instead
  * of k B per row; collision probability n²/2⁶⁴); the audit keeps the
  * raw window so the oracle comparison is exact rather than
  * collision-probabilistic.
  */
object SubstringDup {

  /** Session conf key: partition count for the window-MULTIPLICITY
    * exchange (the per-window-row shuffle that dominates this family
    * — the bench's single biggest shuffle producer). Each partition
    * sorts its window keys in the (disk-spillable) window sorter, so
    * the right value is corpus_window_bytes / healthy_sort_budget:
    * the session default (spark.sql.shuffle.partitions) is sized for
    * aggregate shuffles and is ~100x too coarse at 100 TB — one
    * partition would sort ~0.5 TB of window rows. Unset = session
    * default (fine through sf1, measured in SCALE.md); at 100 TB set
    * ~corpus_chars * 16 B / 256 MB partitions. */
  val PartitionsKey = "graft.substringdup.partitions"

  /** Route the exploded window rows through an explicit
    * [[PartitionsKey]]-sized hash exchange on the multiplicity key —
    * the window operator then reuses that partitioning (same key), so
    * this REPLACES the default exchange rather than adding one. */
  private def multiplicityPartitioned(wins: DataFrame, keyCol: String): DataFrame =
    wins.sparkSession.conf.getOption(PartitionsKey)
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ > 0)
      .map(n => wins.repartition(n, col(keyCol)))
      .getOrElse(wins)

  /** Per-document duplicated-character counts.
    *
    * @param docs (idCol, textCol) — rows with NULL/short text yield no
    *             windows and so report 0 duplicated chars
    * @return (idCol, dup_chars: Long) — only documents with ≥1
    *         duplicated window appear; absent docs are 0
    */
  def dupChars(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val wins = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= k)
      .select(col(idCol),
        explode(sequence(lit(1L), length(col(textCol)) - (k - 1))).as("i"),
        col(textCol))
      .select(col(idCol), col("i"),
        substring(col(textCol), col("i").cast("int"), lit(k)).as("win"))
    val flagged = multiplicityPartitioned(wins, "win")
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("win")))
      .filter(col("cnt") >= 2)
      .select(col(idCol), col("i"))
    coverage(flagged, idCol, k)
  }

  /** [[dupChars]] with the 100 TB shuffle layout: window positions are
    * hashed by [[graft.functions.RollingHash]] (one O(len) codegen'd
    * pass, 8-byte payload on the multiplicity exchange) instead of
    * materializing k-char substrings. Hash equality stands in for
    * string equality — collision odds n²/2⁶⁴; byte-oriented, so on
    * ASCII corpora the result is identical to [[dupChars]]. */
  def dupCharsHashed(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    coverage(flaggedHashed(docs, idCol, textCol, k), idCol, k)

  /** The shared hashed flagging pass: (idCol, i) starts of k-windows
    * whose rolling hash occurs ≥2 times corpus-wide. */
  private def flaggedHashed(docs: DataFrame, idCol: String, textCol: String,
                            k: Int): DataFrame = {
    import graft.functions.RollingHash
    val wins = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= k)
      .select(col(idCol),
        posexplode(RollingHash.windowHashes(col(textCol), k)).as(Seq("p", "h")))
      .select(col(idCol), (col("p") + 1).cast("long").as("i"), col("h"))
    multiplicityPartitioned(wins, "h")
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("cnt") >= 2)
      .select(col(idCol), col("i"))
  }

  /** Maximal duplicated SPANS per document (gaps-and-islands over the
    * flagged window starts): starts whose gap is ≤ k chain into one
    * contiguous covered interval; each island reports
    * (span_start, span_len = last_i − first_i + k). The longest such
    * span is the headline memorization statistic of the ExactSubstr
    * papers. Same hashed flagging pass as [[dupCharsHashed]]; the
    * island pass is doc-keyed. */
  def dupSpansHashed(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    val byDoc = Window.partitionBy(idCol).orderBy("i")
    flaggedHashed(docs, idCol, textCol, k)
      .withColumn("prev", lag("i", 1).over(byDoc))
      .withColumn("brk",
        (col("prev").isNull || (col("i") - col("prev")) > k).cast("long"))
      .withColumn("island", sum("brk").over(byDoc))
      .groupBy(col(idCol), col("island"))
      .agg(min("i").as("span_start"),
        (max("i") - min("i") + k).as("span_len"))
      .select(col(idCol), col("span_start"), col("span_len"))
  }

  /** Verbatim train→eval leakage (Lee et al. 2022 decontamination):
    * for each eval doc, the chars covered by k-windows that appear
    * ANYWHERE in the train corpus. Rolling-hash keys on both sides
    * (8-byte payloads); the train window set stays distributed — the
    * containment test is a hash-keyed semi join, never a broadcast of
    * a corpus-sized set. Same coverage identity as [[dupChars]]. */
  def leakedCharsHashed(evalDocs: DataFrame, trainDocs: DataFrame,
                        idCol: String, textCol: String, k: Int): DataFrame = {
    import graft.functions.RollingHash
    val trainH = trainDocs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= k)
      .select(explode(RollingHash.windowHashes(col(textCol), k)).as("h"))
      .distinct()
    val evalW = evalDocs
      .filter(col(textCol).isNotNull && length(col(textCol)) >= k)
      .select(col(idCol),
        posexplode(RollingHash.windowHashes(col(textCol), k)).as(Seq("p", "h")))
      .select(col(idCol), (col("p") + 1).cast("long").as("i"), col("h"))
    val flagged = evalW.join(trainH, Seq("h"), "left_semi")
      .select(col(idCol), col("i"))
    coverage(flagged, idCol, k)
  }

  /** Shared coverage identity: flagged (idCol, i) window starts →
    * per-doc duplicated chars, collapsing overlaps via
    * min(k, gap-to-previous). */
  private def coverage(flagged: DataFrame, idCol: String, k: Int): DataFrame = {
    val byDoc = Window.partitionBy(idCol).orderBy("i")
    flagged
      .withColumn("prev", lag("i", 1).over(byDoc))
      .groupBy(idCol)
      .agg(sum(
        when(col("prev").isNull, lit(k.toLong))
          .otherwise(least(lit(k.toLong), col("i") - col("prev"))))
        .cast("long").as("dup_chars"))
  }
}
