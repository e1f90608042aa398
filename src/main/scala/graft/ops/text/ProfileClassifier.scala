package graft.ops.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable class-profile text classifier — the counting core of the
  * fastText/multinomial-NB family, kept ALL-INTEGER so train and
  * apply are bit-exact cross-engine (no log-prob float folds):
  *
  *  - TRAIN ([[train]]): the model is the per-class token-count
  *    profile N(tok, c) over labeled documents — one shuffle with
  *    map-side combine, nothing else. (The reference pipeline has no
  *    learned classifier; this is the standard corpus-curation
  *    quality/language model a 100 TB pipeline trains on a labeled
  *    seed and applies to the crawl.)
  *  - APPLY ([[classify]]): a document's affinity to class c is
  *    A_c = Σ_tok n(tok, doc) · N(tok, c), length-normalized across
  *    classes as A_c / T_c (T_c = total training tokens of c) — i.e.
  *    the dot product with the class unigram DISTRIBUTION, so a big
  *    training class doesn't win by volume alone. The argmax over
  *    the normalized scores is computed WITHOUT division: class c
  *    beats c' iff A_c·T_c' > A_c'·T_c (exact Long cross-products —
  *    A ≲ 1e7 and T ≲ 1e7 even at sf1, far from overflow), ties
  *    break to the lexicographically smaller label, and the
  *    prediction is the class with k−1 wins. The k² comparison space
  *    is per-document and k = |classes| is a constant, so the whole
  *    apply is linear in the corpus: tokenize (map) → broadcast-join
  *    the vocab-sized model → one groupBy(doc, class) → a
  *    class-constant self-join keyed by doc.
  *
  * 100 TB posture: the model is vocab-sized (millions of rows at
  * worst — broadcast or a bucketed join on `tok`); the corpus-sized
  * stages are one explode + one aggregation; no windows, no
  * all-pairs, no driver collects beyond the k-row class-total frame.
  */
object ProfileClassifier {

  /** Token-count profile N(tok, label) over labeled docs — whitespace
    * tokenization (the corpus convention), empty tokens dropped. */
  def train(docs: DataFrame, textCol: String, labelCol: String): DataFrame =
    docs.select(col(labelCol).as("label"),
        explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("label", "tok").agg(count(lit(1)).as("n"))

  /** Collapse a [[train]]ed model to ONE broadcast-able row — the
    * shape the STREAMING scorer consumes (a pure map over the ingest,
    * zero stream state; the [[graft.streaming.StreamingJobs]]
    * decontaminate/BPE pattern): `labels` (sorted), `totals` (class
    * token totals, same order) and `model_map` (tok → per-class count
    * array, same order). The row is vocab-sized; the only driver
    * materialization is the k-row label list. */
  def modelRow(model: DataFrame): DataFrame = {
    val labels = model.select("label").distinct().orderBy("label")
      .collect().map(_.getString(0)).toSeq
    val totals = model.groupBy("label").agg(sum("n").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perTok = model.groupBy("tok").agg(
      map_from_entries(collect_list(struct(col("label"), col("n")))).as("m"))
      .select(col("tok"), array(labels.map(l =>
        coalesce(element_at(col("m"), lit(l)), lit(0L))): _*).as("ns"))
    perTok
      .agg(map_from_entries(collect_list(struct(col("tok"), col("ns"))))
        .as("model_map"))
      .withColumn("labels", array(labels.map(lit): _*))
      .withColumn("totals", array(labels.map(l => lit(totals(l))): _*))
  }

  /** Classify `docs` against a [[train]]ed model. Output: one row per
    * input doc — (idCol, pred, a_pred) where `pred` is the winning
    * label and `a_pred` its RAW (unnormalized) affinity A_pred; a doc
    * with zero vocabulary overlap predicts the smallest label with
    * A = 0 (the deterministic all-ties case). */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               model: DataFrame): DataFrame = {
    val totals = model.groupBy("label").agg(sum("n").as("t"))
    val docTok = docs
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(idCol, "tok").agg(count(lit(1)).as("dn"))
    val affinity = docTok.join(broadcast(model), Seq("tok"))
      .groupBy(idCol, "label").agg(sum(col("dn") * col("n")).as("a"))
    // every (doc, class) pair, zero-filled — a class absent from the
    // affinity rows still competes (with A = 0)
    val base = docs.select(col(idCol))
      .crossJoin(broadcast(totals))
      .join(affinity, Seq(idCol, "label"), "left")
      .withColumn("a", coalesce(col("a"), lit(0L)))
    // exact argmax of A/T by Long cross-products: c beats c' iff
    // A_c·T_c' > A_c'·T_c, ties to the smaller label
    val x = base.select(col(idCol), col("label"), col("a"), col("t"))
    val y = x.select(col(idCol), col("label").as("ylabel"),
      col("a").as("ya"), col("t").as("yt"))
    // the SELF pair stays in (it scores 0 wins: equal cross-products,
    // equal label), so a single-class model still forms one group per
    // doc and predicts its only class — filtering self rows out first
    // would silently emit ZERO rows at k=1
    x.join(y, Seq(idCol))
      .groupBy(col(idCol), col("label"), col("a"))
      .agg(sum(when(col("a") * col("yt") > col("ya") * col("t") ||
        (col("a") * col("yt") === col("ya") * col("t") &&
          col("label") < col("ylabel")), 1).otherwise(0)).as("wins"),
        count(lit(1)).as("n_rivals"))
      .filter(col("wins") === col("n_rivals") - 1)
      .select(col(idCol), col("label").as("pred"), col("a").as("a_pred"))
  }
}
