package graft.ops.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling") in its
  * deterministic unigram form: per token, the target/raw probability
  * ratio p_tgt(t)/p_raw(t) computed CROSS-MULTIPLIED
  * (c_tgt·N_raw vs c_raw·N_tgt, exact int64 products) and
  * floor-quantized to integer micros — ONE IEEE division + floor per
  * token, no ln anywhere (the log-likelihood-ratio sum of the paper
  * is replaced by the count-weighted sum of linear ratios: same
  * tilt-toward-target intent, exactly replayable cross-engine).
  *
  * Scale shape: token frequencies are one explode→groupBy with
  * map-side combine; the ratio table is VOCABULARY-sized → broadcast;
  * the corpus token frame joins map-side and partial-aggregates per
  * document. Nothing corpus-sized crosses an exchange except the
  * per-doc aggregation. At trillion-token slices the int64 cross
  * products approach 2^63 — swap to DECIMAL(38,0) there. */
object Dsir {

  /** Per-document importance scores: (idCol, score_micros, carry...).
    * `isTarget` marks the rows whose token distribution defines the
    * target domain (they stay in the raw distribution too, as in the
    * paper's target ⊂ raw setting when selecting from a pool that
    * includes reference data). Tokens unseen in the target score 0 —
    * smoothing-free and deterministic.
    *
    * `carry` rides doc-constant columns (lang, a precomputed token
    * count) through the per-doc aggregation (max over a constant —
    * exact), so a caller with an EXPENSIVE upstream can take
    * everything it needs downstream from this one frame instead of
    * joining back to the upstream and re-evaluating it (q177's 6x →
    * 2x curate-pipeline fix). Docs whose text splits to zero tokens
    * produce no row — callers counting docs must feed non-empty
    * text (the curation gates guarantee it). */
  def scoreMicros(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, carry: Seq[String] = Nil): DataFrame = {
    val toks = docs
      .select(col(idCol) +: isTarget.as("__tgt") +:
        explode(split(col(textCol), "\\s+")).as("__t") +: carry.map(col): _*)
    val perTok = toks.groupBy("__t").agg(
      count(lit(1)).as("c_raw"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_tgt"))
    val tot = perTok.agg(sum("c_raw").as("n_raw"), sum("c_tgt").as("n_tgt"))
    val ratio = perTok.crossJoin(broadcast(tot))
      .select(col("__t"),
        floor((col("c_tgt") * col("n_raw")).cast("double") /
          (col("c_raw") * col("n_tgt")).cast("double") * lit(1000000.0))
          .cast("long").as("r_micros"))
    val aggs = sum("r_micros").as("score_micros") +:
      carry.map(c => max(col(c)).as(c))
    toks.join(broadcast(ratio), Seq("__t"))
      .groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }
}
