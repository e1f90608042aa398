package graft.ops.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction (Sennrich et al. 2016; the
  * SentencePiece / HF-tokenizers training algorithm) re-expressed for
  * Spark's execution model.
  *
  * The scale split is the one every production BPE trainer uses: the
  * CORPUS-scale stage is a single word-frequency aggregation (one
  * shuffle of pre-reduced (word, count) rows — map-side combine makes
  * the exchange carry the vocabulary, not the corpus), and the merge
  * loop then runs over that vocabulary table, whose size is bounded by
  * the language (~10⁵ forms) regardless of corpus bytes. At 100 TB the
  * word count is the only pass that touches the data; the K merge
  * iterations are vocabulary-sized aggregations.
  *
  * Merge application is the CANONICAL left-to-right greedy scan,
  * expressed as a fold over the symbol array (`aggregate` HOF — a
  * codegen'd expression, no UDF): the accumulator is the space-joined
  * output-so-far, and a step merges iff the incoming symbol is `r` and
  * the accumulator's last symbol is exactly `l` (space-anchored
  * suffix test — symbols never contain spaces, so the check cannot
  * cross a symbol boundary). The same fold runs in DuckDB as
  * `list_reduce`, which is what makes the learned merge table
  * hash-verifiable cross-engine (q182) rather than "approximately
  * BPE". Ties in the pair-count argmax break deterministically on
  * (pair_n DESC, l ASC, r ASC).
  */
object Bpe {

  /** Initial symbol state of a word: its characters joined by single
    * spaces ('hash' -> 'h a s h'). Built with the same
    * regexp_replace+trim construction the DuckDB oracle uses, so the
    * state strings are equal cross-engine by construction. */
  def charState(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** Apply ONE learned merge (l, r) to a space-joined symbol state —
    * canonical greedy left-to-right scan as a fold. `l`/`r` may be
    * literals or columns (e.g. from a broadcast merge row).
    *
    * The input `state` is referenced EXACTLY ONCE in the produced
    * expression tree. This is load-bearing: [[applyAll]] nests K
    * applications, so a form that mentions its input c times builds a
    * c^K-node tree (the first draft used the tail-slice/head-init
    * shape — 4 references — and 4^6 ≈ 4k duplicated subtrees froze
    * analysis+codegen on the corpus-wide tokenize). The empty-string
    * sentinel replaces the head-as-init trick: "" is never a symbol,
    * so the first step just seeds the accumulator. */
  def applyMerge(state: Column, l: Column, r: Column): Column =
    aggregate(
      split(state, " "),
      lit(""),
      (acc, x) =>
        when(acc === "", x)
          .when(x === r && (acc === l || endswith(acc, concat(lit(" "), l))),
            concat(acc.substr(lit(1), length(acc) - length(l)), l, r))
          .otherwise(concat(acc, lit(" "), x)))

  /** Learn `k` merges from a corpus of token occurrences.
    *
    * @param words one row per token occurrence, column `wCol`
    * @return (rank, left_sym, right_sym, merged, pair_n) — one row per
    *         learned merge, rank 1..k in learning order
    *
    * The input aggregation is the only corpus-scale job and is
    * localCheckpoint'ed so the K-iteration loop never re-reads the
    * corpus; each iteration checkpoints the (tiny) vocabulary so plan
    * depth stays O(1) instead of O(k). Checkpoints are vocabulary-
    * sized (≤ distinct-word count), not corpus-sized.
    *
    * The merge table may be SHORTER than `k`: when the vocabulary
    * runs out of mergeable pairs (every word fully merged to one
    * symbol) before rank k, training stops at the last learnable
    * merge instead of looping over an empty pair frame — the same
    * early-exit every reference BPE trainer performs.
    */
  def train(words: DataFrame, wCol: String, k: Int): DataFrame = {
    var vocab = words
      .filter(col(wCol).isNotNull && col(wCol) =!= "")
      .groupBy(col(wCol).as("w"))
      .agg(count(lit(1)).cast("long").as("wc"))
      .select(charState(col("w")).as("state"), col("wc"))
      .localCheckpoint() // corpus pass runs ONCE, here
    val checkpoints = collection.mutable.Buffer(vocab)
    var out: DataFrame = null
    var rank = 0
    var exhausted = false
    while (rank < k && !exhausted) {
      rank += 1
      val arr = split(col("state"), " ")
      val n = size(arr)
      val pairs = vocab
        .filter(n >= 2)
        .select(col("wc"),
          explode(zip_with(
            slice(arr, lit(1), n - 1), slice(arr, lit(2), n - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .select(col("p.l").as("l"), col("p.r").as("r"), col("wc"))
      // checkpointed so the emptiness probe and both downstream
      // consumers (merge-table row, vocab rewrite) share one tiny
      // materialized result instead of re-running the aggregation
      val best = pairs
        .groupBy("l", "r").agg(sum("wc").cast("long").as("pair_n"))
        .orderBy(col("pair_n").desc, col("l"), col("r"))
        .limit(1)
        .select(lit(rank).as("rank"), col("l").as("left_sym"),
          col("r").as("right_sym"),
          concat(col("l"), col("r")).as("merged"), col("pair_n"))
        .localCheckpoint()
      checkpoints += best
      if (best.isEmpty) {
        // no pair left anywhere in the vocabulary: a further crossJoin
        // with the empty best row would silently EMPTY vocab and the
        // caller would get k rows of nothing — stop and return the
        // merges actually learned (possibly zero)
        exhausted = true
      } else {
        out = if (out == null) best else out.unionByName(best)
        vocab = vocab
          .crossJoin(broadcast(best.select(col("left_sym").as("__l"), col("right_sym").as("__r"))))
          .select(applyMerge(col("state"), col("__l"), col("__r")).as("state"), col("wc"))
          .localCheckpoint()
        checkpoints += vocab
      }
    }
    if (out == null) {
      // zero learnable merges (e.g. every word is a single char):
      // an empty frame with the contract schema
      val r = checkpoints.head
      out = r.sparkSession.createDataFrame(
        r.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("left_sym",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("right_sym",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("merged",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("pair_n",
            org.apache.spark.sql.types.LongType))))
    }
    // The merge table is what escapes this call; pin it and release
    // the per-iteration vocabulary checkpoints deterministically.
    val result = out.localCheckpoint()
    checkpoints.foreach(_.unpersist())
    result
  }

  /** Collapse a merge table into ONE broadcastable row holding a
    * rank->(l, r) map, for joining against a corpus-sized frame
    * without a driver collect. */
  def mergesRow(merges: DataFrame, col0: String = "bpe_merges"): DataFrame =
    merges.agg(map_from_entries(collect_list(struct(
      col("rank").cast("int"),
      struct(col("left_sym").as("l"), col("right_sym").as("r"))))).as(col0))

  /** Tokenize: apply `k` learned merges (as a [[mergesRow]] map
    * column) to a word column, returning the final space-joined
    * symbol state. Map-only over the corpus — one fold per merge,
    * all inside codegen. */
  def applyAll(word: Column, mergesMap: Column, k: Int): Column =
    (1 to k).foldLeft(charState(word)) { (state, r) =>
      val m = element_at(mergesMap, lit(r))
      applyMerge(state, m.getField("l"), m.getField("r"))
    }

  /** Token count of a symbol state. */
  def nSymbols(state: Column): Column = size(split(state, " "))
}
