package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.dedup.SubstringDup
import graft.ops.text.Bpe

/** Tokenizer-induction and substring-duplication operators: the
  * vocabulary-building leg of a training-data pipeline (learn a BPE
  * merge table from the corpus, apply it, audit exact substring
  * duplication à la Lee et al. 2022). The reference has no tokenizer
  * surface (it is a farm-report ETL); these are the extension
  * operators the builder brief asks for, hash-verified cross-engine
  * like every other catalog entry.
  */
object QueryCatalogVocab {
  import QueryCatalog.Q

  private val K = 6 // merges learned by q182/q183 — enough to exercise
                    // multi-char merges (rank 6 merges 'm'+'er')

  // ---------------------------------------------------------------- q181: exact substring duplication audit
  /** Lee et al. 2022 ExactSubstr audit: per-language duplicated-char
    * fraction under k=20 windows (see [[graft.ops.dedup.SubstringDup]]
    * for the coverage identity and 100 TB posture). The synthetic
    * corpus's tiny word vocabulary makes ~44% of chars duplicated —
    * a realistic CommonCrawl-before-dedup magnitude. */
  val q181SubstringDup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val dup = SubstringDup.dupChars(docs, "doc_id", "text", 20)
    val perLang = docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("text"))).cast("long").as("total_chars"))
    val dupLang = docs.join(dup, Seq("doc_id"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs_with_dup"),
        sum("dup_chars").cast("long").as("dup_chars"))
    perLang.join(dupLang, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_docs_with_dup"), lit(0L)).as("n_docs_with_dup"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        col("total_chars"),
        (coalesce(col("dup_chars"), lit(0L)).cast("double") /
          col("total_chars").cast("double")).as("dup_frac"))
      .orderBy("lang")
  }

  private val q181Sql =
    """WITH wins AS (
      |  SELECT doc_id, i, substr(text, CAST(i AS INT), 20) AS win
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 19)) AS i
      |        FROM documents WHERE text IS NOT NULL AND length(text) >= 20) u),
      |flagged AS (
      |  SELECT doc_id, i FROM (
      |    SELECT doc_id, i, COUNT(*) OVER (PARTITION BY win) AS cnt FROM wins) z
      |  WHERE cnt >= 2),
      |per_doc AS (
      |  SELECT doc_id, CAST(SUM(CASE WHEN prev IS NULL THEN 20
      |                                ELSE LEAST(20, i - prev) END) AS BIGINT) AS dup_chars
      |  FROM (SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |        FROM flagged)
      |  GROUP BY doc_id),
      |lang_tot AS (
      |  SELECT lang, COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS total_chars
      |  FROM documents GROUP BY lang),
      |lang_dup AS (
      |  SELECT d.lang, COUNT(*) AS n_docs_with_dup,
      |         CAST(SUM(p.dup_chars) AS BIGINT) AS dup_chars
      |  FROM documents d JOIN per_doc p USING (doc_id) GROUP BY d.lang)
      |SELECT t.lang, t.n_docs,
      |       CAST(COALESCE(u.n_docs_with_dup, 0) AS BIGINT) AS n_docs_with_dup,
      |       CAST(COALESCE(u.dup_chars, 0) AS BIGINT) AS dup_chars,
      |       t.total_chars,
      |       CAST(COALESCE(u.dup_chars, 0) AS DOUBLE) / CAST(t.total_chars AS DOUBLE) AS dup_frac
      |FROM lang_tot t LEFT JOIN lang_dup u USING (lang) ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- BPE oracle SQL generation
  /** DuckDB replay of [[Bpe.applyMerge]]'s canonical left-to-right
    * fold: `list_reduce` IS Spark's `aggregate` HOF with the first
    * symbol as the seed, so the two engines run the same scan. */
  private def foldSql(stateExpr: String, l: String, r: String): String =
    s"""list_reduce(string_split($stateExpr, ' '), (acc, x) ->
       |  CASE WHEN x = $r AND (acc = $l OR ends_with(acc, ' ' || $l))
       |       THEN left(acc, length(acc) - length($l)) || $l || $r
       |       ELSE acc || ' ' || x END)""".stripMargin

  /** The shared train chain: vocab -> s0, then per rank i the argmax
    * pair b_i and the re-merged vocabulary s_i. Mirrors [[Bpe.train]]
    * CTE-for-checkpoint. */
  private def trainCtes(k: Int): String = {
    val head =
      """WITH vocab AS (
        |  SELECT trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS state,
        |         CAST(COUNT(*) AS BIGINT) AS wc
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w
        |        FROM documents WHERE text IS NOT NULL)
        |  WHERE w <> '' GROUP BY 1),
        |s0 AS (SELECT state, wc FROM vocab)""".stripMargin
    val iters = (1 to k).map { i =>
      s""",
         |b$i AS (
         |  SELECT l, r, CAST(SUM(wc) AS BIGINT) AS pair_n
         |  FROM (SELECT sym AS l, lead(sym) OVER (PARTITION BY state ORDER BY pos) AS r, wc
         |        FROM (SELECT state, wc, unnest(string_split(state, ' ')) AS sym,
         |                     generate_subscripts(string_split(state, ' '), 1) AS pos
         |              FROM s${i - 1}))
         |  WHERE r IS NOT NULL GROUP BY l, r ORDER BY pair_n DESC, l, r LIMIT 1),
         |s$i AS (
         |  SELECT ${foldSql("s.state", "b.l", "b.r")} AS state, s.wc
         |  FROM s${i - 1} AS s, b$i AS b)""".stripMargin
    }
    head + iters.mkString
  }

  // ---------------------------------------------------------------- q182: BPE vocabulary induction
  /** Learn K merges from the corpus (see [[graft.ops.text.Bpe]]:
    * corpus-scale = one word-count shuffle; merge loop =
    * vocabulary-sized). Output is the learned merge table itself —
    * rank order, symbols, and pair counts all hash-checked. */
  val q182BpeTrain: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val words = docs.filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
    Bpe.train(words, "w", K).orderBy("rank")
  }

  private val q182Sql =
    trainCtes(K) + "\nSELECT * FROM (" +
      (1 to K).map(i =>
        s"SELECT $i AS rank, l AS left_sym, r AS right_sym, l || r AS merged, pair_n FROM b$i")
        .mkString(" UNION ALL ") +
      ") ORDER BY rank"

  // ---------------------------------------------------------------- q183: tokenize with the learned merges
  /** Apply the learned merge table and report per-language token
    * statistics: the compression the tokenizer actually achieves.
    *
    * The fold chain runs over the DISTINCT-word vocabulary (merge
    * table broadcast as one map row — no driver collect), and the
    * corpus leg is a pre-reduced (lang, word) count joined back to
    * the tokenized vocabulary by broadcast. Token totals are then
    * count×len integer products — the fold executes |vocab| times,
    * never once per corpus occurrence (`aggregate` HOFs are
    * CodegenFallback, so keeping them off the corpus-sized path
    * matters twice at 100 TB). */
  val q183BpeTokenize: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val words = docs.filter(col("text").isNotNull)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val byLangWord = words.groupBy("lang", "w")
      .agg(count(lit(1)).cast("long").as("n_occ"))
    val merges = Bpe.train(words.select("w"), "w", K)
    val vocabToks = byLangWord.select("w").distinct()
      .crossJoin(broadcast(Bpe.mergesRow(merges)))
      .select(col("w"),
        Bpe.nSymbols(Bpe.applyAll(col("w"), col("bpe_merges"), K)).cast("long").as("n_sym"))
    byLangWord.join(broadcast(vocabToks), Seq("w"))
      .groupBy("lang")
      .agg(sum(col("n_occ")).cast("long").as("n_words"),
        sum(col("n_occ") * length(col("w"))).cast("long").as("n_chars"),
        sum(col("n_occ") * col("n_sym")).cast("long").as("bpe_tokens"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("bpe_tokens").cast("double"))
      .orderBy("lang")
  }

  private val q183Sql = {
    val stages = (1 to K).map { i =>
      s""",
         |w$i AS (SELECT lang, w, ${foldSql("state", s"m.l", s"m.r")} AS state
         |        FROM w${i - 1}, b$i AS m)""".stripMargin
    }.mkString
    trainCtes(K) +
      s""",
         |w0 AS (
         |  SELECT lang, w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS state
         |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
         |        FROM documents WHERE text IS NOT NULL)
         |  WHERE w <> '')$stages
         |SELECT lang, COUNT(*) AS n_words,
         |       CAST(SUM(length(w)) AS BIGINT) AS n_chars,
         |       CAST(SUM(len(string_split(state, ' '))) AS BIGINT) AS bpe_tokens,
         |       CAST(SUM(length(w)) AS DOUBLE) /
         |         CAST(SUM(len(string_split(state, ' '))) AS DOUBLE) AS chars_per_token
         |FROM w$K GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- q184: token-balanced shard assignment
  /** Token-balanced output sharding: training loaders want N shards
    * with near-equal TOKEN mass, not equal row counts. Exclusive
    * token prefix-sum over a deterministic doc order →
    * shard = floor(prefix·N / total), all integer math. The prefix
    * sum is [[graft.ops.DistributedRank.prefixSum]] (range shuffle +
    * KB offset job — no single-task global window even with no
    * stratum), and totalCol rides the same count job. A writer would
    * then `partitionBy("shard")` — each output file lands within one
    * doc of the ideal token mass. */
  val q184TokenShards: Q = (s, d) => {
    val S = 8
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id"),
        graft.ops.text.TextOps.nWsTokens(col("text")).cast("long").as("n_tok"))
    graft.ops.DistributedRank.prefixSum(docs, Seq.empty, Seq(col("doc_id")),
        "n_tok", "cum", totalCol = "total")
      .select(col("doc_id"), col("n_tok"),
        least(lit(S - 1L),
          expr(s"((cum - n_tok) * $S) DIV total")).as("shard"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").cast("long").as("tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard")
  }

  private val q184Sql =
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
      |  FROM documents WHERE text IS NOT NULL AND text <> ''),
      |c AS (
      |  SELECT doc_id, n_tok,
      |         CAST(SUM(n_tok) OVER (ORDER BY doc_id) AS BIGINT) AS cum,
      |         CAST(SUM(n_tok) OVER () AS BIGINT) AS total
      |  FROM t),
      |s AS (
      |  SELECT doc_id, n_tok,
      |         CAST(LEAST(7, ((cum - n_tok) * 8) // total) AS BIGINT) AS shard
      |  FROM c)
      |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tokens,
      |       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM s GROUP BY shard ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------- q185: substring dup via rolling hash
  /** q181's audit on the 100 TB shuffle layout: window multiplicity
    * keyed by a codegen'd O(len) [[graft.functions.RollingHash]]
    * (8-byte payload) instead of k-char substrings. The ORACLE is the
    * exact-text SQL — hash equality must reproduce the string-equality
    * result bit-for-bit on this (ASCII) corpus, which doubles as a
    * live collision audit at every SF. */
  val q185SubstringDupHashed: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val dup = SubstringDup.dupCharsHashed(docs, "doc_id", "text", 20)
    val perLang = docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("text"))).cast("long").as("total_chars"))
    val dupLang = docs.join(dup, Seq("doc_id"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs_with_dup"),
        sum("dup_chars").cast("long").as("dup_chars"))
    perLang.join(dupLang, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_docs_with_dup"), lit(0L)).as("n_docs_with_dup"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        col("total_chars"),
        (coalesce(col("dup_chars"), lit(0L)).cast("double") /
          col("total_chars").cast("double")).as("dup_frac"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q186: collocation / phrase mining
  /** word2phrase collocation mining (Mikolov et al. 2013): per
    * language, the top-10 bigrams by score = (c12 − δ)·N / (c1·c2)
    * with a min-support gate — the phrase-detection pass run before
    * tokenizer training so "new york" becomes one symbol. Determinism:
    * every count is exact int64; the score is two IEEE double
    * multiplies and one division in a fixed order, so it is
    * bit-identical cross-engine (no float SUMS anywhere). Scale shape:
    * bigram production is a map-side explode feeding ONE
    * partially-aggregated (lang, w1, w2) shuffle; the unigram vocab
    * and per-lang totals are vocabulary-sized broadcasts back onto it;
    * top-10 per language is the custom TopKPerKey physical operator
    * (per-partition heaps + final heap — never a sort of the full
    * bigram table). */
  val q186Collocations: Q = (s, d) => {
    import graft.ops.text.TextOps
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull && col("text") =!= "")
    val toks = docs.select(col("lang"), TextOps.wsTokens(col("text")).as("t"))
    val bigrams = toks
      .select(col("lang"), explode(expr(
        "transform(slice(t, 1, size(t) - 1), (w, i) -> struct(w AS w1, t[i + 1] AS w2))")).as("b"))
      .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 3)
    val unigrams = toks
      .select(col("lang"), explode(col("t")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("cw"))
    val totals = unigrams.groupBy("lang").agg(sum("cw").as("n_tok"))
    val scored = bigrams
      .join(broadcast(unigrams.select(col("lang"), col("w").as("w1"), col("cw").as("c1"))),
        Seq("lang", "w1"))
      .join(broadcast(unigrams.select(col("lang"), col("w").as("w2"), col("cw").as("c2"))),
        Seq("lang", "w2"))
      .join(broadcast(totals), Seq("lang"))
      .withColumn("score",
        (col("c12") - 1).cast("double") * col("n_tok").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double")))
    graft.plans.TopKPerKey.topK(scored,
        Seq(col("lang")), Seq(col("score").desc, col("w1").asc, col("w2").asc), 10)
      .select("lang", "w1", "w2", "c12", "c1", "c2", "score")
      .orderBy(col("lang"), col("score").desc, col("w1"), col("w2"))
  }

  private val q186Sql =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split_regex(text, '\s+') AS toks
      |  FROM documents WHERE text IS NOT NULL AND text <> ''),
      |u AS (
      |  SELECT lang, unnest(toks) AS w FROM t),
      |uni AS (SELECT lang, w, COUNT(*) AS cw FROM u GROUP BY 1, 2),
      |tot AS (SELECT lang, CAST(SUM(cw) AS BIGINT) AS n_tok FROM uni GROUP BY 1),
      |bg AS (
      |  SELECT lang, toks[i] AS w1, toks[i + 1] AS w2
      |  FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i)),
      |big AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2, 3
      |        HAVING COUNT(*) >= 3),
      |sc AS (
      |  SELECT b.lang, w1, w2, c12, u1.cw AS c1, u2.cw AS c2,
      |         CAST(c12 - 1 AS DOUBLE) * CAST(n_tok AS DOUBLE)
      |           / (CAST(u1.cw AS DOUBLE) * CAST(u2.cw AS DOUBLE)) AS score
      |  FROM big b
      |  JOIN uni u1 ON u1.lang = b.lang AND u1.w = b.w1
      |  JOIN uni u2 ON u2.lang = b.lang AND u2.w = b.w2
      |  JOIN tot ON tot.lang = b.lang),
      |r AS (SELECT *, row_number() OVER (
      |        PARTITION BY lang ORDER BY score DESC, w1, w2) AS rk FROM sc)
      |SELECT lang, w1, w2, c12, c1, c2, score FROM r WHERE rk <= 10
      |ORDER BY lang, score DESC, w1, w2""".stripMargin

  // ---------------------------------------------------------------- q188: source marginal vocabulary contribution
  /** Data-acquisition analytics: what does each source ADD to the
    * corpus vocabulary once every earlier source is already ingested?
    * Sources are ordered by name (the deterministic stand-in for
    * acquisition order); a token is credited to the FIRST source that
    * contains it (min source name — one corpus-wide (token) agg).
    * Output per source: docs, token occurrences, distinct tokens, NEW
    * tokens, and the cumulative vocabulary — the curve whose
    * flattening says a new crawl buys nothing (Heaps-law saturation).
    * Scale shape: two partially-aggregated shuffles (token,
    * source×token) over the corpus; the cumulative sum is a window
    * over the SOURCES-sized result frame (tens of rows — bounded by
    * construction, not corpus-sized). */
  val q188SourceVocab: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.text.TextOps
    val docs = Tables.documents(s, d)
      .filter(col("text").isNotNull && col("text") =!= "")
    val toks = docs.select(col("source"), explode(TextOps.wsTokens(col("text"))).as("tok"))
    val perSrcTok = toks.groupBy("source", "tok").agg(count(lit(1)).as("n_occ"))
    val firstSrc = perSrcTok.groupBy("tok").agg(min("source").as("first_source"))
    val bySrc = perSrcTok.groupBy("source").agg(
      sum("n_occ").cast("long").as("n_tokens"),
      count(lit(1)).as("distinct_tokens"))
    val newBySrc = firstSrc.groupBy(col("first_source").as("source"))
      .agg(count(lit(1)).as("new_tokens"))
    val nDocs = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val w = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    nDocs.join(bySrc, "source").join(newBySrc, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("distinct_tokens"),
        coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
      .withColumn("cum_vocab", sum("new_tokens").over(w))
      .orderBy("source")
  }

  private val q188Sql =
    """WITH t AS (
      |  SELECT doc_id, source, unnest(string_split_regex(text, '\s+')) AS tok
      |  FROM documents WHERE text IS NOT NULL AND text <> ''),
      |pst AS (SELECT source, tok, COUNT(*) AS n_occ FROM t GROUP BY 1, 2),
      |fs AS (SELECT tok, MIN(source) AS first_source FROM pst GROUP BY 1),
      |bs AS (SELECT source, CAST(SUM(n_occ) AS BIGINT) AS n_tokens,
      |              COUNT(*) AS distinct_tokens
      |       FROM pst GROUP BY 1),
      |nw AS (SELECT first_source AS source, COUNT(*) AS new_tokens
      |       FROM fs GROUP BY 1),
      |nd AS (SELECT source, COUNT(*) AS n_docs
      |       FROM documents WHERE text IS NOT NULL AND text <> '' GROUP BY 1)
      |SELECT nd.source, n_docs, n_tokens, distinct_tokens,
      |       CAST(COALESCE(new_tokens, 0) AS BIGINT) AS new_tokens,
      |       CAST(SUM(COALESCE(new_tokens, 0))
      |              OVER (ORDER BY nd.source) AS BIGINT) AS cum_vocab
      |FROM nd JOIN bs USING (source) LEFT JOIN nw USING (source)
      |ORDER BY nd.source""".stripMargin

  // ---------------------------------------------------------------- q189: train→eval verbatim leakage
  /** Decontamination audit at the substring level (Lee et al. 2022):
    * holding out every 17th doc as the eval set, what fraction of
    * each eval doc's chars is covered by a 20-char window that
    * appears VERBATIM anywhere in the train split? Set-overlap
    * decontamination (q104) sees shared n-grams; this sees the exact
    * copied spans that inflate eval scores. Rolling-hash keys both
    * sides ([[graft.ops.dedup.SubstringDup.leakedCharsHashed]]), the
    * containment test is a distributed hash semi-join; the ORACLE
    * replays it with exact substrings — a collision audit like q185. */
  val q189EvalLeakage: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val evalDocs = docs.filter(col("doc_id") % 17 === 0)
    val trainDocs = docs.filter(col("doc_id") % 17 =!= 0)
    val leak = SubstringDup.leakedCharsHashed(evalDocs, trainDocs, "doc_id", "text", 20)
      .withColumnRenamed("dup_chars", "leaked_chars")
    val perLang = evalDocs.groupBy("lang").agg(
      count(lit(1)).as("n_eval_docs"),
      sum(length(col("text"))).cast("long").as("total_chars"))
    val leakLang = evalDocs.join(leak, Seq("doc_id"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs_leaked"),
        sum("leaked_chars").cast("long").as("leaked_chars"))
    perLang.join(leakLang, Seq("lang"), "left")
      .select(col("lang"), col("n_eval_docs"),
        coalesce(col("n_docs_leaked"), lit(0L)).as("n_docs_leaked"),
        coalesce(col("leaked_chars"), lit(0L)).as("leaked_chars"),
        col("total_chars"),
        (coalesce(col("leaked_chars"), lit(0L)).cast("double") /
          col("total_chars").cast("double")).as("leak_frac"))
      .orderBy("lang")
  }

  private val q189Sql =
    """WITH ev AS (SELECT * FROM documents WHERE doc_id % 17 = 0),
      |tr AS (SELECT * FROM documents WHERE doc_id % 17 <> 0),
      |tw AS (
      |  SELECT DISTINCT substr(text, CAST(i AS INT), 20) AS win
      |  FROM (SELECT text, unnest(generate_series(1, length(text) - 19)) AS i
      |        FROM tr WHERE text IS NOT NULL AND length(text) >= 20) u),
      |ew AS (
      |  SELECT doc_id, i, substr(text, CAST(i AS INT), 20) AS win
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 19)) AS i
      |        FROM ev WHERE text IS NOT NULL AND length(text) >= 20) u),
      |flagged AS (
      |  SELECT doc_id, i FROM ew WHERE win IN (SELECT win FROM tw)),
      |per_doc AS (
      |  SELECT doc_id, CAST(SUM(CASE WHEN prev IS NULL THEN 20
      |                                ELSE LEAST(20, i - prev) END) AS BIGINT) AS leaked_chars
      |  FROM (SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |        FROM flagged)
      |  GROUP BY doc_id),
      |lang_tot AS (
      |  SELECT lang, COUNT(*) AS n_eval_docs,
      |         CAST(SUM(length(text)) AS BIGINT) AS total_chars
      |  FROM ev GROUP BY lang),
      |lang_leak AS (
      |  SELECT e.lang, COUNT(*) AS n_docs_leaked,
      |         CAST(SUM(p.leaked_chars) AS BIGINT) AS leaked_chars
      |  FROM ev e JOIN per_doc p USING (doc_id) GROUP BY e.lang)
      |SELECT t.lang, t.n_eval_docs,
      |       CAST(COALESCE(u.n_docs_leaked, 0) AS BIGINT) AS n_docs_leaked,
      |       CAST(COALESCE(u.leaked_chars, 0) AS BIGINT) AS leaked_chars,
      |       t.total_chars,
      |       CAST(COALESCE(u.leaked_chars, 0) AS DOUBLE)
      |         / CAST(t.total_chars AS DOUBLE) AS leak_frac
      |FROM lang_tot t LEFT JOIN lang_leak u USING (lang) ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q191: dup-structure modularity by source
  /** Can dedup be SHARDED by source? Newman modularity of the
    * source partition over the boilerplate-prefix duplicate graph
    * (docs sharing their first 40 chars = one clique — the
    * template/boilerplate signature; this corpus has no full-text
    * exact dups, q181 shows the duplication lives in substrings). High modularity → duplicates live within
    * sources and per-source dedup shards catch them; near zero →
    * duplication crosses sources and dedup must stay global. The
    * clique structure collapses the whole graph to (group, source)
    * CELL COUNTS — no edge materialization ever: m = Σ C(g,2),
    * within-source edges e_c = Σ C(cell,2), degree mass
    * D_c = Σ cell·(g−1), contribution (4m·e_c − D_c²)/(4m²) — exact
    * int64 counts into a fixed-order IEEE expression. Two pre-reduced
    * shuffles (text-hash, then source), everything after is
    * cell-table-sized. */
  val q191DupModularity: Q = (s, d) => {
    import graft.ops.dedup.Dedup
    val docs = Tables.documents(s, d)
    val h = docs.select(col("doc_id"), col("source"),
      Dedup.h60(lit(0), substring(col("text"), 1, 40)).as("h"))
    val gsz = h.groupBy("h").agg(count(lit(1)).as("g")).filter(col("g") >= 2)
    val cells = h.join(gsz, "h")
      .groupBy("source", "h", "g").agg(count(lit(1)).as("cell"))
    val m = gsz.agg(sum(expr("g * (g - 1) DIV 2")).cast("long").as("m"))
    val perSrc = cells.groupBy("source").agg(
      sum("cell").cast("long").as("n_docs_grouped"),
      sum(expr("cell * (g - 1)")).cast("long").as("d_c"),
      sum(expr("cell * (cell - 1) DIV 2")).cast("long").as("e_c"))
    perSrc.crossJoin(broadcast(m))
      .withColumn("q_contrib",
        (lit(4.0) * col("m").cast("double") * col("e_c").cast("double")
          - col("d_c").cast("double") * col("d_c").cast("double"))
          / (lit(4.0) * col("m").cast("double") * col("m").cast("double")))
      .select("source", "n_docs_grouped", "e_c", "d_c", "m", "q_contrib")
      .orderBy("source")
  }

  private val q191Sql =
    """WITH h AS (
      |  SELECT doc_id, source,
      |         ('0x' || substr(md5('0|' || substr(text, 1, 40)), 1, 15))::BIGINT AS h
      |  FROM documents),
      |gsz AS (SELECT h, COUNT(*) AS g FROM h GROUP BY 1 HAVING COUNT(*) >= 2),
      |cells AS (
      |  SELECT source, h.h, g, COUNT(*) AS cell
      |  FROM h JOIN gsz USING (h) GROUP BY 1, 2, 3),
      |m AS (SELECT CAST(SUM(g * (g - 1) // 2) AS BIGINT) AS m FROM gsz),
      |ps AS (
      |  SELECT source, CAST(SUM(cell) AS BIGINT) AS n_docs_grouped,
      |         CAST(SUM(cell * (g - 1)) AS BIGINT) AS d_c,
      |         CAST(SUM(cell * (cell - 1) // 2) AS BIGINT) AS e_c
      |  FROM cells GROUP BY 1)
      |SELECT source, n_docs_grouped, e_c, d_c, m,
      |       (4.0 * CAST(m AS DOUBLE) * CAST(e_c AS DOUBLE)
      |          - CAST(d_c AS DOUBLE) * CAST(d_c AS DOUBLE))
      |         / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)) AS q_contrib
      |FROM ps CROSS JOIN m ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q192: longest duplicated span
  /** The headline memorization statistic: per language, the longest
    * contiguous verbatim-duplicated span (maximal union of flagged
    * k=20 windows, [[graft.ops.dedup.SubstringDup.dupSpansHashed]])
    * and which document carries it, plus span/doc counts. Winner
    * selection is deterministic: longest span, then smallest
    * span_start, then smallest doc_id — identical ORDER BY in the
    * oracle. Rolling-hash flagging (8-byte exchange); the oracle
    * replays with exact substrings, so this is also a collision audit
    * over the island logic. */
  val q192LongestSpan: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val spans = SubstringDup.dupSpansHashed(docs, "doc_id", "text", 20)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val perDoc = spans.groupBy("lang", "doc_id")
      .agg(count(lit(1)).as("n_spans_doc"), max("span_len").as("max_span_doc"))
    val stats = perDoc.groupBy("lang").agg(
      count(lit(1)).as("n_docs_with_dup"),
      sum("n_spans_doc").cast("long").as("n_spans"))
    val w = Window.partitionBy("lang")
      .orderBy(col("span_len").desc, col("span_start").asc, col("doc_id").asc)
    val winner = spans.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("lang"), col("span_len").as("longest_span"),
        col("doc_id").as("longest_doc"), col("span_start").as("longest_start"))
    stats.join(winner, "lang").orderBy("lang")
  }

  private val q192Sql =
    """WITH wins AS (
      |  SELECT doc_id, i, substr(text, CAST(i AS INT), 20) AS win
      |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text) - 19)) AS i
      |        FROM documents WHERE text IS NOT NULL AND length(text) >= 20) u),
      |flagged AS (
      |  SELECT doc_id, i FROM (
      |    SELECT doc_id, i, COUNT(*) OVER (PARTITION BY win) AS cnt FROM wins) z
      |  WHERE cnt >= 2),
      |isl AS (
      |  SELECT doc_id, i,
      |         CASE WHEN prev IS NULL OR i - prev > 20 THEN 1 ELSE 0 END AS brk
      |  FROM (SELECT doc_id, i, lag(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |        FROM flagged)),
      |grp AS (
      |  SELECT doc_id, i,
      |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island
      |  FROM isl),
      |spans AS (
      |  SELECT g.doc_id, d.lang, MIN(i) AS span_start,
      |         MAX(i) - MIN(i) + 20 AS span_len
      |  FROM grp g JOIN documents d USING (doc_id)
      |  GROUP BY g.doc_id, d.lang, island),
      |per_doc AS (
      |  SELECT lang, doc_id, COUNT(*) AS n_spans_doc, MAX(span_len) AS max_span_doc
      |  FROM spans GROUP BY 1, 2),
      |stats AS (
      |  SELECT lang, COUNT(*) AS n_docs_with_dup,
      |         CAST(SUM(n_spans_doc) AS BIGINT) AS n_spans
      |  FROM per_doc GROUP BY 1),
      |winner AS (
      |  SELECT lang, CAST(span_len AS BIGINT) AS longest_span,
      |         doc_id AS longest_doc, CAST(span_start AS BIGINT) AS longest_start
      |  FROM (SELECT *, row_number() OVER (
      |          PARTITION BY lang
      |          ORDER BY span_len DESC, span_start, doc_id) AS rk FROM spans)
      |  WHERE rk = 1)
      |SELECT lang, n_docs_with_dup, n_spans, longest_span, longest_doc, longest_start
      |FROM stats JOIN winner USING (lang) ORDER BY lang""".stripMargin

  // ----------------------------------------------------------------
  val all: Map[String, Q] = Map(
    "q181_substring_dup" -> q181SubstringDup,
    "q182_bpe_train" -> q182BpeTrain,
    "q183_bpe_tokenize" -> q183BpeTokenize,
    "q184_token_shards" -> q184TokenShards,
    "q185_substring_dup_hashed" -> q185SubstringDupHashed,
    "q186_collocations" -> q186Collocations,
    "q188_source_vocab" -> q188SourceVocab,
    "q189_eval_leakage" -> q189EvalLeakage,
    "q191_dup_modularity" -> q191DupModularity,
    "q192_longest_span" -> q192LongestSpan)

  val oracle: Map[String, String] = Map(
    "q181_substring_dup" -> q181Sql,
    "q182_bpe_train" -> q182Sql,
    "q183_bpe_tokenize" -> q183Sql,
    "q184_token_shards" -> q184Sql,
    "q185_substring_dup_hashed" -> q181Sql,
    "q186_collocations" -> q186Sql,
    "q188_source_vocab" -> q188Sql,
    "q189_eval_leakage" -> q189Sql,
    "q191_dup_modularity" -> q191Sql,
    "q192_longest_span" -> q192Sql)
}
