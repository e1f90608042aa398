package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.DistributedRank
import graft.ops.dedup.{ConnectedComponents, Dedup}
import graft.ops.text.TextOps

/** Corpus-curation operators beyond the per-document scores: span
  * (line-level) dedup, per-domain caps, duplicate-cluster components.
  * These are the standard large-corpus curation stages (C4 §2.2 span
  * removal, RefinedWeb line dedup, per-host caps, SlimPajama-style
  * cluster canonicalization) re-expressed as Spark plans. */
object QueryCatalogCuration {
  import QueryCatalog.Q

  // ---------------------------------------------------------------- span (line-level) dedup
  /** C4-style span dedup: the corpus is cut into non-overlapping
    * 5-token spans; any span occurring in MORE THAN ONE document is
    * boilerplate and is removed from every document, which is then
    * reassembled from its surviving spans in order. (C4 does this
    * with three-sentence spans; the fixture corpus has no sentence
    * marks, so the span unit is 5 tokens.) A newsletter-style
    * boilerplate line is planted on every third document to give the
    * rule something real to remove — the plant shifts that doc's
    * span grid too, exactly like a real injected header.
    *
    * Scale shape: span extraction is a pure map (the q96 lesson:
    * per-doc arrays, no token-wide explode+window); the df count is
    * one partial-agg shuffle keyed by span text; removal is a join
    * back on the span key; reassembly is one groupBy(doc) with an
    * in-row sort of (idx, span) structs. No window over the corpus,
    * no driver state — every step is the hash-partitioned pattern
    * that survives 100 TB. */
  val q99LineDedup: Q = (s, d) => {
    val planted = Tables.documents(s, d)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(lit("subscribe to our newsletter now "), col("text")))
          .otherwise(col("text")).as("text"))
    val base = planted
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 5)
      .withColumn("n_spans", expr("CAST(size(toks) DIV 5 AS BIGINT)"))
    val spans = base.select(col("doc_id"),
      explode(expr(
        """transform(sequence(0, CAST(n_spans AS INT) - 1),
          |          i -> struct(CAST(i AS BIGINT) AS idx,
          |                      concat_ws(' ', slice(toks, i * 5 + 1, 5)) AS span))"""
          .stripMargin)).as("sp"))
      .select(col("doc_id"), col("sp.idx").as("idx"), col("sp.span").as("span"))
    val df = spans.groupBy("span")
      .agg(count_distinct(col("doc_id")).as("df"))
    val kept = spans.join(df.filter(col("df") <= 1), "span")
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(idx, span))), x -> x.span)"))
          .as("clean_text"))
    base.select(col("doc_id"), col("n_spans"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  private val q99Sql =
    """WITH d AS (SELECT doc_id,
      |             CASE WHEN doc_id % 3 = 0
      |                  THEN 'subscribe to our newsletter now ' || text
      |                  ELSE text END AS text
      |           FROM documents),
      |t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM d),
      |base AS (SELECT doc_id, toks, len(toks) // 5 AS n_spans
      |         FROM t WHERE len(toks) >= 5),
      |ch AS (SELECT doc_id, i AS idx,
      |              array_to_string(toks[(i*5+1):(i*5+5)], ' ') AS span
      |       FROM base, LATERAL (SELECT unnest(range(n_spans)) AS i)),
      |df AS (SELECT span, COUNT(DISTINCT doc_id) AS df FROM ch GROUP BY 1),
      |kept AS (SELECT c.* FROM ch c JOIN df USING (span) WHERE df.df <= 1),
      |reb AS (SELECT doc_id, COUNT(*) AS n_kept,
      |               string_agg(span, ' ' ORDER BY idx) AS clean_text
      |        FROM kept GROUP BY 1)
      |SELECT b.doc_id, b.n_spans,
      |       COALESCE(r.n_kept, 0) AS n_kept,
      |       COALESCE(r.clean_text, '') AS clean_text
      |FROM base b LEFT JOIN reb r USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- line-level quality filter
  /** C4-style LINE-level quality rules (the stage BEFORE doc-level
    * scoring: drop boilerplate lines, keep the document): a line
    * survives iff it ends with terminal punctuation, has >= 5 words,
    * and carries no boilerplate marker ("javascript"/"cookie"/
    * "subscribe"). Lines are planted per doc (the synthetic corpus is
    * single-line): one good sentence, one JS/cookie wall, one
    * too-short line — the original text is line 0 and lives or dies
    * by the same rules. Explode -> filter -> order-preserving
    * reassembly; every rule is a codegen'd column predicate and the
    * only exchange is the per-doc regroup. */
  val q123LineQuality: Q = (s, d) => {
    val sid = col("doc_id").cast("string")
    val planted = Tables.documents(s, d).select(col("doc_id"), concat(
      col("text"), lit("\n"),
      lit("the farm report for pen "), sid, lit(" was filed on time.\n"),
      lit("please enable javascript and accept cookie "), sid, lit("\n"),
      lit("ok no. "), sid).as("text2"))
    val lines = planted
      .select(col("doc_id"), posexplode(split(col("text2"), "\n")).as(Seq("idx", "line")))
    val keep = substring(col("line"), -1, 1).isin(".", "!", "?") &&
      size(split(col("line"), "\\s+")) >= 5 &&
      !col("line").contains("javascript") && !col("line").contains("cookie") &&
      !col("line").contains("subscribe")
    val kept = lines.withColumn("keep", keep)
    val reb = kept.filter(col("keep"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", expr(
          "transform(array_sort(collect_list(struct(idx, line))), x -> x.line)"))
          .as("clean_text"))
    kept.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
      .join(reb, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  private val q123Sql =
    """WITH planted AS (
      |  SELECT doc_id,
      |    text || chr(10) ||
      |    'the farm report for pen ' || CAST(doc_id AS VARCHAR) || ' was filed on time.' || chr(10) ||
      |    'please enable javascript and accept cookie ' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |    'ok no. ' || CAST(doc_id AS VARCHAR) AS text2
      |  FROM documents),
      |lines AS (
      |  SELECT doc_id, u.idx - 1 AS idx, u.line
      |  FROM planted,
      |       LATERAL (SELECT unnest(string_split(text2, chr(10))) AS line,
      |                       generate_subscripts(string_split(text2, chr(10)), 1) AS idx)
      |       AS u),
      |flagged AS (
      |  SELECT doc_id, idx, line,
      |    (right(line, 1) IN ('.', '!', '?')
      |     AND len(string_split_regex(line, '\s+')) >= 5
      |     AND line NOT LIKE '%javascript%' AND line NOT LIKE '%cookie%'
      |     AND line NOT LIKE '%subscribe%') AS keep
      |  FROM lines),
      |reb AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |         string_agg(line, chr(10) ORDER BY idx) AS clean_text
      |  FROM flagged WHERE keep GROUP BY 1)
      |SELECT f.doc_id, COUNT(*) AS n_lines,
      |       COALESCE(ANY_VALUE(r.n_kept), 0) AS n_kept,
      |       COALESCE(ANY_VALUE(r.clean_text), '') AS clean_text
      |FROM flagged f LEFT JOIN reb r USING (doc_id)
      |GROUP BY f.doc_id
      |ORDER BY f.doc_id""".stripMargin

  // ---------------------------------------------------------------- per-domain cap
  /** Per-source document cap: keep the top 5 docs per source by
    * quality score (ties broken by doc_id — a total order, so both
    * engines pick identical rows). The host-cap rule every web-corpus
    * pipeline applies so one domain can't dominate training data.
    *
    * Runs on the custom TopKPerKey Catalyst operator (its second
    * production use after q56): bounded per-key heaps BEFORE the
    * exchange, so at most k rows per source per partition cross the
    * wire and the plan has no sort — the only formulation that holds
    * when one domain has a billion pages. */
  val q100DomainCap: Q = (s, d) => {
    val scored = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        TextOps.qualityScore(col("text"),
          graft.pipeline.CorpusCurationJob.Stopwords).as("quality"))
    graft.plans.TopKPerKey.topK(scored, Seq(col("source")),
        Seq(col("quality").desc, col("doc_id").asc), 5)
      .orderBy("source", "doc_id")
  }

  private val q100Sql =
    """WITH s AS (SELECT source, doc_id,
      |    least(length(text), 400)::DOUBLE / 400 * 0.5
      |    + CAST(len(list_filter(string_split_regex(text, '\s+'),
      |                           x -> x = 'the' OR x = 'a')) AS DOUBLE)
      |      / len(string_split_regex(text, '\s+')) * 0.5 AS quality
      |  FROM documents),
      |r AS (SELECT *, row_number() OVER (
      |        PARTITION BY source ORDER BY quality DESC, doc_id) AS rn
      |      FROM s)
      |SELECT source, doc_id, quality FROM r WHERE rn <= 5
      |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------- duplicate clusters
  /** Duplicate-cluster canonicalization: the verified near-dup pairs
    * of the re-crawl corpus (q91's scenario) become an undirected
    * graph; connected components assign every involved doc its
    * cluster (component = min doc id — the canonical copy to keep).
    * Chains matter: A~B from the base corpus and B~B' from the
    * re-crawl must land in ONE cluster even though A~B' was never a
    * candidate pair — exactly what pairwise drop-the-larger-id logic
    * (q91) cannot see. Min-label propagation, one shuffle per
    * superstep (ops.dedup.ConnectedComponents); the oracle replays
    * it as a recursive CTE. */
  val q101DupClusters: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val recrawl = docs.unionByName(
      docs.filter(col("doc_id") < 50).withColumn("doc_id", col("doc_id") + 1000000))
    // map-only signature branch (MinHashSig); the jaccard verifier
    // derives shingles AFTER the candidate restriction (jaccardText)
    val sig = Dedup.minHashText(recrawl, "doc_id", "text", 3, 16)
    val cand = Dedup.candidatePairs(
      Dedup.lshBands(sig, "doc_id", n = 16, rowsPerBand = 4), "doc_id")
    // scoped: jaccard's caches are released before CC starts; the
    // verified edge list (corpus-sublinear) localizes, so the CC
    // supersteps never re-plan the whole LSH pipeline either
    val edges = Dedup.jaccardTextScoped(cand, recrawl, "doc_id", "text", 3) { j =>
      graft.ops.Materialize.localize(
        j.filter(col("jaccard") >= 0.7).select("id_a", "id_b"))
    }
    // localized labels: the superstep checkpoints are freed before
    // this query returns (q132's discipline) — the query pins nothing
    val comp = ConnectedComponents.minLabelLocalized(edges)
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "component")
      .select(col("id").as("doc_id"), col("component"), col("cluster_size"))
      .orderBy("doc_id")
  }

  private def mhSqlLocal(iExpr: String, xExpr: String): String =
    s"""((('0x' || substr(md5($xExpr), 1, 15))::BIGINT
       |   + ($iExpr * (('0x' || substr(md5($xExpr), 17, 15))::BIGINT // 1073741824)
       |      % 1073741824) * 1073741824
       |   + $iExpr * (('0x' || substr(md5($xExpr), 17, 15))::BIGINT % 1073741824))
       |  % 1152921504606846976)""".stripMargin

  private val q101Sql =
    s"""WITH RECURSIVE dup AS (
       |  SELECT * FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
       |  FROM documents WHERE doc_id < 50),
       |tok AS (SELECT doc_id,
       |       unnest(string_split_regex(text, '\\s+')) AS tok,
       |       generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
       |     FROM dup),
       |sh0 AS (SELECT doc_id,
       |        lag(tok, 2) OVER dw || ' ' || lag(tok, 1) OVER dw || ' ' || tok AS w
       |        FROM tok WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
       |w AS (SELECT DISTINCT doc_id, w FROM sh0 WHERE w IS NOT NULL),
       |sig AS (SELECT doc_id, s.seed,
       |               MIN(${mhSqlLocal("s.seed", "w")}) AS mh
       |        FROM w, (SELECT unnest(range(16)) AS seed) s GROUP BY 1, 2),
       |b AS (SELECT doc_id, seed // 4 AS band,
       |             md5(string_agg(CAST(mh AS VARCHAR), ':' ORDER BY seed)) AS band_key
       |      FROM sig GROUP BY doc_id, seed // 4),
       |bsz AS (SELECT band, band_key FROM b
       |        GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 64),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |         FROM b a JOIN b b2 USING (band, band_key)
       |         JOIN bsz USING (band, band_key)
       |         WHERE a.doc_id < b2.doc_id),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM w GROUP BY 1),
       |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
       |          FROM cand c
       |          JOIN w wa ON wa.doc_id = c.id_a
       |          JOIN w wb ON wb.doc_id = c.id_b AND wb.w = wa.w
       |          GROUP BY 1, 2),
       |edges AS (
       |  SELECT c.id_a, c.id_b
       |  FROM cand c
       |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |  JOIN cnt ca ON ca.doc_id = c.id_a
       |  JOIN cnt cb ON cb.doc_id = c.id_b
       |  WHERE CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
       |        / (ca.n + cb.n - COALESCE(i.n_inter, 0)) >= 0.7),
       |e AS (SELECT id_a AS u, id_b AS v FROM edges
       |      UNION SELECT id_b, id_a FROM edges),
       |reach(id, r) AS (
       |  SELECT u, u FROM e
       |  UNION
       |  SELECT e.u, reach.r FROM e JOIN reach ON reach.id = e.v),
       |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY 1),
       |sz AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
       |SELECT comp.id AS doc_id, comp.component, sz.cluster_size
       |FROM comp JOIN sz USING (component)
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- deterministic holdout split
  /** Deterministic train/eval split: bucket = h60(seed, doc_id) % 10,
    * eval = bucket 0 (~10%). Hash-based splitting is the reproducible
    * form of corpus holdout — stable across reruns, machines and
    * engine versions, unlike rand()-based sampling, and any doc's
    * split is recomputable from its id alone. Pure projection + one
    * partial-agg shuffle; nothing else. */
  val q102HashSample: Q = (s, d) => {
    val bucket = pmod(Dedup.h60(lit(7), col("doc_id").cast("string")), lit(10))
    Tables.documents(s, d)
      .withColumn("bucket", bucket)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("bucket") === 0, 1L).otherwise(0L)).as("n_eval"))
      .select(col("lang"), col("n_docs"), col("n_eval"),
        (col("n_docs") - col("n_eval")).as("n_train"))
      .orderBy("lang")
  }

  private val q102Sql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN ('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |                     % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_eval,
      |  COUNT(*) - CAST(SUM(CASE WHEN ('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |                     % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_train
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- token-budget mix
  /** Data mixing under a token budget: per language, admit documents
    * in quality order (ties by doc_id — total order) until the
    * language's token budget (2000) is exhausted; a document is
    * admitted iff it STARTS inside the budget. This is the standard
    * mixture-weighting step when assembling a training corpus from
    * per-language pools.
    *
    * Scale shape: a per-key ordered prefix sum is inherently
    * sequential PER KEY, and languages are few and hugely skewed —
    * a `partitionBy(lang)` window would push every row of the
    * dominant language through ONE task's sorter. The prefix sum is
    * [[graft.ops.DistributedRank.prefixSum]]: range-repartition over
    * (lang, quality desc, doc_id), per-partition per-language token
    * sums (KB-sized), broadcast exclusive offsets, local running sum
    * — same arithmetic bit-for-bit, every task bounded by data/parts
    * regardless of language skew. */
  val q103TokenBudgetMix: Q = (s, d) => {
    val budget = 2000L
    val scored = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        TextOps.nWsTokens(col("text")).cast("long").as("n_tokens"),
        TextOps.qualityScore(col("text"),
          graft.pipeline.CorpusCurationJob.Stopwords).as("quality"))
    DistributedRank.prefixSum(scored, Seq("lang"),
        Seq(col("quality").desc, col("doc_id")), "n_tokens", "cum_tokens")
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select("lang", "doc_id", "n_tokens", "cum_tokens", "quality")
      .orderBy("lang", "doc_id")
  }

  private val q103Sql =
    """WITH s AS (SELECT lang, doc_id,
      |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
      |    least(length(text), 400)::DOUBLE / 400 * 0.5
      |    + CAST(len(list_filter(string_split_regex(text, '\s+'),
      |                           x -> x = 'the' OR x = 'a')) AS DOUBLE)
      |      / len(string_split_regex(text, '\s+')) * 0.5 AS quality
      |  FROM documents),
      |c AS (SELECT *, CAST(SUM(n_tokens) OVER (
      |        PARTITION BY lang ORDER BY quality DESC, doc_id
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |      FROM s)
      |SELECT lang, doc_id, n_tokens, cum_tokens, quality
      |FROM c WHERE cum_tokens - n_tokens < 2000
      |ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------- temperature sampling mix
  /** Temperature-weighted language mixing (the multilingual-corpus
    * sampling rule: p_l ∝ share_l^α with α < 1 flattens the head, so
    * low-resource languages are upsampled relative to raw token
    * share). α = 0.5 on purpose: share^0.5 = sqrt(share), and IEEE
    * 754 REQUIRES sqrt to be correctly rounded in both engines —
    * pow() is only near-correctly-rounded and may differ in the last
    * ulp, which a hash compare would catch. Weights are quantized to
    * integers (floor(sqrt*1e12+0.5), exactly representable) so both
    * the weight sum and every downstream ratio are order-independent
    * exact arithmetic. Aggregate sizes are language-count rows —
    * broadcast scalars, no data-sized shuffle beyond the per-lang
    * token count. */
  val q124TemperatureMix: Q = (s, d) => {
    val budget = 100000.0
    val counts = Tables.documents(s, d)
      .groupBy("lang")
      .agg(sum(TextOps.nWsTokens(col("text")).cast("long")).cast("long").as("n_tokens"))
    val tot = counts.agg(sum(col("n_tokens")).cast("long").as("n_total"))
    val w = counts.crossJoin(broadcast(tot))
      .withColumn("raw_share", col("n_tokens").cast("double") / col("n_total"))
      .withColumn("wq",
        floor(sqrt(col("raw_share")) * 1e12 + 0.5).cast("long"))
    val denom = w.agg(sum(col("wq")).cast("long").as("wq_sum"))
    w.crossJoin(broadcast(denom))
      .withColumn("p", col("wq").cast("double") / col("wq_sum"))
      .withColumn("alloc_tokens", floor(col("p") * budget + 0.5).cast("long"))
      .select("lang", "n_tokens", "raw_share", "p", "alloc_tokens")
      .orderBy("lang")
  }

  private val q124Sql =
    """WITH c AS (SELECT lang,
      |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_total FROM c),
      |w AS (SELECT lang, n_tokens,
      |             CAST(n_tokens AS DOUBLE) / n_total AS raw_share,
      |             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / n_total) * 1e12 + 0.5)
      |                  AS BIGINT) AS wq
      |      FROM c, t),
      |dn AS (SELECT CAST(SUM(wq) AS BIGINT) AS wq_sum FROM w)
      |SELECT lang, n_tokens, raw_share,
      |       CAST(wq AS DOUBLE) / wq_sum AS p,
      |       CAST(floor(CAST(wq AS DOUBLE) / wq_sum * 100000.0 + 0.5) AS BIGINT)
      |         AS alloc_tokens
      |FROM w, dn ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- decontamination
  /** Eval decontamination: a training document is contaminated if it
    * shares ANY 5-token span with any benchmark document (the n-gram
    * overlap rule used to scrub eval sets out of training corpora).
    * The benchmark set here is every 97th document — planted from the
    * corpus itself, so hits are guaranteed and transitively include
    * any doc that shares a phrase with a benchmark doc.
    *
    * Scale shape: the benchmark n-gram index is SMALL (eval sets are
    * thousands of docs, not billions) — it broadcasts, so the corpus
    * side is scanned once with a map-side LEFT SEMI probe and then
    * one distinct on contaminated doc ids. The corpus never shuffles
    * its n-grams. Output: per-language contamination tally. */
  val q104Decontaminate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val benchGrams = Dedup.shingleSet(
        docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", k = 5)
      .select("w").distinct()
    val contaminated = Dedup.shingleSet(docs, "doc_id", "text", k = 5)
      .join(broadcast(benchGrams), "w", "left_semi")
      .select("doc_id").distinct()
    docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(docs.join(contaminated, "doc_id")
          .groupBy("lang").agg(count(lit(1)).as("n_contaminated")),
        Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (col("n_docs") - coalesce(col("n_contaminated"), lit(0L))).as("n_clean"))
      .orderBy("lang")
  }

  private val q104Sql =
    """WITH bt AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks
      |            FROM documents WHERE doc_id % 97 = 0),
      |bg AS (SELECT DISTINCT array_to_string(toks[(i+1):(i+5)], ' ') AS w
      |       FROM bt, LATERAL (SELECT unnest(range(len(toks) - 4)) AS i)
      |       WHERE len(toks) >= 5),
      |ct AS (SELECT doc_id, lang, string_split_regex(text, '\s+') AS toks
      |       FROM documents),
      |cg AS (SELECT DISTINCT c.doc_id,
      |              array_to_string(toks[(i+1):(i+5)], ' ') AS w
      |       FROM ct c, LATERAL (SELECT unnest(range(len(toks) - 4)) AS i)
      |       WHERE len(toks) >= 5),
      |contam AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (w)),
      |tot AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
      |hit AS (SELECT d.lang, COUNT(*) AS n_contaminated
      |        FROM documents d JOIN contam USING (doc_id) GROUP BY 1)
      |SELECT tot.lang, tot.n_docs,
      |       COALESCE(hit.n_contaminated, 0) AS n_contaminated,
      |       tot.n_docs - COALESCE(hit.n_contaminated, 0) AS n_clean
      |FROM tot LEFT JOIN hit USING (lang)
      |ORDER BY tot.lang""".stripMargin

  // ---------------------------------------------------------------- bloom-prefiltered decontamination
  /** q104's decontamination run the way it runs at 100 TB: the eval
    * n-gram set is summarized into ONE [[graft.functions.BloomFilter]]
    * sketch row (2^17 bits = 16 KB buffer, bitwise-OR merge),
    * broadcast, and the corpus n-gram stream is probed MAP-SIDE by
    * `mightContain` — the exact verification join then only matters
    * for bloom hits. No false negatives by construction (same
    * md5-60bit hash on both sides), and the false-positive trickle is
    * not hidden: the output carries per-language GRAM-level bloom-hit
    * vs exact-confirmed counts (the prefilter's real selectivity
    * metric) plus the doc-level contamination tally, and the DuckDB
    * oracle REPLAYS the filter bit-for-bit — double-hashed probes,
    * false positives included. At sf0.01 the 2^17 filter is clean
    * (fp ~ 1e-5/gram, usually 0 hits); at sf0.1 the fp column goes
    * visibly nonzero — the size-∝-reference-set trade the docstring
    * of [[graft.functions.BloomFilter.DefaultBits]] describes. */
  val q126BloomDecontaminate: Q = (s, d) => {
    import graft.functions.BloomFilter
    val m = BloomFilter.DefaultBits
    val docs = Tables.documents(s, d)
    val evalGrams = Dedup.shingleSet(
        docs.filter(col("doc_id") % 89 === 0), "doc_id", "text", k = 5)
      .select("w").distinct()
    val sketch = evalGrams.agg(BloomFilter.bloom(col("w"), m).as("bf"))
    // per-doc distinct done IN-ROW (array_distinct pre-explode): the
    // corpus gram stream never shuffles — a `.distinct()` here would
    // be a corpus-wide (doc, gram) exchange, the exact cost the bloom
    // prefilter exists to avoid (PlanQualitySpec pins this)
    val grams = Dedup.shingleSetDistinct(docs, "doc_id", "text", k = 5)
    val flagged = grams.crossJoin(broadcast(sketch))
      .withColumn("bloom_hit", BloomFilter.mightContain(col("bf"), col("w")))
      .drop("bf")
      .join(broadcast(evalGrams.withColumn("conf", lit(true))), Seq("w"), "left")
      .withColumn("conf", coalesce(col("conf"), lit(false)))
    val perDoc = flagged.groupBy("doc_id").agg(
      count(lit(1)).as("g"),
      sum(col("bloom_hit").cast("long")).as("h"),
      sum(col("conf").cast("long")).as("c"))
    docs.join(perDoc, Seq("doc_id"), "left")
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("g"), lit(0L))).as("n_grams"),
        sum(coalesce(col("h"), lit(0L))).as("n_bloom_hits"),
        sum(coalesce(col("c"), lit(0L))).as("n_confirmed"),
        sum((coalesce(col("c"), lit(0L)) > 0).cast("long"))
          .as("n_contaminated_docs"))
      .withColumn("n_fp_grams", col("n_bloom_hits") - col("n_confirmed"))
      .orderBy("lang")
  }

  /** Double-hash replay: h1 = h % 2^30, h2 = (h // 2^30) forced odd,
    * probe_i = (h1 + i*h2) % 2^17 for i = 0, 1, 2. */
  private val q126Sql =
    """WITH bt AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks
      |            FROM documents WHERE doc_id % 89 = 0),
      |bg AS (SELECT DISTINCT array_to_string(toks[(i+1):(i+5)], ' ') AS w
      |       FROM bt, LATERAL (SELECT unnest(range(len(toks) - 4)) AS i)
      |       WHERE len(toks) >= 5),
      |bh AS (SELECT h % 1073741824 AS h1,
      |              (h // 1073741824) - ((h // 1073741824) % 2) + 1 AS h2
      |       FROM (SELECT ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM bg)),
      |bits AS (SELECT DISTINCT h1 % 131072 AS b FROM bh
      |         UNION SELECT DISTINCT (h1 + h2) % 131072 FROM bh
      |         UNION SELECT DISTINCT (h1 + 2 * h2) % 131072 FROM bh),
      |ct AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
      |cg AS (SELECT DISTINCT c.doc_id,
      |              array_to_string(toks[(i+1):(i+5)], ' ') AS w
      |       FROM ct c, LATERAL (SELECT unnest(range(len(toks) - 4)) AS i)
      |       WHERE len(toks) >= 5),
      |ch AS (SELECT doc_id, w, h % 1073741824 AS h1,
      |              (h // 1073741824) - ((h // 1073741824) % 2) + 1 AS h2
      |       FROM (SELECT doc_id, w,
      |               ('0x' || substr(md5(w), 1, 15))::BIGINT AS h FROM cg)),
      |fl AS (SELECT doc_id,
      |         (h1 % 131072 IN (SELECT b FROM bits)
      |          AND (h1 + h2) % 131072 IN (SELECT b FROM bits)
      |          AND (h1 + 2 * h2) % 131072 IN (SELECT b FROM bits)) AS bloom_hit,
      |         w IN (SELECT w FROM bg) AS conf
      |       FROM ch),
      |pd AS (SELECT doc_id, COUNT(*) AS g,
      |              SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS h,
      |              SUM(CASE WHEN conf THEN 1 ELSE 0 END) AS c
      |       FROM fl GROUP BY 1)
      |SELECT d.lang, COUNT(*) AS n_docs,
      |       CAST(SUM(COALESCE(g, 0)) AS BIGINT) AS n_grams,
      |       CAST(SUM(COALESCE(h, 0)) AS BIGINT) AS n_bloom_hits,
      |       CAST(SUM(COALESCE(c, 0)) AS BIGINT) AS n_confirmed,
      |       CAST(SUM(CASE WHEN COALESCE(c, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_contaminated_docs,
      |       CAST(SUM(COALESCE(h, 0)) - SUM(COALESCE(c, 0)) AS BIGINT) AS n_fp_grams
      |FROM documents d LEFT JOIN pd USING (doc_id)
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  // ---------------------------------------------------------------- sequence packing
  /** Training-sequence packing: per language, documents are laid out
    * contiguously in doc_id order and cut into fixed 512-token
    * training sequences — each doc learns its sequence id and offset
    * from the running token count alone (seq = tokens-before DIV 512).
    * This is the concat-and-cut packing every pretraining pipeline
    * runs between curation and tokenization; computing placement as
    * arithmetic on an ordered prefix sum (no driver loop, no UDF)
    * is what makes it a plan, not a job. Output: one row per doc
    * with (seq_id, seq_offset, spills) — `spills` marks docs that
    * straddle a sequence boundary (they get split downstream).
    * Same scale posture as q103: the running token count is
    * [[graft.ops.DistributedRank.prefixSum]] (range shuffle +
    * broadcast offsets), never a per-language window — no language,
    * however dominant, funnels through a single task. */
  val q106SequencePack: Q = (s, d) => {
    val seqLen = 512L
    val toks = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"),
        TextOps.nWsTokens(col("text")).cast("long").as("n_tokens"))
    DistributedRank.prefixSum(toks, Seq("lang"), Seq(col("doc_id")),
        "n_tokens", "cum")
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        ((col("cum") - col("n_tokens")) / seqLen).cast("long").as("seq_id"),
        ((col("cum") - col("n_tokens")) % seqLen).as("seq_offset"),
        when(((col("cum") - col("n_tokens")) / seqLen).cast("long")
          =!= ((col("cum") - 1) / seqLen).cast("long"), "Y").otherwise("N")
          .as("spills"))
      .orderBy("lang", "doc_id")
  }

  private val q106Sql =
    """WITH s AS (SELECT lang, doc_id,
      |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT *, CAST(SUM(n_tokens) OVER (
      |        PARTITION BY lang ORDER BY doc_id
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |      FROM s)
      |SELECT lang, doc_id, n_tokens,
      |       (cum - n_tokens) // 512 AS seq_id,
      |       (cum - n_tokens) % 512 AS seq_offset,
      |       CASE WHEN (cum - n_tokens) // 512 <> (cum - 1) // 512
      |            THEN 'Y' ELSE 'N' END AS spills
      |FROM c ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------- column profile
  /** One-pass column profile of lineitem (ops.Profiler): per column
    * the non-null count, exact distinct count and min/max, plus the
    * row count — the ANALYZE/data-quality report. One scan, one
    * Expand+aggregate pass for all distincts. */
  val q105ColumnProfile: Q = (s, d) =>
    graft.ops.Profiler.profile(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"))
      .orderBy("col_name")

  private val q105Sql =
    """WITH w AS (SELECT COUNT(*) AS n,
      |  COUNT(l_orderkey) AS nn1, COUNT(DISTINCT l_orderkey) AS nd1,
      |  CAST(MIN(l_orderkey) AS VARCHAR) AS mn1, CAST(MAX(l_orderkey) AS VARCHAR) AS mx1,
      |  COUNT(l_linenumber) AS nn2, COUNT(DISTINCT l_linenumber) AS nd2,
      |  CAST(MIN(l_linenumber) AS VARCHAR) AS mn2, CAST(MAX(l_linenumber) AS VARCHAR) AS mx2,
      |  COUNT(l_returnflag) AS nn3, COUNT(DISTINCT l_returnflag) AS nd3,
      |  CAST(MIN(l_returnflag) AS VARCHAR) AS mn3, CAST(MAX(l_returnflag) AS VARCHAR) AS mx3,
      |  COUNT(l_quantity) AS nn4, COUNT(DISTINCT l_quantity) AS nd4,
      |  CAST(MIN(l_quantity) AS VARCHAR) AS mn4, CAST(MAX(l_quantity) AS VARCHAR) AS mx4
      |  FROM lineitem)
      |SELECT 'l_orderkey' AS col_name, n AS n_rows, nn1 AS n_nonnull,
      |       nd1 AS n_distinct, mn1 AS min_value, mx1 AS max_value FROM w
      |UNION ALL
      |SELECT 'l_linenumber', n, nn2, nd2, mn2, mx2 FROM w
      |UNION ALL
      |SELECT 'l_returnflag', n, nn3, nd3, mn3, mx3 FROM w
      |UNION ALL
      |SELECT 'l_quantity', n, nn4, nd4, mn4, mx4 FROM w
      |ORDER BY col_name""".stripMargin

  // ---------------------------------------------------------------- fuzzy entity matching
  /** Blocked fuzzy matching (entity resolution): re-ingested records
    * with a one-character typo must link back to their originals.
    * Candidate pairs are generated ONLY within a blocking key
    * (p_brand, first two name chars — the typo preserves them) — the
    * standard ER discipline that keeps the pairwise edit-distance
    * stage at block_size^2, never corpus^2; a length-band prefilter
    * (|len diff| <= 1, implied by distance <= 1) runs before the
    * expensive levenshtein so codegen short-circuits most pairs.
    * Brand-only blocking measured 13.9s at sf0.1 (8M pairs); the
    * prefix block cuts it ~20x. Typos in the first two chars are
    * invisible by design; that is the documented blocking tradeoff
    * (real pipelines union several blocking passes). levenshtein is
    * a codegen'd built-in in Spark and replays exactly in DuckDB.
    *
    * Block sizes are CAPPED (`Blocking.capBlocks`) before the
    * self-join: a hot (brand, prefix) block is m^2 pairs with no
    * matching signal — the same skew bomb the dedup family guards
    * with maxBucket/maxDf. The cap rides the window count on the
    * join's own hash distribution (no extra shuffle); q113 plants a
    * hot block to prove the bound. */
  private def fuzzyPairsBy(all0: org.apache.spark.sql.DataFrame, maxBlock: Int,
                           blk: org.apache.spark.sql.Column
                          ): org.apache.spark.sql.DataFrame = {
    val all = graft.ops.Blocking.capBlocks(
      all0.withColumn("blk", blk), Seq("p_brand", "blk"), maxBlock)
    val a = all.select(col("p_brand"), col("blk"), col("p_partkey").as("id_a"),
      col("p_name").as("name_a"))
    val b = all.select(col("p_brand"), col("blk"), col("p_partkey").as("id_b"),
      col("p_name").as("name_b"))
    a.join(b, Seq("p_brand", "blk")).filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= 1)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select("p_brand", "id_a", "id_b", "name_a", "name_b", "dist")
  }

  private def fuzzyPairs(all0: org.apache.spark.sql.DataFrame,
                         maxBlock: Int): org.apache.spark.sql.DataFrame =
    fuzzyPairsBy(all0, maxBlock, substring(col("p_name"), 1, 2))

  val q108FuzzyMatch: Q = (s, d) => {
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_name"), col("p_brand"))
    val typo = p.filter(col("p_partkey") < 30)
      .select((col("p_partkey") + 1000000).as("p_partkey"),
        concat(substring(col("p_name"), 1, 2), substring(col("p_name"), 4, 10000))
          .as("p_name"),
        col("p_brand"))
    fuzzyPairs(p.unionByName(typo), maxBlock = 500)
      .orderBy("p_brand", "id_a", "id_b")
  }

  private val q108Sql =
    """WITH base AS (SELECT p_partkey, p_name, p_brand FROM part),
      |typo AS (SELECT p_partkey + 1000000 AS p_partkey,
      |                substr(p_name, 1, 2) || substr(p_name, 4) AS p_name,
      |                p_brand
      |         FROM part WHERE p_partkey < 30),
      |raw AS (SELECT *, substr(p_name, 1, 2) AS blk
      |        FROM (SELECT * FROM base UNION ALL SELECT * FROM typo)),
      |a AS (SELECT * FROM (
      |        SELECT *, COUNT(*) OVER (PARTITION BY p_brand, blk) AS bn FROM raw)
      |      WHERE bn <= 500)
      |SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
      |       a.p_name AS name_a, b.p_name AS name_b,
      |       levenshtein(a.p_name, b.p_name) AS dist
      |FROM a JOIN a b ON a.p_brand = b.p_brand AND a.blk = b.blk
      |               AND a.p_partkey < b.p_partkey
      |WHERE abs(length(a.p_name) - length(b.p_name)) <= 1
      |  AND levenshtein(a.p_name, b.p_name) <= 1
      |ORDER BY a.p_brand, id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- planted hot block
  /** q108's skew guard, exercised: 200 synthetic records sharing ONE
    * (brand, prefix) block — names differing only in a one-char
    * suffix, so WITHOUT the cap the block alone emits every one of
    * C(200,2) = 19,900 pairs past the dist<=1 filter (m^2-shaped,
    * pure boilerplate, zero entity-resolution signal). With the cap the
    * hot block is dropped before any pair exists and the output is
    * exactly q108's benign matches — proving the pair count is
    * bounded by maxBlock^2/2 per block regardless of skew, and that
    * capping leaves a benign corpus untouched. */
  val q113HotBlockCap: Q = (s, d) => {
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_name"), col("p_brand"))
    val typo = p.filter(col("p_partkey") < 30)
      .select((col("p_partkey") + 1000000).as("p_partkey"),
        concat(substring(col("p_name"), 1, 2), substring(col("p_name"), 4, 10000))
          .as("p_name"),
        col("p_brand"))
    val hot = p.filter(col("p_partkey") <= 200)
      .select((col("p_partkey") + 2000000).as("p_partkey"),
        concat(lit("zz boilerplate item "), (col("p_partkey") % 4).cast("string"))
          .as("p_name"),
        lit("HOT#00").as("p_brand"))
    fuzzyPairs(p.unionByName(typo).unionByName(hot), maxBlock = 64)
      .orderBy("p_brand", "id_a", "id_b")
  }

  private val q113Sql =
    """WITH base AS (SELECT p_partkey, p_name, p_brand FROM part),
      |typo AS (SELECT p_partkey + 1000000 AS p_partkey,
      |                substr(p_name, 1, 2) || substr(p_name, 4) AS p_name,
      |                p_brand
      |         FROM part WHERE p_partkey < 30),
      |hot AS (SELECT p_partkey + 2000000 AS p_partkey,
      |               'zz boilerplate item ' || CAST(p_partkey % 4 AS VARCHAR) AS p_name,
      |               'HOT#00' AS p_brand
      |        FROM part WHERE p_partkey <= 200),
      |raw AS (SELECT *, substr(p_name, 1, 2) AS blk
      |        FROM (SELECT * FROM base UNION ALL SELECT * FROM typo
      |              UNION ALL SELECT * FROM hot)),
      |a AS (SELECT * FROM (
      |        SELECT *, COUNT(*) OVER (PARTITION BY p_brand, blk) AS bn FROM raw)
      |      WHERE bn <= 64)
      |SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
      |       a.p_name AS name_a, b.p_name AS name_b,
      |       levenshtein(a.p_name, b.p_name) AS dist
      |FROM a JOIN a b ON a.p_brand = b.p_brand AND a.blk = b.blk
      |               AND a.p_partkey < b.p_partkey
      |WHERE abs(length(a.p_name) - length(b.p_name)) <= 1
      |  AND levenshtein(a.p_name, b.p_name) <= 1
      |ORDER BY a.p_brand, id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- multi-pass blocking
  /** The documented blind spot of q108 closed the way real ER
    * pipelines close it: a SECOND blocking pass on a different key,
    * unioned. The prefix block cannot see a typo in the first two
    * characters; the suffix block (last two characters) can — a
    * first-char deletion keeps the suffix intact. Both passes share
    * the capped-pair machinery; pair rows are deduped across passes
    * (a pair matched by both blocks is one match). Planted evidence:
    * the q108-style position-3 deletions (found by prefix, missed by
    * suffix only when the tail shifts) plus first-char deletions for
    * partkey 30-59 (invisible to prefix by construction). */
  val q118MultiBlockMatch: Q = (s, d) => {
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_name"), col("p_brand"))
    val typoMid = p.filter(col("p_partkey") < 30)
      .select((col("p_partkey") + 1000000).as("p_partkey"),
        concat(substring(col("p_name"), 1, 2), substring(col("p_name"), 4, 10000))
          .as("p_name"),
        col("p_brand"))
    val typoFront = p.filter(col("p_partkey") >= 30 && col("p_partkey") < 60)
      .select((col("p_partkey") + 3000000).as("p_partkey"),
        substring(col("p_name"), 2, 10000).as("p_name"),
        col("p_brand"))
    val all = p.unionByName(typoMid).unionByName(typoFront)
    fuzzyPairsBy(all, 500, substring(col("p_name"), 1, 2))
      .unionByName(fuzzyPairsBy(all, 500, expr("right(p_name, 2)")))
      .distinct()
      .orderBy("p_brand", "id_a", "id_b")
  }

  private val q118Sql =
    """WITH base AS (SELECT p_partkey, p_name, p_brand FROM part),
      |typo_mid AS (SELECT p_partkey + 1000000 AS p_partkey,
      |                    substr(p_name, 1, 2) || substr(p_name, 4) AS p_name,
      |                    p_brand
      |             FROM part WHERE p_partkey < 30),
      |typo_front AS (SELECT p_partkey + 3000000 AS p_partkey,
      |                      substr(p_name, 2) AS p_name, p_brand
      |               FROM part WHERE p_partkey >= 30 AND p_partkey < 60),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM typo_mid
      |      UNION ALL SELECT * FROM typo_front),
      |rawp AS (SELECT *, substr(p_name, 1, 2) AS blk FROM u),
      |ap AS (SELECT * FROM (
      |         SELECT *, COUNT(*) OVER (PARTITION BY p_brand, blk) AS bn FROM rawp)
      |       WHERE bn <= 500),
      |raws AS (SELECT *, right(p_name, 2) AS blk FROM u),
      |asx AS (SELECT * FROM (
      |         SELECT *, COUNT(*) OVER (PARTITION BY p_brand, blk) AS bn FROM raws)
      |       WHERE bn <= 500),
      |pp AS (SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
      |              a.p_name AS name_a, b.p_name AS name_b,
      |              levenshtein(a.p_name, b.p_name) AS dist
      |       FROM ap a JOIN ap b ON a.p_brand = b.p_brand AND a.blk = b.blk
      |                          AND a.p_partkey < b.p_partkey
      |       WHERE abs(length(a.p_name) - length(b.p_name)) <= 1
      |         AND levenshtein(a.p_name, b.p_name) <= 1),
      |ps AS (SELECT a.p_brand, a.p_partkey AS id_a, b.p_partkey AS id_b,
      |              a.p_name AS name_a, b.p_name AS name_b,
      |              levenshtein(a.p_name, b.p_name) AS dist
      |       FROM asx a JOIN asx b ON a.p_brand = b.p_brand AND a.blk = b.blk
      |                           AND a.p_partkey < b.p_partkey
      |       WHERE abs(length(a.p_name) - length(b.p_name)) <= 1
      |         AND levenshtein(a.p_name, b.p_name) <= 1)
      |SELECT * FROM (SELECT * FROM pp UNION SELECT * FROM ps)
      |ORDER BY p_brand, id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- linear gap interpolation
  /** Time-series gap fill by LINEAR interpolation: per user, daily
    * value sums over a complete date spine; interior missing days get
    * prev + (next - prev) * elapsed/gap, leading/trailing gaps stay
    * null (no extrapolation). Prev/next observation and their dates
    * come from ignore-nulls last/first over ordered windows — one
    * hash exchange on user, no self-join per gap. The arithmetic is
    * the same expression tree in both engines (exact 2-dec deltas,
    * one division, one multiply, one add), so the doubles hash-match
    * bit-for-bit. The resample/interpolate stage of any sensor or
    * metrics pipeline (the reference's weather gap handling is the
    * carry-forward special case). */
  val q109Interpolate: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d).filter(col("user_id") < 5)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(graft.core.Num.dsum2(col("value")).as("v"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val wPrev = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pd",
        last(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nd",
        first(when(col("v").isNotNull, col("day")), ignoreNulls = true).over(wNext))
      .withColumn("v_interp",
        when(col("v").isNotNull, col("v"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * (datediff(col("day"), col("pd")).cast("double")
              / datediff(col("nd"), col("pd")).cast("double"))))
      .withColumn("filled",
        when(col("v").isNull && col("v_interp").isNotNull, "Y").otherwise("N"))
      .select("user_id", "day", "v", "v_interp", "filled")
      .orderBy("user_id", "day")
  }

  private val q109Sql =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      |  FROM events WHERE user_id < 5 GROUP BY 1, 2),
      |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
      |         FROM daily GROUP BY 1),
      |spine AS (SELECT user_id,
      |                 CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |          FROM span),
      |j AS (SELECT s.user_id, s.day, d.v
      |      FROM spine s LEFT JOIN daily d USING (user_id, day)),
      |w AS (SELECT *,
      |  last_value(v IGNORE NULLS) OVER pw AS pv,
      |  last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER pw AS pd,
      |  first_value(v IGNORE NULLS) OVER nw AS nv,
      |  first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER nw AS nd
      |  FROM j
      |  WINDOW pw AS (PARTITION BY user_id ORDER BY day
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         nw AS (PARTITION BY user_id ORDER BY day
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT user_id, day, v,
      |       CASE WHEN v IS NOT NULL THEN v
      |            ELSE pv + (nv - pv)
      |                 * (CAST(datediff('day', pd, day) AS DOUBLE)
      |                    / CAST(datediff('day', pd, nd) AS DOUBLE)) END AS v_interp,
      |       CASE WHEN v IS NULL AND (pv + (nv - pv)
      |                 * (CAST(datediff('day', pd, day) AS DOUBLE)
      |                    / CAST(datediff('day', pd, nd) AS DOUBLE))) IS NOT NULL
      |            THEN 'Y' ELSE 'N' END AS filled
      |FROM w ORDER BY user_id, day""".stripMargin

  // ---------------------------------------------------------------- domain authority (PageRank)
  /** Domain-authority ranking — the quality prior web-corpus
    * pipelines compute over the host link graph (CommonCrawl ranks
    * hosts by centrality; curation weights documents by it). Two
    * Jacobi iterations of PageRank over a deterministic synthetic
    * host graph (source -> 'src'||(doc_id^2 mod 16) — the quadratic
    * map concentrates in-links on the 4 residue hubs, a real
    * authority hierarchy; self-loops dropped, distinct; computed as
    * ((id%16)*(id%16))%16, the modular identity — a direct id*id
    * overflows int64 once ids carry a corpus-partition prefix, the
    * sf1 sweep's catch): every update is EXACT int64 arithmetic — rank mass
    * scaled to 1e12, damping 0.85 as (*17 div 20), teleport 0.15 as
    * (3e12 div (20n)) — so both engines agree bit-for-bit after any
    * number of iterations (float PageRank diverges in the last ulp
    * by iteration two). Dangling-node mass leaks (simplified PR) —
    * identically in both engines. Each iteration is one join +
    * partial-agg shuffle on dst; at web scale the edge list is
    * hash-partitioned once and rank vectors alone move per round —
    * the ConnectedComponents superstep discipline. */
  val q135PageRank: Q = (s, d) => {
    val SCALE = 1000000000000L
    val docs = Tables.documents(s, d)
    val dst = concat(lit("src"),
      (((col("doc_id") % 16) * (col("doc_id") % 16)) % 16).cast("string"))
    val edges = docs.select(col("source").as("src"), dst.as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()
    val nDf = nodes.agg(count(lit(1)).as("n"))
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val r0 = nodes.crossJoin(broadcast(nDf))
      .select(col("node"), expr(s"$SCALE div n").as("r"))
    def step(r: DataFrame): DataFrame = {
      val inflow = edges.join(r, edges("src") === r("node"))
        .join(outdeg, "src")
        .select(col("dst"), expr("(r * 17) div (20 * deg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      nodes.crossJoin(broadcast(nDf))
        .join(inflow, nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          (expr(s"(3 * $SCALE) div (20 * n)") +
            coalesce(col("inflow"), lit(0L))).as("r"))
    }
    val r2 = step(step(r0))
    // Final global rank via DistributedRank (range-partitioned sort +
    // broadcast offsets), not Window.orderBy — a no-partition window
    // funnels every host row through one task. Host cardinality is
    // corpus-sublinear, but the last step should honor the same
    // superstep discipline as the iterations.
    DistributedRank.rank(r2, Seq.empty, Seq(col("r").desc, col("node")), "rank")
      .select(col("node"), col("r").as("pr_scaled"),
        col("rank").cast("int").as("rank"))
      .orderBy("rank")
  }

  private val q135Sql =
    """WITH e AS (SELECT DISTINCT source AS src,
      |                  'src' || CAST(((doc_id % 16) * (doc_id % 16)) % 16 AS VARCHAR) AS dst
      |           FROM documents
      |           WHERE source <> 'src' || CAST(((doc_id % 16) * (doc_id % 16)) % 16 AS VARCHAR)),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT COUNT(*) AS n FROM nodes),
      |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
      |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes, nn),
      |i1 AS (SELECT e.dst, CAST(SUM((r0.r * 17) // (20 * deg.deg)) AS BIGINT) AS s
      |       FROM e JOIN r0 ON r0.node = e.src JOIN deg USING (src)
      |       GROUP BY 1),
      |r1 AS (SELECT node, (3000000000000 // (20 * n)) + COALESCE(i1.s, 0) AS r
      |       FROM nodes CROSS JOIN nn LEFT JOIN i1 ON i1.dst = node),
      |i2 AS (SELECT e.dst, CAST(SUM((r1.r * 17) // (20 * deg.deg)) AS BIGINT) AS s
      |       FROM e JOIN r1 ON r1.node = e.src JOIN deg USING (src)
      |       GROUP BY 1),
      |r2 AS (SELECT node, (3000000000000 // (20 * n)) + COALESCE(i2.s, 0) AS r
      |       FROM nodes CROSS JOIN nn LEFT JOIN i2 ON i2.dst = node)
      |SELECT node, r AS pr_scaled,
      |       CAST(row_number() OVER (ORDER BY r DESC, node) AS INT) AS rank
      |FROM r2 ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- stratified split
  /** Stratified train/val/test split with EXACT per-stratum
    * fractions (80/10/10 per language) — the corpus-release split:
    * q102's global hash bucket only approximates fractions and can
    * starve a small stratum; here every language contributes
    * floor(n*0.8) to train and floor(n*0.9)-floor(n*0.8) to val by
    * construction. Rows are ranked inside their stratum by seeded
    * md5 (deterministic "random"), boundaries are pure integer math
    * ((n*8) div 10 — never n*0.8 in floating point). The per-stratum
    * rank is [[graft.ops.DistributedRank]] — range-repartition +
    * broadcast prefix offsets — NOT a `partitionBy(lang)` window,
    * because languages are few and hugely skewed: a window would push
    * every row of the dominant stratum through one task's sorter. Here
    * every task handles at most one range-partition slice regardless
    * of stratum skew. Output: per-doc assignment plus the rank, fully
    * replayable. */
  val q139StratifiedSplit: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .withColumn("__h", Dedup.h60(lit(13), col("doc_id").cast("string")))
    // stratum totals ride out of the rank's own count job — no second
    // groupBy pass over the corpus, no broadcast join
    DistributedRank.rank(docs, Seq("lang"), Seq(col("__h"), col("doc_id")), "rk",
        totalCol = "n")
      .withColumn("split",
        when(col("rk") <= expr("(n * 8) div 10"), "train")
          .when(col("rk") <= expr("(n * 9) div 10"), "val")
          .otherwise("test"))
      .select(col("doc_id"), col("lang"), col("rk").cast("int").as("rk"), col("split"))
      .orderBy("doc_id")
  }

  private val q139Sql =
    """WITH d AS (SELECT doc_id, lang,
      |                  ('0x' || substr(md5('13|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      |                    AS h
      |           FROM documents),
      |r AS (SELECT doc_id, lang,
      |             CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS INT)
      |               AS rk
      |      FROM d),
      |n AS (SELECT lang, COUNT(*) AS n FROM d GROUP BY 1)
      |SELECT doc_id, r.lang, rk,
      |       CASE WHEN rk <= (n * 8) // 10 THEN 'train'
      |            WHEN rk <= (n * 9) // 10 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM r JOIN n ON r.lang = n.lang
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- distributed rank functions
  /** ntile / percent_rank / cume_dist over a corpus-sized stratum —
    * the whole SQL rank-function family from ONE
    * [[graft.ops.DistributedRank.rank]] pass (totalCol carries the
    * stratum size out of the rank's own count job): the three
    * functions are pure per-row projections of the (row_number,
    * count) pair under a total order ([[DistributedRank.ntile]] and
    * friends). The plan contains NO Window operator — the scale-safe
    * replacement for `ntile(10) OVER (PARTITION BY lang ORDER BY
    * ...)` when a language holds tens of TB. Deciles here are the
    * standard quality-binning step before mix weighting (q103/q124
    * consume exactly such bins at corpus scale). */
  val q149RankFunctions: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    DistributedRank.rank(docs, Seq("lang"),
        Seq(col("n_chars").desc, col("doc_id")), "rk", totalCol = "n")
      .select(col("doc_id"), col("lang"), col("rk"),
        DistributedRank.ntile(col("rk"), col("n"), 10).as("decile"),
        DistributedRank.percentRank(col("rk"), col("n")).as("pct_rank"),
        DistributedRank.cumeDist(col("rk"), col("n")).as("cume"))
      .orderBy("doc_id")
  }

  private val q149Sql =
    """SELECT doc_id, lang,
      |       CAST(row_number() OVER w AS BIGINT) AS rk,
      |       CAST(ntile(10) OVER w AS BIGINT) AS decile,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume
      |FROM documents
      |WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- weighted sample (bottom-k)
  /** Weighted sampling WITHOUT replacement as a bottom-k sketch
    * (Cohen/Kaplan bottom-k estimation): each document holds w
    * integer tickets (w = its length-derived sampling weight), every
    * ticket draws a deterministic md5 key, the document's key is its
    * MINIMUM ticket key, and the sample is the k smallest document
    * keys. Equivalent to drawing documents ticket-by-ticket without
    * replacement — the pure-integer/lexicographic form of A-ES
    * exponential-race sampling, chosen over u^(1/w) because it needs
    * NO pow()/ln() whose last ulp the oracle's engine could round
    * differently: keys are md5 hex STRINGS, compared exactly.
    *
    * Scale shape: ticket explosion is a pure map bounded by max
    * weight (4x); per-doc min is one partial-agg; the k smallest
    * keys are TakeOrdered (per-partition top-k, k-sized merge on the
    * driver) — no global sort, no window, nothing corpus-sized on
    * one task. Replayable: the sample is a pure function of the
    * corpus, so a re-run (reference §5 rerun discipline) reproduces
    * it byte-for-byte. */
  val q152WeightedSample: Q = (s, d) => {
    val t = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("CAST(least(4, 1 + n_chars div 500) AS BIGINT)").as("w"))
    graft.ops.Sampling.weightedBottomK(t, col("doc_id"), col("w"), 25)
      .withColumnRenamed("id", "doc_id")
  }

  private val q152Sql =
    """WITH t AS (SELECT doc_id, CAST(least(4, 1 + n_chars // 500) AS BIGINT) AS w
      |           FROM documents),
      |k AS (SELECT doc_id, w, unnest(generate_series(1, w)) AS i FROM t),
      |m AS (SELECT doc_id, w,
      |             MIN(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))) AS key
      |      FROM k GROUP BY 1, 2)
      |SELECT doc_id, w, key FROM m ORDER BY key LIMIT 25""".stripMargin

  // ---------------------------------------------------------------- per-stratum k-sample
  /** Per-stratum fixed-k deterministic sample — "k docs from EVERY
    * language", the balanced-eval-set draw (contrast q152: k docs
    * total, weight-proportional; q139: fractional split). Seeded md5
    * order makes the draw uniform-at-random per stratum yet a pure
    * function of the corpus; the k-per-key selection runs on the
    * custom [[graft.plans.TopKPerKey]] physical operator — bounded
    * per-key heaps in partial AND final aggregation, so a stratum is
    * never sorted whole anywhere: the exchange carries at most k
    * rows per (partition, stratum). The third sampling shape, and
    * the third consumer of the no-corpus-sort discipline
    * (DistributedRank ranks, TakeOrdered global k, TopKPerKey
    * stratum k). */
  val q154GroupSample: Q = (s, d) => {
    val keyed = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        md5(concat(lit("21|"), col("doc_id").cast("string"))).as("r"))
    graft.plans.TopKPerKey.topK(keyed, Seq(col("lang")),
        Seq(col("r").asc, col("doc_id").asc), 7)
      .orderBy("lang", "doc_id")
  }

  private val q154Sql =
    """WITH s AS (SELECT doc_id, lang,
      |             md5('21|' || CAST(doc_id AS VARCHAR)) AS r
      |           FROM documents),
      |k AS (SELECT *, row_number() OVER (
      |        PARTITION BY lang ORDER BY r, doc_id) AS rn FROM s)
      |SELECT doc_id, lang, r FROM k WHERE rn <= 7
      |ORDER BY lang, doc_id""".stripMargin

  // ---------------------------------------------------------------- triangle counting
  /** Per-node triangles + local clustering coefficient over the q135
    * host graph ([[graft.ops.Graphs.triangleCounts]]) — the
    * link-graph structure signal (dense triangles = spam ring /
    * mirror farm; trees = crawl frontier) that complements CC
    * (components, q101) and PageRank (authority, q135). The
    * degree-orientation trick bounds the wedge join at m^(3/2)
    * total fan-out regardless of hub skew — see the op's scaladoc;
    * the oracle replays orientation, wedges and closures verbatim. */
  val q155Triangles: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val dst = concat(lit("src"),
      (((col("doc_id") % 16) * (col("doc_id") % 16)) % 16).cast("string"))
    val edges = docs.select(col("source").as("u"), dst.as("v"))
    graft.ops.Graphs.triangleCounts(edges).orderBy("node")
  }

  private val q155Sql =
    """WITH raw AS (SELECT source AS s,
      |                    'src' || CAST(((doc_id % 16) * (doc_id % 16)) % 16 AS VARCHAR) AS t
      |             FROM documents),
      |e0 AS (SELECT DISTINCT least(s, t) AS u, greatest(s, t) AS v
      |       FROM raw WHERE s <> t),
      |deg AS (SELECT node, COUNT(*) AS deg
      |        FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
      |        GROUP BY 1),
      |f AS (SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
      |                  THEN u ELSE v END AS a,
      |             CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
      |                  THEN v ELSE u END AS b,
      |             CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
      |                  THEN dv.deg ELSE du.deg END AS db
      |      FROM e0 JOIN deg du ON du.node = e0.u
      |              JOIN deg dv ON dv.node = e0.v),
      |t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |      FROM f e1
      |      JOIN f e2 ON e1.a = e2.a
      |              AND (e1.db < e2.db OR (e1.db = e2.db AND e1.b < e2.b))
      |      JOIN f e3 ON e3.a = e1.b AND e3.b = e2.b),
      |c AS (SELECT node, COUNT(*) AS n_tri
      |      FROM (SELECT x AS node FROM t UNION ALL SELECT y FROM t
      |            UNION ALL SELECT z FROM t)
      |      GROUP BY 1)
      |SELECT deg.node, deg.deg, COALESCE(c.n_tri, 0) AS n_tri,
      |       CASE WHEN deg.deg >= 2
      |            THEN (2.0 * COALESCE(c.n_tri, 0)) / (deg.deg * (deg.deg - 1))
      |            ELSE 0.0 END AS clustering
      |FROM deg LEFT JOIN c USING (node) ORDER BY node""".stripMargin

  // ---------------------------------------------------------------- k-core decomposition
  /** k-core decomposition ([[graft.ops.Graphs.kCorePeel]]) over a
    * deterministic 4-level host hierarchy (leaf pages -> mid hosts ->
    * aggregators -> a doubly-linked 11-hub ring): the onion-layer /
    * nucleus-vs-fringe signal that completes the link-graph kit
    * (CC q101, PageRank q135, triangles q155). Node ids are pure
    * residue functions of doc_id, so every level's degree profile is
    * scale-factor-stable and the peel cascades EXACTLY one level per
    * round (leaves at round 1, mids 2, aggregators 3; the hub ring
    * survives as the 3-core) — verified to fix-point by round 3 at
    * every SF; 5 fixed rounds leave two provably-idle rounds in both
    * engines. The oracle replays all five synchronous rounds as
    * generated chained CTEs — degrees over alive nodes (zero-degree
    * stragglers included), same-round mass removal. */
  val q161KCore: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    def lvl(mod: Int, pa: String, mult: Int, add: Int, mod2: Int, pb: String) =
      docs.select(
        concat(lit(pa), (col("doc_id") % mod).cast("string")).as("u"),
        concat(lit(pb),
          (((col("doc_id") % mod) * mult + add) % mod2).cast("string")).as("v"))
    val edges = lvl(211, "t", 13, 0, 53, "m")
      .unionByName(lvl(53, "m", 7, 0, 23, "n"))
      .unionByName(lvl(23, "n", 3, 0, 11, "h"))
      .unionByName(lvl(11, "h", 5, 2, 11, "h"))
      .unionByName(lvl(11, "h", 3, 1, 11, "h"))
    graft.ops.Graphs.kCorePeel(edges, k = 3, rounds = 5).orderBy("node")
  }

  private val q161Sql: String = {
    def lvlSql(mod: Int, pa: String, mult: Int, add: Int, mod2: Int, pb: String) =
      s"""SELECT '$pa' || CAST(doc_id % $mod AS VARCHAR) AS s,
         |       '$pb' || CAST(((doc_id % $mod) * $mult + $add) % $mod2 AS VARCHAR) AS t
         |FROM documents""".stripMargin
    val raw = Seq(lvlSql(211, "t", 13, 0, 53, "m"), lvlSql(53, "m", 7, 0, 23, "n"),
      lvlSql(23, "n", 3, 0, 11, "h"), lvlSql(11, "h", 5, 2, 11, "h"),
      lvlSql(11, "h", 3, 1, 11, "h")).mkString("\nUNION ALL\n")
    val rounds = (1 to 5).map { r =>
      val p = r - 1
      // MATERIALIZED: each round references the previous round's CTEs
      // several times; inlining would re-expand the whole peel chain
      // 3^rounds times (the SQL twin of the plan blow-up the Scala op
      // leaf-caches away)
      s"""dg$r AS MATERIALIZED (SELECT a.node, COALESCE(c.deg, 0) AS deg
         |  FROM alive$p a LEFT JOIN (
         |    SELECT node, COUNT(*) AS deg
         |    FROM (SELECT u AS node FROM e$p UNION ALL SELECT v FROM e$p)
         |    GROUP BY 1) c USING (node)),
         |b$r AS MATERIALIZED (SELECT node FROM dg$r WHERE deg < 3),
         |alive$r AS MATERIALIZED (SELECT node FROM alive$p
         |  WHERE node NOT IN (SELECT node FROM b$r)),
         |e$r AS MATERIALIZED (SELECT u, v FROM e$p
         |  WHERE u IN (SELECT node FROM alive$r)
         |    AND v IN (SELECT node FROM alive$r))""".stripMargin
    }.mkString(",\n")
    val peeledUnion = (1 to 5)
      .map(r => s"SELECT node, $r AS peel_round FROM b$r").mkString("\nUNION ALL\n")
    s"""WITH raw AS (
       |$raw),
       |e0 AS MATERIALIZED (SELECT DISTINCT least(s, t) AS u, greatest(s, t) AS v
       |       FROM raw WHERE s <> t),
       |alive0 AS MATERIALIZED (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
       |$rounds,
       |peeled AS (
       |$peeledUnion),
       |cd AS (SELECT node, COUNT(*) AS core_deg
       |       FROM (SELECT u AS node FROM e5 UNION ALL SELECT v FROM e5)
       |       GROUP BY 1)
       |SELECT a.node,
       |       CASE WHEN p.peel_round IS NULL THEN 'core' ELSE 'peeled' END AS status,
       |       CAST(p.peel_round AS INT) AS peel_round,
       |       CAST(cd.core_deg AS BIGINT) AS core_deg
       |FROM alive0 a LEFT JOIN peeled p USING (node) LEFT JOIN cd USING (node)
       |ORDER BY a.node""".stripMargin
  }

  // ---------------------------------------------------------------- MAD outlier gate
  /** Robust outlier gate: per-language EXACT median and MAD (median
    * absolute deviation) of document length, outliers = dev > 3*MAD
    * — the robust-statistics data-quality screen (mean/stddev gates
    * break on the long tail they are supposed to catch; median/MAD
    * don't). Both medians are EXACT integer order statistics
    * (lower-median rank (n+1) div 2, ties broken by doc_id) via TWO
    * [[graft.ops.DistributedRank]] passes — selection by rank, not a
    * sort-and-pick: no Window, no stratum through one task, and the
    * per-lang medians broadcast back as lang-count rows. Contrast
    * q150: HDR gives mergeable APPROXIMATE quantiles for rollups;
    * this is the exact form a release gate wants.
    *
    * Scan-count note: two ranks re-evaluate their inputs per the
    * range-partition cost note in [[DistributedRank.rank]] (~4
    * column-pruned scans end to end). `materializeInput` is
    * deliberately NOT used: the upstream here is a bare 3-column
    * parquet scan, and re-scanning a pruned leaf beats transiently
    * pinning corpus-sized checkpoint blocks — materializeInput is
    * for EXPENSIVE lineages (iterative k-means, multi-join graphs),
    * which this is not. */
  val q158MadOutliers: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val r1 = DistributedRank.rank(docs, Seq("lang"),
      Seq(col("n_chars"), col("doc_id")), "rk", totalCol = "n")
    val med = r1.filter(col("rk") === expr("(n + 1) div 2"))
      .select(col("lang"), col("n_chars").as("med"), col("n"))
    val dev = docs.join(broadcast(med), "lang")
      .withColumn("dev", abs(col("n_chars") - col("med")))
    val r2 = DistributedRank.rank(dev, Seq("lang"),
      Seq(col("dev"), col("doc_id")), "rk2")
    val mad = r2.filter(col("rk2") === expr("(n + 1) div 2"))
      .select(col("lang"), col("dev").as("mad"))
    dev.join(broadcast(mad), "lang")
      .groupBy("lang")
      .agg(max("n").as("n"), max("med").as("med"), max("mad").as("mad"),
        sum(when(col("dev") > lit(3) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("lang")
  }

  private val q158Sql =
    """WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
      |r1 AS (SELECT *, row_number() OVER (PARTITION BY lang
      |                                    ORDER BY n_chars, doc_id) AS rk,
      |              COUNT(*) OVER (PARTITION BY lang) AS n
      |       FROM d),
      |med AS (SELECT lang, n_chars AS med, n FROM r1 WHERE rk = (n + 1) // 2),
      |dev AS (SELECT d.doc_id, d.lang, med.med, med.n,
      |               abs(d.n_chars - med.med) AS dev
      |        FROM d JOIN med USING (lang)),
      |r2 AS (SELECT *, row_number() OVER (PARTITION BY lang
      |                                    ORDER BY dev, doc_id) AS rk2
      |       FROM dev),
      |mad AS (SELECT lang, dev AS mad FROM r2 WHERE rk2 = (n + 1) // 2)
      |SELECT dev.lang, CAST(MAX(dev.n) AS BIGINT) AS n,
      |       CAST(MAX(dev.med) AS BIGINT) AS med,
      |       CAST(MAX(mad.mad) AS BIGINT) AS mad,
      |       CAST(SUM(CASE WHEN dev.dev > 3 * mad.mad THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_outliers
      |FROM dev JOIN mad USING (lang) GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- k-anonymity gate
  /** k-anonymity release gate with one generalization step — the
    * privacy check a pipeline runs before shipping user-adjacent
    * metadata alongside training text (the structured-data sibling of
    * the q122 PII scrub): every quasi-identifier group
    * (nation, segment) must contain ≥ k members or a row in it is
    * re-identifiable. Groups that fail level 0 are GENERALIZED — the
    * segment coarsens to '*' and the failing members re-pool per
    * nation (the first rung of the Samarati generalization ladder);
    * a pooled group that STILL fails is marked 'S': suppress before
    * release. Scale shape: one groupBy with map-side combine over the
    * data; the generalization and verdicts run on the GROUP frame
    * (|QI-value combinations| rows, corpus-independent) — no second
    * data pass, no window. Deterministic: counts and thresholds only.
    * k = 10. */
  val q169KAnonymity: Q = (s, d) => {
    val k = 10
    val g1 = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("group_size"))
    val pass = g1.filter(col("group_size") >= k)
      .withColumn("level", lit(0))
    val gen = g1.filter(col("group_size") < k)
      .groupBy("nation")
      .agg(sum("group_size").as("group_size"))
      .withColumn("segment", lit("*"))
      .withColumn("level", lit(1))
    pass.unionByName(gen)
      .select(col("nation"), col("segment"),
        col("group_size"), col("level").cast("int").as("level"),
        when(col("group_size") >= k, lit("Y")).otherwise(lit("S")).as("status"))
      .orderBy("nation", "segment")
  }

  private val q169Sql =
    """WITH g1 AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |                   c_mktsegment AS segment,
      |                   CAST(COUNT(*) AS BIGINT) AS group_size
      |            FROM customer GROUP BY 1, 2),
      |pass AS (SELECT nation, segment, group_size, 0 AS level
      |         FROM g1 WHERE group_size >= 10),
      |gen AS (SELECT nation, '*' AS segment,
      |               CAST(SUM(group_size) AS BIGINT) AS group_size, 1 AS level
      |        FROM g1 WHERE group_size < 10 GROUP BY 1),
      |u AS (SELECT * FROM pass UNION ALL SELECT * FROM gen)
      |SELECT nation, segment, group_size, CAST(level AS INT) AS level,
      |       CASE WHEN group_size >= 10 THEN 'Y' ELSE 'S' END AS status
      |FROM u ORDER BY nation, segment""".stripMargin

  // ---------------------------------------------------------------- importance resampling
  /** DSIR-style importance resampling — data selection that tilts a
    * raw corpus toward a target domain (Xie et al. 2023: importance
    * weights from hashed n-gram LMs; here the deterministic unigram
    * form): per token, the target/raw probability ratio
    * p_tgt(t)/p_raw(t) is computed CROSS-MULTIPLIED and floor-
    * quantized to integer micros (c_tgt·N_raw and c_raw·N_tgt are
    * exact int64 products; ONE IEEE division + floor per token), a
    * document's score is the count-weighted integer sum of its
    * tokens' ratio micros (the arithmetic-mean-of-ratios twin of
    * DSIR's log-likelihood-ratio sum — same ordering intent, no ln
    * to hash-diverge), and the kept set is the global top ceil(20%)
    * by (score, doc_id) via [[graft.ops.DistributedRank]] — range
    * shuffle + broadcast offsets, never a no-partition window.
    * Target here: sources src0/src1 (the curated-reference stand-in).
    * Scoring lives in [[graft.ops.text.Dsir.scoreMicros]] (ratio
    * table broadcast, corpus tokens join map-side); see its doc for
    * the int64-overflow note at trillion-token slices. */
  val q170ImportanceResample: Q = (s, d) => {
    val scored = graft.ops.text.Dsir.scoreMicros(Tables.documents(s, d),
      "doc_id", "text", col("source").isin("src0", "src1"))
    graft.ops.DistributedRank.rank(scored, Seq.empty,
        Seq(col("score_micros").desc, col("doc_id")), "rk", totalCol = "n_total")
      .filter(col("rk") <= expr("(n_total + 4) div 5"))
      .select(col("doc_id"), col("score_micros"),
        col("rk").cast("int").as("rk"))
      .orderBy("rk")
  }

  private val q170Sql =
    """WITH tok AS (SELECT doc_id, source,
      |                    unnest(string_split_regex(text, '\s+')) AS t
      |             FROM documents),
      |pt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c_raw,
      |              CAST(SUM(CASE WHEN source IN ('src0','src1')
      |                            THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
      |       FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
      |               CAST(SUM(c_tgt) AS BIGINT) AS n_tgt FROM pt),
      |ratio AS (SELECT t,
      |                 CAST(floor(CAST(c_tgt * n_raw AS DOUBLE)
      |                   / CAST(c_raw * n_tgt AS DOUBLE) * 1000000.0) AS BIGINT)
      |                   AS r_micros
      |          FROM pt CROSS JOIN tot),
      |sc AS (SELECT doc_id, CAST(SUM(r_micros) AS BIGINT) AS score_micros
      |       FROM tok JOIN ratio USING (t) GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_total FROM sc),
      |r AS (SELECT doc_id, score_micros,
      |             CAST(row_number() OVER (ORDER BY score_micros DESC, doc_id)
      |               AS INT) AS rk
      |      FROM sc)
      |SELECT doc_id, score_micros, rk FROM r
      |WHERE rk <= (SELECT (n_total + 4) // 5 FROM n) ORDER BY rk""".stripMargin

  // ---------------------------------------------------------------- personalized pagerank
  /** Personalized (topic-sensitive) PageRank — authority measured
    * FROM trusted seeds rather than uniformly (Haveliwala 2002; the
    * TrustRank-style prior a curation pipeline uses to damp spam
    * domains that plain PageRank rewards for raw in-degree): the
    * teleport term concentrates on the seed set {src0, src1} instead
    * of 1/n everywhere, so mass reaches a node only through paths
    * from the seeds. Same int64-exact Jacobi machinery as q135 —
    * r0 = SCALE div |S| on seeds else 0, two iterations of
    * r' = [v∈S]·(3·SCALE) div (20·|S|) + Σ inflow·17 div (20·deg) —
    * one join + partial-agg exchange per round, final global rank via
    * [[graft.ops.DistributedRank]]. Nodes unreachable from the seeds
    * in two hops hold EXACTLY 0 — the damping evidence the oracle
    * pins. */
  val q173PersonalizedPagerank: Q = (s, d) => {
    val SCALE = 1000000000000L
    val seeds = Seq("src0", "src1")
    val docs = Tables.documents(s, d)
    val dst = concat(lit("src"),
      (((col("doc_id") % 16) * (col("doc_id") % 16)) % 16).cast("string"))
    val edges = docs.select(col("source").as("src"), dst.as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node"))).distinct()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val isSeed = col("node").isin(seeds: _*)
    val nS = seeds.length
    val r0 = nodes.select(col("node"),
      when(isSeed, lit(SCALE / nS)).otherwise(lit(0L)).as("r"))
    def step(r: DataFrame): DataFrame = {
      val inflow = edges.join(r, edges("src") === r("node"))
        .join(outdeg, "src")
        .select(col("dst"), expr("(r * 17) div (20 * deg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("inflow"))
      nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          (when(isSeed, lit(3L * SCALE / (20L * nS))).otherwise(lit(0L)) +
            coalesce(col("inflow"), lit(0L))).as("r"))
    }
    val r2 = step(step(r0))
    DistributedRank.rank(r2, Seq.empty, Seq(col("r").desc, col("node")), "rank")
      .select(col("node"), col("r").as("ppr_scaled"),
        when(isSeed, lit("Y")).otherwise(lit("N")).as("is_seed"),
        col("rank").cast("int").as("rank"))
      .orderBy("rank")
  }

  private val q173Sql =
    """WITH e AS (SELECT DISTINCT source AS src,
      |                  'src' || CAST(((doc_id % 16) * (doc_id % 16)) % 16 AS VARCHAR) AS dst
      |           FROM documents
      |           WHERE source <> 'src' || CAST(((doc_id % 16) * (doc_id % 16)) % 16 AS VARCHAR)),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
      |r0 AS (SELECT node, CASE WHEN node IN ('src0','src1')
      |                         THEN 1000000000000 // 2 ELSE 0 END AS r
      |       FROM nodes),
      |i1 AS (SELECT e.dst, CAST(SUM((r0.r * 17) // (20 * deg.deg)) AS BIGINT) AS s
      |       FROM e JOIN r0 ON r0.node = e.src JOIN deg USING (src)
      |       GROUP BY 1),
      |r1 AS (SELECT node, CASE WHEN node IN ('src0','src1')
      |                         THEN 3000000000000 // 40 ELSE 0 END
      |              + COALESCE(i1.s, 0) AS r
      |       FROM nodes LEFT JOIN i1 ON i1.dst = node),
      |i2 AS (SELECT e.dst, CAST(SUM((r1.r * 17) // (20 * deg.deg)) AS BIGINT) AS s
      |       FROM e JOIN r1 ON r1.node = e.src JOIN deg USING (src)
      |       GROUP BY 1),
      |r2 AS (SELECT node, CASE WHEN node IN ('src0','src1')
      |                         THEN 3000000000000 // 40 ELSE 0 END
      |              + COALESCE(i2.s, 0) AS r
      |       FROM nodes LEFT JOIN i2 ON i2.dst = node)
      |SELECT node, r AS ppr_scaled,
      |       CASE WHEN node IN ('src0','src1') THEN 'Y' ELSE 'N' END AS is_seed,
      |       CAST(row_number() OVER (ORDER BY r DESC, node) AS INT) AS rank
      |FROM r2 ORDER BY rank""".stripMargin

  // ---------------------------------------------------------------- l-diversity
  /** l-diversity audit — the homogeneity-attack check k-anonymity
    * (q169) misses: a group can hold ≥ k members yet leak the
    * sensitive attribute anyway if they all SHARE it (k-anonymous,
    * zero-diverse). Per quasi-identifier group (nation, segment):
    * distinct sensitive values (account-balance sign: the
    * negative / low / high tri-bucket), the dominant value's share
    * in exact integer micros (the re-identification confidence an
    * attacker gains), and the verdict n_sensitive ≥ l (l = 2).
    * Shapes: ONE groupBy over the data at (QI, sensitive) grain —
    * corpus-sized with map-side combine; the group-level rollup and
    * verdicts run on the |QI×sensitive| frame (corpus-independent).
    * max-share via max(struct) inside the aggregate — no window. */
  val q174LDiversity: Q = (s, d) => {
    val l = 2
    val sens = when(col("c_acctbal") < 0, lit("NEG"))
      .when(col("c_acctbal") < 5000, lit("LOW")).otherwise(lit("HIGH"))
    val fine = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("segment"), sens.as("sv"))
      .agg(count(lit(1)).as("cnt"))
    fine.groupBy("nation", "segment")
      .agg(sum("cnt").as("group_size"),
        count(lit(1)).as("n_sensitive"),
        max("cnt").as("max_cnt"))
      .select(col("nation"), col("segment"), col("group_size"),
        col("n_sensitive"),
        expr("(max_cnt * 1000000) div group_size").as("top_share_micros"),
        when(col("n_sensitive") >= l, lit("Y")).otherwise(lit("N"))
          .as("diverse"))
      .orderBy("nation", "segment")
  }

  private val q174Sql =
    """WITH f AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |                  c_mktsegment AS segment,
      |                  CASE WHEN c_acctbal < 0 THEN 'NEG'
      |                       WHEN c_acctbal < 5000 THEN 'LOW'
      |                       ELSE 'HIGH' END AS sv,
      |                  CAST(COUNT(*) AS BIGINT) AS cnt
      |           FROM customer GROUP BY 1, 2, 3)
      |SELECT nation, segment,
      |       CAST(SUM(cnt) AS BIGINT) AS group_size,
      |       CAST(COUNT(*) AS BIGINT) AS n_sensitive,
      |       CAST((MAX(cnt) * 1000000) // SUM(cnt) AS BIGINT) AS top_share_micros,
      |       CASE WHEN COUNT(*) >= 2 THEN 'Y' ELSE 'N' END AS diverse
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- mixing schedule
  /** Source-mixing epoch schedule — the step after q124's mix
    * weights that every pretraining run actually executes: given
    * per-source token inventories and the temperature-smoothed
    * target mix (same α=0.5 sqrt weighting, same quantize-then-
    * normalize discipline as q124), allocate a 1M-token budget and
    * convert each source's allocation into EPOCHS over its
    * inventory — epochs_micros = alloc·1e6 div n_tokens, with the
    * oversampled flag (> 1 epoch = the source repeats; the
    * repetition-harm literature's watch metric) and the residual
    * under/over-shoot of integer allocation. All integer once past
    * the one sqrt (IEEE-exact, q124's argument); group frame is
    * sources-sized, corpus pass is ONE token-count aggregation. */
  val q176MixSchedule: Q = (s, d) => {
    val budget = 1000000L
    val counts = Tables.documents(s, d)
      .groupBy("source")
      .agg(sum(TextOps.nWsTokens(col("text")).cast("long")).cast("long").as("n_tokens"))
    val tot = counts.agg(sum(col("n_tokens")).cast("long").as("n_total"))
    val w = counts.crossJoin(broadcast(tot))
      .withColumn("wq",
        floor(sqrt(col("n_tokens").cast("double") / col("n_total")) * 1e12 + 0.5)
          .cast("long"))
    val denom = w.agg(sum(col("wq")).cast("long").as("wq_sum"))
    w.crossJoin(broadcast(denom))
      .withColumn("alloc_tokens",
        floor(col("wq").cast("double") / col("wq_sum") * budget + 0.5).cast("long"))
      .withColumn("epochs_micros",
        expr("(alloc_tokens * 1000000) div n_tokens"))
      .select(col("source"), col("n_tokens"), col("alloc_tokens"),
        col("epochs_micros"),
        when(col("epochs_micros") > 1000000L, lit("Y")).otherwise(lit("N"))
          .as("oversampled"),
        (col("alloc_tokens") - expr("(alloc_tokens div n_tokens) * n_tokens"))
          .as("partial_epoch_tokens"))
      .orderBy("source")
  }

  private val q176Sql =
    """WITH c AS (SELECT source,
      |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_total FROM c),
      |w AS (SELECT source, n_tokens,
      |             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE) / n_total) * 1e12 + 0.5)
      |                  AS BIGINT) AS wq
      |      FROM c, t),
      |dn AS (SELECT CAST(SUM(wq) AS BIGINT) AS wq_sum FROM w),
      |a AS (SELECT source, n_tokens,
      |             CAST(floor(CAST(wq AS DOUBLE) / wq_sum * 1000000.0 + 0.5) AS BIGINT)
      |               AS alloc_tokens
      |      FROM w, dn)
      |SELECT source, n_tokens, alloc_tokens,
      |       CAST((alloc_tokens * 1000000) // n_tokens AS BIGINT) AS epochs_micros,
      |       CASE WHEN (alloc_tokens * 1000000) // n_tokens > 1000000
      |            THEN 'Y' ELSE 'N' END AS oversampled,
      |       CAST(alloc_tokens - (alloc_tokens // n_tokens) * n_tokens AS BIGINT)
      |         AS partial_epoch_tokens
      |FROM a ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- quality-representative dedup
  /** Near-dup cluster canonicalization by QUALITY, not by id — the
    * production refinement of q101/q132's keep=min-id rule: inside
    * every duplicate cluster the retained document should be the
    * best-written copy (a re-crawl often captures a cleaner render
    * of the same page), so the representative is
    * argmax(quality, tiebreak min doc_id) via one min_by(struct)
    * aggregate over the component frame — no window, and the
    * component frame is corpus-sublinear (only clustered docs).
    * Clusters come from the same LSH→jaccard→CC machinery as q101
    * (scoped caches, localized labels). Output per cluster: the
    * representative, its quality, and how many copies it displaced. */
  val q178RepresentativeDedup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val recrawl = docs.unionByName(
      docs.filter(col("doc_id") < 50).withColumn("doc_id", col("doc_id") + 1000000))
    val sig = Dedup.minHashText(recrawl, "doc_id", "text", 3, 16)
    val cand = Dedup.candidatePairs(
      Dedup.lshBands(sig, "doc_id", n = 16, rowsPerBand = 4), "doc_id")
    val edges = Dedup.jaccardTextScoped(cand, recrawl, "doc_id", "text", 3) { j =>
      graft.ops.Materialize.localize(
        j.filter(col("jaccard") >= 0.7).select("id_a", "id_b"))
    }
    val comp = ConnectedComponents.minLabelLocalized(edges)
    val qual = recrawl.select(col("doc_id"),
      TextOps.qualityScore(col("text"),
        graft.pipeline.CorpusCurationJob.Stopwords).as("quality"))
    comp.join(qual, comp("id") === qual("doc_id"))
      .groupBy("component")
      .agg(count(lit(1)).as("cluster_size"),
        expr("min_by(doc_id, struct(-quality, doc_id))").as("rep_doc_id"),
        max(col("quality")).as("rep_quality"))
      .withColumn("n_dropped", col("cluster_size") - 1)
      .orderBy("component")
  }

  private val q178Sql =
    s"""WITH RECURSIVE dup AS (
       |  SELECT * FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
       |  FROM documents WHERE doc_id < 50),
       |tok AS (SELECT doc_id,
       |       unnest(string_split_regex(text, '\\s+')) AS tok,
       |       generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
       |     FROM dup),
       |sh0 AS (SELECT doc_id,
       |        lag(tok, 2) OVER dw || ' ' || lag(tok, 1) OVER dw || ' ' || tok AS w
       |        FROM tok WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
       |w AS (SELECT DISTINCT doc_id, w FROM sh0 WHERE w IS NOT NULL),
       |sig AS (SELECT doc_id, s.seed,
       |               MIN(${mhSqlLocal("s.seed", "w")}) AS mh
       |        FROM w, (SELECT unnest(range(16)) AS seed) s GROUP BY 1, 2),
       |b AS (SELECT doc_id, seed // 4 AS band,
       |             md5(string_agg(CAST(mh AS VARCHAR), ':' ORDER BY seed)) AS band_key
       |      FROM sig GROUP BY doc_id, seed // 4),
       |bsz AS (SELECT band, band_key FROM b
       |        GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 64),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |         FROM b a JOIN b b2 USING (band, band_key)
       |         JOIN bsz USING (band, band_key)
       |         WHERE a.doc_id < b2.doc_id),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM w GROUP BY 1),
       |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
       |          FROM cand c
       |          JOIN w wa ON wa.doc_id = c.id_a
       |          JOIN w wb ON wb.doc_id = c.id_b AND wb.w = wa.w
       |          GROUP BY 1, 2),
       |edges AS (SELECT c.id_a, c.id_b
       |          FROM cand c
       |          LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |          JOIN cnt ca ON ca.doc_id = c.id_a
       |          JOIN cnt cb ON cb.doc_id = c.id_b
       |          WHERE CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
       |                / (ca.n + cb.n - COALESCE(i.n_inter, 0)) >= 0.7),
       |eu AS (SELECT id_a AS u, id_b AS wv FROM edges
       |       UNION SELECT id_b, id_a FROM edges),
       |reach(id, r) AS (
       |  SELECT u, u FROM eu
       |  UNION
       |  SELECT eu.u, reach.r FROM eu JOIN reach ON reach.id = eu.wv),
       |cmp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY 1),
       |q AS (SELECT doc_id,
       |             least(length(text), 400)::DOUBLE / 400 * 0.5
       |             + CAST(len(list_filter(string_split_regex(text, '\\s+'),
       |                                    x -> x = 'the' OR x = 'a')) AS DOUBLE)
       |               / len(string_split_regex(text, '\\s+')) * 0.5 AS quality
       |      FROM dup),
       |j AS (SELECT cmp.component, cmp.id AS doc_id, q.quality
       |      FROM cmp JOIN q ON q.doc_id = cmp.id),
       |r AS (SELECT component, doc_id, quality,
       |             row_number() OVER (PARTITION BY component
       |               ORDER BY quality DESC, doc_id) AS rn
       |      FROM j),
       |sz AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM j GROUP BY 1)
       |SELECT sz.component, sz.cluster_size,
       |       r.doc_id AS rep_doc_id, r.quality AS rep_quality,
       |       CAST(sz.cluster_size - 1 AS BIGINT) AS n_dropped
       |FROM sz JOIN r ON r.component = sz.component AND r.rn = 1
       |ORDER BY sz.component""".stripMargin

  // ---------------------------------------------------------------- boilerplate mining
  /** Site-template boilerplate mining — the domain-level counterpart
    * of q99's corpus-wide line dedup: a 3-gram that appears in ≥ 50%
    * of a domain's pages is template chrome (nav bars, footers,
    * cookie banners), not content, and a curation pipeline strips or
    * down-weights it per SITE, not globally (a phrase ubiquitous on
    * one site can be legitimate content elsewhere). Per (source,
    * shingle): document frequency within the domain (distinct grams
    * per doc via the same in-row shingleSet as the dedup family —
    * one partial-agg shuffle); domain verdicts in exact integer
    * micros; per-domain rollup + the worst offender via one
    * max(struct) — no window. */
  val q179BoilerplateMine: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val nDom = docs.groupBy("source").agg(count(lit(1)).as("n_dom"))
    // shingleSetDistinct: per-doc grams deduped IN-ROW (a doc repeating
    // its own template twice is still ONE occurrence for df purposes)
    val grams = Dedup.shingleSetDistinct(docs, "doc_id", "text", k = 3)
      .join(docs.select("doc_id", "source"), "doc_id")
    val dfDom = grams.groupBy("source", "w").agg(count(lit(1)).as("df_dom"))
      .join(broadcast(nDom), "source")
      .withColumn("share_micros", expr("(df_dom * 1000000) div n_dom"))
    dfDom.groupBy("source", "n_dom")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("share_micros") >= 500000, 1L).otherwise(0L))
          .as("n_boiler"),
        max(struct(col("share_micros"), col("df_dom"), col("w")))
          .as("__top"))
      .select(col("source"), col("n_dom"), col("n_shingles"), col("n_boiler"),
        col("__top.w").as("top_shingle"),
        col("__top.share_micros").as("top_share_micros"))
      .orderBy("source")
  }

  private val q179Sql =
    """WITH tok AS (SELECT doc_id,
      |       unnest(string_split_regex(text, '\s+')) AS tok,
      |       generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
      |     FROM documents),
      |sh0 AS (SELECT doc_id,
      |        lag(tok, 2) OVER dw || ' ' || lag(tok, 1) OVER dw || ' ' || tok AS w
      |        FROM tok WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
      |w AS (SELECT DISTINCT doc_id, w FROM sh0 WHERE w IS NOT NULL),
      |nd AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_dom
      |       FROM documents GROUP BY 1),
      |g AS (SELECT d.source, w.w, CAST(COUNT(*) AS BIGINT) AS df_dom
      |      FROM w JOIN documents d USING (doc_id) GROUP BY 1, 2),
      |sh AS (SELECT g.source, g.w, g.df_dom, nd.n_dom,
      |              CAST((g.df_dom * 1000000) // nd.n_dom AS BIGINT) AS share_micros
      |       FROM g JOIN nd USING (source))
      |SELECT source, n_dom,
      |       CAST(COUNT(*) AS BIGINT) AS n_shingles,
      |       CAST(SUM(CASE WHEN share_micros >= 500000 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_boiler,
      |       MAX({'sm': share_micros, 'df': df_dom, 'w': w}).w AS top_shingle,
      |       CAST(MAX({'sm': share_micros, 'df': df_dom, 'w': w}).sm AS BIGINT)
      |         AS top_share_micros
      |FROM sh GROUP BY 1, 2 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q193: LSH estimator calibration
  /** Measure, don't guess: how accurate is the n=16 MinHash Jaccard
    * ESTIMATE on the pairs the LSH stage actually surfaces? Per
    * candidate pair, the signature agreement n_match/16 is compared
    * against the exact shingle Jaccard; the absolute error lands in a
    * 2%-wide band via pure INT64 cross-multiplication
    * ((50·|n_match·U − 16·n_inter|) DIV (16·U), U = union size), and
    * the τ=0.7 gate decisions (est: n_match ≥ 12; exact:
    * 10·n_inter ≥ 7·U) are tallied for disagreement — the
    * false-accept/false-reject rate the signature width buys. No
    * doubles anywhere. Scale shape: the candidate list is localized
    * ONCE and feeds both the signature join-back and the exact
    * verifier (scoped cache release); everything downstream is
    * pair-table-sized. */
  val q193LshCalibration: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val sig = Dedup.minHashText(docs, "doc_id", "text", 3, 16)
    val cand = graft.ops.Materialize.localize(
      Dedup.candidatePairs(Dedup.lshBands(sig, "doc_id", 16, 4), "doc_id"))
    val sigA = sig.toDF(sig.columns.map(c => if (c == "doc_id") "id_a" else s"a_$c"): _*)
    val sigB = sig.toDF(sig.columns.map(c => if (c == "doc_id") "id_b" else s"b_$c"): _*)
    val matches = cand.join(sigA, "id_a").join(sigB, "id_b")
      .withColumn("n_match",
        (0 until 16).map(i =>
          (col(f"a_mh$i%02d") === col(f"b_mh$i%02d")).cast("long")).reduce(_ + _))
      .select("id_a", "id_b", "n_match")
    Dedup.jaccardTextScoped(cand, docs, "doc_id", "text", 3) { j =>
      val pairs = j
        .select(col("id_a"), col("id_b"), col("n_inter"),
          (col("n_a") + col("n_b") - col("n_inter")).as("u"))
        .join(matches, Seq("id_a", "id_b"))
        .withColumn("err_band",
          expr("(50 * abs(n_match * u - 16 * n_inter)) DIV (16 * u)"))
        .withColumn("est_pass", (col("n_match") >= 12).cast("long"))
        .withColumn("exact_pass", (col("n_inter") * 10 >= col("u") * 7).cast("long"))
      graft.ops.Materialize.localize(
        pairs.groupBy("err_band").agg(
          count(lit(1)).as("n_pairs"),
          sum("est_pass").cast("long").as("n_est_pass"),
          sum("exact_pass").cast("long").as("n_exact_pass"),
          sum(when(col("est_pass") =!= col("exact_pass"), 1L).otherwise(0L))
            .cast("long").as("n_disagree"))
        .orderBy("err_band"))
    }
  }

  private val q193Sql =
    s"""WITH tok AS (SELECT doc_id,
       |       unnest(string_split_regex(text, '\\s+')) AS tok,
       |       generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
       |     FROM documents),
       |sh0 AS (SELECT doc_id,
       |        lag(tok, 2) OVER dw || ' ' || lag(tok, 1) OVER dw || ' ' || tok AS w
       |        FROM tok WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
       |w AS (SELECT DISTINCT doc_id, w FROM sh0 WHERE w IS NOT NULL),
       |sig AS (SELECT doc_id, s.seed,
       |               MIN(${mhSqlLocal("s.seed", "w")}) AS mh
       |        FROM w, (SELECT unnest(range(16)) AS seed) s GROUP BY 1, 2),
       |b AS (SELECT doc_id, seed // 4 AS band,
       |             md5(string_agg(CAST(mh AS VARCHAR), ':' ORDER BY seed)) AS band_key
       |      FROM sig GROUP BY doc_id, seed // 4),
       |bsz AS (SELECT band, band_key FROM b
       |        GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 64),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |         FROM b a JOIN b b2 USING (band, band_key)
       |         JOIN bsz USING (band, band_key)
       |         WHERE a.doc_id < b2.doc_id),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM w GROUP BY 1),
       |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
       |          FROM cand c
       |          JOIN w wa ON wa.doc_id = c.id_a
       |          JOIN w wb ON wb.doc_id = c.id_b AND wb.w = wa.w
       |          GROUP BY 1, 2),
       |mm AS (SELECT c.id_a, c.id_b,
       |              CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
       |                AS n_match
       |       FROM cand c
       |       JOIN sig sa ON sa.doc_id = c.id_a
       |       JOIN sig sb ON sb.doc_id = c.id_b AND sb.seed = sa.seed
       |       GROUP BY 1, 2),
       |pp AS (SELECT m.id_a, m.id_b, m.n_match,
       |              CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS ni,
       |              CAST(ca.n + cb.n - COALESCE(i.n_inter, 0) AS BIGINT) AS u
       |       FROM mm m
       |       LEFT JOIN inter i ON i.id_a = m.id_a AND i.id_b = m.id_b
       |       JOIN cnt ca ON ca.doc_id = m.id_a
       |       JOIN cnt cb ON cb.doc_id = m.id_b),
       |e AS (SELECT *,
       |        CAST((50 * abs(n_match * u - 16 * ni)) // (16 * u) AS BIGINT)
       |          AS err_band,
       |        CASE WHEN n_match >= 12 THEN 1 ELSE 0 END AS est_pass,
       |        CASE WHEN ni * 10 >= u * 7 THEN 1 ELSE 0 END AS exact_pass
       |      FROM pp)
       |SELECT err_band, COUNT(*) AS n_pairs,
       |       CAST(SUM(est_pass) AS BIGINT) AS n_est_pass,
       |       CAST(SUM(exact_pass) AS BIGINT) AS n_exact_pass,
       |       CAST(SUM(CASE WHEN est_pass <> exact_pass THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_disagree
       |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q194: incremental CC maintenance
  /** Incremental duplicate-cluster maintenance
    * ([[graft.ops.dedup.ConnectedComponents.incremental]]): the base
    * corpus's boilerplate-prefix star edges produce standing labels;
    * the re-crawl's edges (every edge whose member is a re-crawl doc)
    * arrive as the INCREMENT and are folded in by contracting
    * standing components to their label nodes — CC runs over the
    * increment-sized contracted graph only, never the full edge
    * history. The result must equal full CC over the union graph:
    * the oracle replays the union groups in closed form (prefix
    * groups are disjoint → components ARE the ≥2-member groups,
    * anchored at their min doc). Re-crawl ids sit above 10⁶, so base
    * anchors never move — increment edges are exactly the
    * member-is-recrawl ones. */
  val q194IncrementalCc: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val recrawl = docs.unionByName(
      docs.filter(col("doc_id") < 50).withColumn("doc_id", col("doc_id") + 1000000))
    val grouped = recrawl.select(col("doc_id"),
        Dedup.h60(lit(0), substring(col("text"), 1, 40)).as("h"))
      .withColumn("anchor", min("doc_id").over(Window.partitionBy("h")))
      .withColumn("gsz", count(lit(1)).over(Window.partitionBy("h")))
    val edges = grouped
      .filter(col("gsz") >= 2 && col("doc_id") =!= col("anchor"))
      .select(col("anchor").as("id_a"), col("doc_id").as("id_b"))
    val baseEdges = edges.filter(col("id_b") <= 1000000L)
    val incEdges = edges.filter(col("id_b") > 1000000L)
    val labels = ConnectedComponents.minLabelLocalized(baseEdges)
    val updated = ConnectedComponents.incremental(labels, incEdges)
    val sizes = updated.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    updated.join(sizes, "component")
      .select(col("id").as("doc_id"), col("component"), col("cluster_size"))
      .orderBy("doc_id")
  }

  private val q194Sql =
    """WITH dup AS (
      |  SELECT * FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
      |  FROM documents WHERE doc_id < 50),
      |g AS (
      |  SELECT doc_id, md5('0|' || substr(text, 1, 40)) AS h FROM dup),
      |a AS (
      |  SELECT doc_id, h,
      |         MIN(doc_id) OVER (PARTITION BY h) AS component,
      |         COUNT(*) OVER (PARTITION BY h) AS cluster_size
      |  FROM g)
      |SELECT doc_id, component, CAST(cluster_size AS BIGINT) AS cluster_size
      |FROM a WHERE cluster_size >= 2 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q195: snapshot profile drift
  /** Column-profile drift between two corpus snapshots — the
    * data-contract check a pipeline runs before TRUSTING a new
    * delivery: profile both snapshots in one Expand pass each
    * ([[graft.ops.Profiler.profile]]), join per column, and flag (a)
    * non-null RATE drift by exact cross-multiplication
    * (nn_b·rows_a ≠ nn_a·rows_b — no rate doubles) and (b) min/max
    * boundary movement. The simulated next-day snapshot appends the
    * re-crawl AND nulls its `source` column — the silent
    * upstream-break shape (a feed drops a field) that row counts
    * alone never catch; q190's manifest says THAT something changed,
    * this says WHAT. Scale: two single-pass profiles + a
    * columns-sized join. */
  val q195ProfileDrift: Q = (s, d) => {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val a = Tables.documents(s, d)
    val b = a.unionByName(
      a.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 1000000)
        .withColumn("source", lit(null: String)))
    val pa = graft.ops.Profiler.profile(a, cols)
      .select(col("col_name"), col("n_rows").as("n_rows_a"),
        col("n_nonnull").as("nn_a"), col("n_distinct").as("nd_a"),
        col("min_value").as("mn_a"), col("max_value").as("mx_a"))
    val pb = graft.ops.Profiler.profile(b, cols)
      .select(col("col_name"), col("n_rows").as("n_rows_b"),
        col("n_nonnull").as("nn_b"), col("n_distinct").as("nd_b"),
        col("min_value").as("mn_b"), col("max_value").as("mx_b"))
    pa.join(pb, "col_name")
      .select(col("col_name"), col("n_rows_a"), col("n_rows_b"),
        col("nn_a"), col("nn_b"), col("nd_a"), col("nd_b"),
        when(col("nn_b") * col("n_rows_a") =!= col("nn_a") * col("n_rows_b"), "Y")
          .otherwise("N").as("nonnull_rate_drift"),
        when(col("mn_a") =!= col("mn_b") || col("mx_a") =!= col("mx_b"), "Y")
          .otherwise("N").as("bounds_moved"))
      .orderBy("col_name")
  }

  private val q195Sql = {
    def prof(src: String, suf: String) =
      Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows_$suf,
           |       COUNT($c) AS nn_$suf, COUNT(DISTINCT $c) AS nd_$suf,
           |       CAST(MIN($c) AS VARCHAR) AS mn_$suf,
           |       CAST(MAX($c) AS VARCHAR) AS mx_$suf FROM $src""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"""WITH b0 AS (
       |  SELECT * FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text, lang, NULL AS source, n_chars
       |  FROM documents WHERE doc_id < 50),
       |pa AS (${prof("documents", "a")}),
       |pb AS (${prof("b0", "b")})
       |SELECT col_name, n_rows_a, n_rows_b, nn_a, nn_b, nd_a, nd_b,
       |       CASE WHEN nn_b * n_rows_a <> nn_a * n_rows_b THEN 'Y' ELSE 'N' END
       |         AS nonnull_rate_drift,
       |       CASE WHEN mn_a <> mn_b OR mx_a <> mx_b THEN 'Y' ELSE 'N' END
       |         AS bounds_moved
       |FROM pa JOIN pb USING (col_name) ORDER BY col_name""".stripMargin
  }

  // ---------------------------------------------------------------- q197: cross-source duplication matrix
  /** Which sources copy from each other? The verified near-dup pairs
    * (the q42 chain: shingle→minhash→LSH→exact-Jaccard) joined back
    * to both endpoints' source fields and aggregated into an
    * unordered (source_lo, source_hi) matrix — the provenance
    * analytic behind licensing reviews ("is src3 scraping src7?")
    * and the shard-by-source decision q191 scores globally. Pure
    * composition of verified pieces: the pair table is
    * corpus-sublinear (localized, scoped cache release), the source
    * join-back is two id-keyed joins, the matrix is a tiny agg. */
  val q197SourceDupMatrix: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val cand = Dedup.candidatePairs(
      Dedup.lshBands(Dedup.minHashText(docs, "doc_id", "text", 3, 16),
        "doc_id", 16, 4),
      "doc_id")
    val pairs = Dedup.jaccardTextScoped(cand, docs, "doc_id", "text", 3) { j =>
      graft.ops.Materialize.localize(
        j.filter(col("jaccard") >= 0.7).select("id_a", "id_b"))
    }
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("source", "src_a"), "id_a")
      .join(src.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("source", "src_b"), "id_b")
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .groupBy("source_lo", "source_hi")
      .agg(count(lit(1)).as("n_dup_pairs"))
      .withColumn("cross_source",
        when(col("source_lo") =!= col("source_hi"), "Y").otherwise("N"))
      .orderBy("source_lo", "source_hi")
  }

  private val q197Sql =
    s"""WITH tok AS (SELECT doc_id,
       |       unnest(string_split_regex(text, '\\s+')) AS tok,
       |       generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
       |     FROM documents),
       |sh0 AS (SELECT doc_id,
       |        lag(tok, 2) OVER dw || ' ' || lag(tok, 1) OVER dw || ' ' || tok AS w
       |        FROM tok WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
       |w AS (SELECT DISTINCT doc_id, w FROM sh0 WHERE w IS NOT NULL),
       |sig AS (SELECT doc_id, s.seed,
       |               MIN(${mhSqlLocal("s.seed", "w")}) AS mh
       |        FROM w, (SELECT unnest(range(16)) AS seed) s GROUP BY 1, 2),
       |b AS (SELECT doc_id, seed // 4 AS band,
       |             md5(string_agg(CAST(mh AS VARCHAR), ':' ORDER BY seed)) AS band_key
       |      FROM sig GROUP BY doc_id, seed // 4),
       |bsz AS (SELECT band, band_key FROM b
       |        GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 64),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |         FROM b a JOIN b b2 USING (band, band_key)
       |         JOIN bsz USING (band, band_key)
       |         WHERE a.doc_id < b2.doc_id),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM w GROUP BY 1),
       |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
       |          FROM cand c
       |          JOIN w wa ON wa.doc_id = c.id_a
       |          JOIN w wb ON wb.doc_id = c.id_b AND wb.w = wa.w
       |          GROUP BY 1, 2),
       |verified AS (
       |  SELECT c.id_a, c.id_b
       |  FROM cand c
       |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |  JOIN cnt ca ON ca.doc_id = c.id_a
       |  JOIN cnt cb ON cb.doc_id = c.id_b
       |  WHERE CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
       |        / (ca.n + cb.n - COALESCE(i.n_inter, 0)) >= 0.7),
       |m AS (
       |  SELECT LEAST(da.source, db.source) AS source_lo,
       |         GREATEST(da.source, db.source) AS source_hi
       |  FROM verified v
       |  JOIN documents da ON da.doc_id = v.id_a
       |  JOIN documents db ON db.doc_id = v.id_b)
       |SELECT source_lo, source_hi, COUNT(*) AS n_dup_pairs,
       |       CASE WHEN source_lo <> source_hi THEN 'Y' ELSE 'N' END AS cross_source
       |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Map[String, Q] = Map(
    "q197_source_dup_matrix" -> q197SourceDupMatrix,
    "q195_profile_drift" -> q195ProfileDrift,
    "q194_incremental_cc" -> q194IncrementalCc,
    "q193_lsh_calibration" -> q193LshCalibration,
    "q178_representative_dedup" -> q178RepresentativeDedup,
    "q179_boilerplate_mine" -> q179BoilerplateMine,
    "q176_mix_schedule" -> q176MixSchedule,
    "q174_l_diversity" -> q174LDiversity,
    "q173_personalized_pagerank" -> q173PersonalizedPagerank,
    "q170_importance_resample" -> q170ImportanceResample,
    "q169_k_anonymity" -> q169KAnonymity,
    "q149_rank_functions" -> q149RankFunctions,
    "q155_triangles" -> q155Triangles,
    "q161_kcore" -> q161KCore,
    "q158_mad_outliers" -> q158MadOutliers,
    "q152_weighted_sample" -> q152WeightedSample,
    "q154_group_sample" -> q154GroupSample,
    "q139_stratified_split" -> q139StratifiedSplit,
    "q135_pagerank" -> q135PageRank,
    "q99_line_dedup" -> q99LineDedup,
    "q123_line_quality" -> q123LineQuality,
    "q124_temperature_mix" -> q124TemperatureMix,
    "q100_domain_cap" -> q100DomainCap,
    "q101_dup_clusters" -> q101DupClusters,
    "q102_hash_sample" -> q102HashSample,
    "q103_token_budget_mix" -> q103TokenBudgetMix,
    "q104_decontaminate" -> q104Decontaminate,
    "q126_bloom_decontaminate" -> q126BloomDecontaminate,
    "q105_column_profile" -> q105ColumnProfile,
    "q106_sequence_pack" -> q106SequencePack,
    "q108_fuzzy_match" -> q108FuzzyMatch,
    "q109_interpolate" -> q109Interpolate,
    "q113_hot_block_cap" -> q113HotBlockCap,
    "q118_multi_block_match" -> q118MultiBlockMatch,
  )

  val oracle: Map[String, String] = Map(
    "q197_source_dup_matrix" -> q197Sql,
    "q195_profile_drift" -> q195Sql,
    "q194_incremental_cc" -> q194Sql,
    "q193_lsh_calibration" -> q193Sql,
    "q178_representative_dedup" -> q178Sql,
    "q179_boilerplate_mine" -> q179Sql,
    "q176_mix_schedule" -> q176Sql,
    "q174_l_diversity" -> q174Sql,
    "q173_personalized_pagerank" -> q173Sql,
    "q170_importance_resample" -> q170Sql,
    "q169_k_anonymity" -> q169Sql,
    "q149_rank_functions" -> q149Sql,
    "q152_weighted_sample" -> q152Sql,
    "q154_group_sample" -> q154Sql,
    "q155_triangles" -> q155Sql,
    "q161_kcore" -> q161Sql,
    "q158_mad_outliers" -> q158Sql,
    "q139_stratified_split" -> q139Sql,
    "q135_pagerank" -> q135Sql,
    "q99_line_dedup" -> q99Sql,
    "q123_line_quality" -> q123Sql,
    "q124_temperature_mix" -> q124Sql,
    "q100_domain_cap" -> q100Sql,
    "q101_dup_clusters" -> q101Sql,
    "q102_hash_sample" -> q102Sql,
    "q103_token_budget_mix" -> q103Sql,
    "q104_decontaminate" -> q104Sql,
    "q126_bloom_decontaminate" -> q126Sql,
    "q105_column_profile" -> q105Sql,
    "q106_sequence_pack" -> q106Sql,
    "q108_fuzzy_match" -> q108Sql,
    "q109_interpolate" -> q109Sql,
    "q113_hot_block_cap" -> q113Sql,
    "q118_multi_block_match" -> q118Sql,
  )
}
