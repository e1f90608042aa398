package graft.ops.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column kit for large-scale corpus pipelines:
  * tokenization, quality signals, language-ID scoring. All pure
  * codegen'd column expressions — no UDFs, so whole-stage codegen
  * keeps the scan→score pipeline in one pass at 100 TB.
  */
object TextOps {

  /** Whitespace tokens (Spark `split` keeps trailing empties — same
    * contract as DuckDB string_split_regex, unlike Java's split). */
  def wsTokens(text: Column): Column = split(text, "\\s+")

  def nWsTokens(text: Column): Column = size(wsTokens(text))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, or single
    * non-space symbols (pattern valid in both Java regex and RE2). */
  val bpeishPattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def nRegexTokens(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  def nDistinctWords(text: Column): Column = size(array_distinct(wsTokens(text)))

  /** Mean word length = non-space chars / token count (single double
    * division of exact ints — cross-engine deterministic). */
  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") / nWsTokens(text)

  /** Count of tokens belonging to a marker set (stopword counting). */
  def markerCount(text: Column, markers: Seq[String]): Column =
    size(filter(wsTokens(text), w => w.isin(markers: _*)))

  /** Quality score in [0,1]: half length-saturation, half stopword
    * density (ref-style composite; both halves are *0.5 which is an
    * exact exponent shift, so the sum is a single rounding). */
  def qualityScore(text: Column, stopwords: Seq[String], satChars: Int = 400): Column = {
    val lenScore = least(length(text), lit(satChars)).cast("double") / satChars
    val stopRatio = markerCount(text, stopwords).cast("double") / nWsTokens(text)
    lenScore * 0.5 + stopRatio * 0.5
  }

  /** Punctuation density: non-alphanumeric non-space chars / total
    * chars (the punct-ratio leg of the brief's quality triple; a
    * single exact-int division). */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") / length(text)

  /** Language-ID by marker-word density: score per language =
    * marker hits / tokens; caller argmaxes (n-gram heuristic shape —
    * deterministic, no model). */
  def langScore(text: Column, markers: Seq[String]): Column =
    markerCount(text, markers).cast("double") / nWsTokens(text)

  /** Fraction of tokens containing at least one letter (the Gopher
    * "80% of words must have an alphabetic character" rule). Exact
    * int/int division — cross-engine deterministic. */
  def alphaWordRatio(text: Column): Column =
    size(filter(wsTokens(text), w => w.rlike("[a-zA-Z]"))).cast("double") /
      nWsTokens(text)

  /** Symbol-to-word ratio over the Gopher symbol set ('#' and
    * ellipsis "..."): symbol occurrences / tokens. Both engines count
    * non-overlapping left-to-right matches, so the ints agree. */
  def symbolWordRatio(text: Column): Column =
    (regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")))
      .cast("double") / nWsTokens(text)

  // ---- URL canonicalization (the crawl-dedup front door) ----

  /** Split pattern: scheme://host[/path]. RE2-safe, shared verbatim
    * with the oracle. */
  val urlRe = "^([a-zA-Z]+)://([^/]+)(/.*)?$"

  /** Canonical host: lowercased, default ports (:80/:443) stripped,
    * leading www. stripped. */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, urlRe, 2)), ":(443|80)$", ""),
      "^www\\.", "")

  /** Canonical URL: lowercased scheme+host (ports/www stripped),
    * fragment dropped, utm_* tracking query dropped, trailing slash
    * stripped — the rule set under which a re-crawled page aliases to
    * one identity. Replacement order is part of the contract
    * (fragment first — a utm query may precede it). */
  def urlCanon(url: Column): Column = {
    val path0 = regexp_extract(url, urlRe, 3)
    val path = regexp_replace(
      regexp_replace(regexp_replace(path0, "#.*$", ""), "\\?utm_[^#]*$", ""),
      "/$", "")
    concat(lower(regexp_extract(url, urlRe, 1)), lit("://"), urlHost(url), path)
  }

  // ---- PII scrub (the release-gate every public corpus runs) ----

  /** PII patterns shared verbatim by the Spark and DuckDB legs:
    * RE2-safe (no backreferences, no lookaround), identical semantics
    * in Java regex. Deliberately high-precision shapes — an email,
    * a dashed KR-style phone number, a dotted IPv4 — the industry
    * scrub pattern family (C4/Dolma-style), not an NER model. */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b0\\d{1,2}-\\d{3,4}-\\d{4}\\b"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def nEmails(text: Column): Column = regexp_count(text, lit(emailRe))
  def nPhones(text: Column): Column = regexp_count(text, lit(phoneRe))
  def nIpv4s(text: Column): Column = regexp_count(text, lit(ipv4Re))

  /** Mask all three PII classes with typed placeholders. Replacement
    * ORDER is part of the contract (email first — its local part may
    * contain digit runs; then phone, then IP) and is replayed
    * identically by the oracle. Pure codegen'd map — no shuffle, no
    * UDF; at 100 TB this rides the same scan as the quality scores. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")
}
