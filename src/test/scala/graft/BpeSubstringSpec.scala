package graft

import org.apache.spark.sql.functions._
import graft.ops.dedup.SubstringDup
import graft.ops.text.Bpe

/** BPE vocabulary induction + exact substring-duplication audit:
  * canonical merge-application semantics on adversarial symbol runs,
  * hand-computed training fixtures, and the coverage identity behind
  * the per-document duplicated-char counts. */
class BpeSubstringSpec extends SparkSpec {
  import spark.implicits._

  private def applied(state: String, l: String, r: String): String =
    Seq(state).toDF("s")
      .select(Bpe.applyMerge(col("s"), lit(l), lit(r)).as("o"))
      .head().getString(0)

  test("applyMerge is the canonical greedy left-to-right scan") {
    // run of the same symbol: leftmost non-overlapping pairs
    assert(applied("a a a", "a", "a") == "aa a")
    assert(applied("a a a a a", "a", "a") == "aa aa a")
    // alternating chain: every pair merges (the string-replace
    // boundary-overlap trap this fold avoids)
    assert(applied("a b a b a b", "a", "b") == "ab ab ab")
    // merged symbol never cascades within one application
    assert(applied("a a b", "a", "ab") == "a a b")
    // suffix test is space-anchored: 'ca' does not match l='a'
    assert(applied("ca b", "a", "b") == "ca b")
    assert(applied("c a b", "a", "b") == "c ab")
    // single symbol / no match are identity
    assert(applied("q", "a", "b") == "q")
    assert(applied("x y", "a", "b") == "x y")
  }

  test("train learns the hand-computed merges with deterministic ties") {
    // corpus: 'aab' x3, 'ab' x2, 'cc' x2
    // pairs: (a,a)=3, (a,b)=5, (c,c)=2 -> merge1 = (a,b)
    // states: 'a ab' x3, 'ab' x2, 'c c' x2
    // pairs: (a,ab)=3, (c,c)=2 -> merge2 = (a,ab)
    val words = (Seq.fill(3)("aab") ++ Seq.fill(2)("ab") ++ Seq.fill(2)("cc"))
      .toDF("w")
    val got = Bpe.train(words, "w", 2).orderBy("rank")
      .select("rank", "left_sym", "right_sym", "merged", "pair_n")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq((1, "a", "b", "ab", 5L), (2, "a", "ab", "aab", 3L)))
  }

  test("train stops early when the vocabulary runs out of mergeable pairs") {
    // 'ab' x2: merge 1 = (a,b), after which every word is ONE symbol —
    // ranks 2..5 have no pairs. The loop must break, not crossJoin an
    // empty best row (which silently emptied vocab and returned junk).
    val words = Seq.fill(2)("ab").toDF("w")
    val got = Bpe.train(words, "w", 5)
      .select("rank", "left_sym", "right_sym", "pair_n")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "a", "b", 2L)),
      s"one learnable merge, not 5: ${got.toSeq}")
    // degenerate corpus of single-char words: ZERO learnable merges —
    // an empty frame with the contract schema, not a crash
    val none = Bpe.train(Seq("a", "b", "c").toDF("w"), "w", 3)
    assert(none.columns.toSeq ==
      Seq("rank", "left_sym", "right_sym", "merged", "pair_n"))
    assert(none.isEmpty)
  }

  test("train tie-break is (pair_n DESC, l ASC, r ASC)") {
    // 'ab' and 'ba' both appear twice inside 'abab': state 'a b a b'
    // has pairs (a,b)=2, (b,a)=1 per word... use two words to tie:
    // 'ab' x2 -> (a,b)=2 ; 'aa' x2 -> (a,a)=2. Tie on 2 -> (a,a) wins
    // (r 'a' < 'b').
    val words = (Seq.fill(2)("ab") ++ Seq.fill(2)("aa")).toDF("w")
    val first = Bpe.train(words, "w", 1).head()
    assert(first.getString(1) == "a" && first.getString(2) == "a")
  }

  test("applyAll replays the learned merges map-only and releases no state") {
    val words = (Seq.fill(3)("aab") ++ Seq.fill(2)("ab")).toDF("w")
    val merges = Bpe.train(words, "w", 2)
    val toks = words.crossJoin(broadcast(Bpe.mergesRow(merges)))
      .select(Bpe.applyAll(col("w"), col("bpe_merges"), 2).as("state"))
      .collect().map(_.getString(0)).sorted
    // 'aab' -> merge1: 'a ab' -> merge2: 'aab' (1 token); 'ab' -> 'ab'
    assert(toks.toSeq == Seq("aab", "aab", "aab", "ab", "ab"))
  }

  test("dupChars: disjoint repeats count k each, overlaps collapse") {
    val k = 4
    // doc1/doc2 share the window 'wxyz' (cross-doc dup, disjoint):
    //   each contributes exactly k chars.
    // doc3 = 'qqqqq': windows 'qqqq' at 1 and 2 (self-repeat,
    //   overlapping): coverage = k + min(k, 2-1) = 5 = whole doc.
    // doc4 is unique long text -> no flagged windows.
    // doc5 shorter than k -> no windows at all.
    val docs = Seq(
      (1L, "wxyzAAAA"), (2L, "BBBBwxyz"), (3L, "qqqqq"),
      (4L, "uniquetextnothingrepeats"), (5L, "ab")).toDF("doc_id", "text")
    val got = SubstringDup.dupChars(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 4L, 3L -> 5L))
  }

  test("dupChars coverage identity equals brute-force interval union") {
    // randomized-ish fixture (deterministic seed via md5 ordering):
    // build docs from a tiny alphabet so repeats are dense, then check
    // the LEAST(k, gap) sum against an explicit interval-union count.
    val k = 5
    val texts = Seq(
      "abcabcabcabc", "xxabcxxabcxx", "abcdefghijkl", "aaaaaaa", "abcab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = SubstringDup.dupChars(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force on the driver: same definition, interval union
    val all = texts.zipWithIndex.flatMap { case (t, i) =>
      (0 to t.length - k).map(p => (t.substring(p, p + k), i.toLong, p))
    }
    val multi = all.groupBy(_._1).filter(_._2.size >= 2).values.flatten
    val want = multi.groupBy(_._2).map { case (id, ws) =>
      val covered = ws.flatMap(w => w._3 until w._3 + k).toSet.size
      id -> covered.toLong
    }
    assert(got == want)
  }

  test("multiplicity-partition knob resizes the window exchange without changing results") {
    val k = 4
    val docs = Seq(
      (1L, "wxyzAAAA"), (2L, "BBBBwxyz"), (3L, "qqqqq"),
      (4L, "uniquetextnothingrepeats")).toDF("doc_id", "text")
    val plain = SubstringDup.dupCharsHashed(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set(SubstringDup.PartitionsKey, "7")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // bare plan tree
    try {
      val knobbed = SubstringDup.dupCharsHashed(docs, "doc_id", "text", k)
      assert(knobbed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        == plain, "the knob is a layout choice, never a semantic one")
      // the knob REPLACES the multiplicity exchange (the window reuses
      // the repartition's hash distribution on the same key) — the
      // plan must carry a 7-partition exchange on h and NOT also the
      // session-default one
      val exchanges = knobbed.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("h#") => e
      }
      assert(exchanges.map(_.outputPartitioning.numPartitions) == Seq(7),
        s"expected ONE 7-partition multiplicity exchange, got " +
          s"${exchanges.map(_.outputPartitioning.numPartitions)}")
    } finally {
      spark.conf.unset(SubstringDup.PartitionsKey)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }
}
