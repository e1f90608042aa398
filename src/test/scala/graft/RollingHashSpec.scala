package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHash
import graft.ops.dedup.SubstringDup

/** The O(len) rolling-hash expression behind the 100 TB substring-dup
  * path: recurrence vs direct polynomial evaluation, window counting,
  * codegen placement, and hashed-vs-exact dupChars equivalence. */
class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  /** Direct (non-rolling) polynomial hash of bytes [i, i+k). */
  private def direct(s: String, i: Int, k: Int): Long = {
    val b = s.getBytes("UTF-8")
    var h = 0L
    for (j <- i until i + k) h = h * RollingHash.M + (b(j) & 0xffL)
    h
  }

  test("recurrence matches direct polynomial evaluation at every position") {
    for (k <- Seq(1, 2, 3, 7)) {
      val s = "the quick brown fox jumps over the lazy dog"
      val got = Seq(s).toDF("t")
        .select(RollingHash.windowHashes(col("t"), k).as("h"))
        .head().getSeq[Long](0)
      val want = (0 to s.length - k).map(direct(s, _, k))
      assert(got == want, s"k=$k")
    }
  }

  test("window count is n-k+1; short strings yield empty; nulls propagate") {
    val df = Seq(Some("abcde"), Some("abc"), Some("ab"), None).toDF("t")
      .select(RollingHash.windowHashes(col("t"), 3).as("h"))
    val got = df.collect().map(r => Option(r.get(0)).map(_ => r.getSeq[Long](0).length))
    assert(got.toSeq == Seq(Some(3), Some(1), Some(0), None))
  }

  test("equal windows hash equal; distinct windows distinct on a dense fixture") {
    // every 4-window of 'abcabcabc': equal substrings must collide,
    // and on this tiny alphabet the 6 distinct windows must not.
    val s = "abcabcabc"
    val k = 4
    val hs = Seq(s).toDF("t")
      .select(RollingHash.windowHashes(col("t"), k).as("h"))
      .head().getSeq[Long](0)
    val subs = (0 to s.length - k).map(i => s.substring(i, i + k))
    for (i <- subs.indices; j <- subs.indices)
      assert((hs(i) == hs(j)) == (subs(i) == subs(j)), s"($i,$j)")
  }

  test("stays inside WholeStageCodegen over a parquet scan") {
    val scan = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(length(col("text")) >= 20)
      .select(RollingHash.windowHashes(col("text"), 20).as("h"))
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }

  test("leakedCharsHashed covers exactly the train-contained eval windows") {
    val k = 5
    // train corpus carries 'hello' and 'world' spans
    val train = Seq((100L, "say hello there"), (101L, "the world is wide"))
      .toDF("doc_id", "text")
    // eval doc 1: 'hello' leaks (5 chars: windows "say h".."hello"? only
    //   windows fully inside train text count — brute-forced below);
    // eval doc 2: nothing shared; eval doc 3: shorter than k
    val eval = Seq((1L, "well hello world"), (2L, "unrelated zzz"), (3L, "hi"))
      .toDF("doc_id", "text")
    val got = SubstringDup.leakedCharsHashed(eval, train, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: train window set, eval windows in it, interval union
    val trainTexts = Seq("say hello there", "the world is wide")
    val tw = trainTexts.flatMap(t => (0 to t.length - k).map(p => t.substring(p, p + k))).toSet
    val want = Seq((1L, "well hello world"), (2L, "unrelated zzz"))
      .map { case (id, t) =>
        val starts = (0 to t.length - k).filter(p => tw(t.substring(p, p + k)))
        id -> starts.flatMap(p => p until p + k).toSet.size.toLong
      }.filter(_._2 > 0).toMap
    assert(got == want)
    assert(got.contains(1L) && !got.contains(2L) && !got.contains(3L))
  }

  test("dupSpansHashed merges flagged windows into maximal islands") {
    val k = 4
    // doc1/doc2 share 'wxyz' -> each gets one island of exactly k;
    // doc3 'qqqqq' self-repeats: starts 1,2 chain -> one island of 5;
    // doc4: 'wxyz' at both ends with a long unique middle -> TWO
    //   islands (gap > k), each of span k
    val docs = Seq(
      (1L, "wxyzAAAA"), (2L, "BBBBwxyz"), (3L, "qqqqq"),
      (4L, "wxyzMNOPQRSTUVwxyz")).toDF("doc_id", "text")
    val got = SubstringDup.dupSpansHashed(docs, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toSeq).toMap
    assert(got(1L) == Seq((1L, 4L)))
    assert(got(2L) == Seq((5L, 4L)))
    assert(got(3L) == Seq((1L, 5L)))
    assert(got(4L) == Seq((1L, 4L), (15L, 4L)), s"two disjoint islands: $got")
    // islands' char totals equal dupChars coverage on the same corpus
    val spanSum = SubstringDup.dupSpansHashed(docs, "doc_id", "text", k)
      .groupBy("doc_id").agg(sum("span_len").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cov = SubstringDup.dupChars(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spanSum == cov, "span lengths must sum to the coverage identity")
  }

  test("dupCharsHashed reproduces dupChars exactly on ASCII corpora") {
    for ((k, texts) <- Seq(
      4 -> Seq("wxyzAAAA", "BBBBwxyz", "qqqqq", "uniquetextnothingrepeats", "ab"),
      5 -> Seq("abcabcabcabc", "xxabcxxabcxx", "abcdefghijkl", "aaaaaaa", "abcab"))) {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val exact = SubstringDup.dupChars(docs, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hashed = SubstringDup.dupCharsHashed(docs, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hashed == exact, s"k=$k")
    }
  }
}
