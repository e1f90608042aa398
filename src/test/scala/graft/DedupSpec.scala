package graft

import org.apache.spark.sql.functions._
import graft.ops.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup
    (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup
    (4L, "completely different words about spark query engines and shuffles here"),
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per content hash") {
    val g = Dedup.exact(docs, "doc_id", "text")
    assert(g.count() == 3)
    val dup = g.filter(col("n_copies") === 2).collect()(0)
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("minhash: identical docs identical signatures; near-dups mostly agree") {
    val sh = Dedup.shingleSet(docs, "doc_id", "text", 3)
    val rows = Dedup.minHash(sh, "doc_id", 16).collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toSeq).toMap
    assert(rows(1L) == rows(2L))
    val agree13 = rows(1L).zip(rows(3L)).count(p => p._1 == p._2)
    val agree14 = rows(1L).zip(rows(4L)).count(p => p._1 == p._2)
    assert(agree13 > 8, s"near-dup should share most minhashes, got $agree13/16")
    assert(agree14 < 4, s"unrelated docs should share few minhashes, got $agree14/16")
  }

  test("LSH bucket-join surfaces the duplicate pair without N^2 work") {
    val sh = Dedup.shingleSet(docs, "doc_id", "text", 3)
    val bands = Dedup.lshBands(Dedup.minHash(sh, "doc_id", 16), "doc_id", 16, 4)
    val pairs = Dedup.candidatePairs(bands, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
    val j = Dedup.jaccard(Dedup.candidatePairs(bands, "doc_id"), sh, "doc_id")
      .filter(col("id_a") === 1 && col("id_b") === 2).collect()(0)
    assert(j.getAs[Double]("jaccard") == 1.0)
  }

  test("simhash: equal for identical docs, close for near-dups") {
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val words = Dedup.wordSet(docs, "doc_id", "text")
    val sh = Dedup.simHash(words, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sh(1L) == sh(2L))
    assert(hamming(sh(1L), sh(3L)) < hamming(sh(1L), sh(4L)))
    assert(hamming(sh(1L), sh(3L)) <= 12)
  }
}
