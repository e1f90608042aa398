package graft

import org.apache.spark.sql.functions._
import graft.devtools.GenScale

/** The scale-decade corpora (tmp/sf1, tmp/sf10) are regenerated from
  * scratch whenever tmp/ is wiped — including by Bench's sf1-gate
  * self-heal — so the accepted baselines and the SCALE.md decade
  * rows are only comparable across rounds if GenScale is
  * DETERMINISTIC. This suite pins that, plus the structural
  * invariants the dedup-family measurements lean on (unique ids per
  * copy; embedding copies are norm-preserving rotations, far from
  * the source but statistically identical). */
class GenScaleSpec extends SparkSpec {
  private val src = "/root/testdata/sf0.001"

  private def gen(dir: String, factor: Int): String = {
    val out = java.nio.file.Files
      .createTempDirectory(s"genscale_$dir").toString
    GenScale.generate(spark, src, out, factor)
    out
  }

  test("regeneration is deterministic: two runs, identical rows") {
    val a = gen("a", 3)
    val b = gen("b", 3)
    for (t <- Seq("documents", "embeddings", "lineitem")) {
      val da = spark.read.parquet(s"$a/$t.parquet")
      val db = spark.read.parquet(s"$b/$t.parquet")
      assert(da.count() === db.count(), t)
      assert(da.exceptAll(db).isEmpty && db.exceptAll(da).isEmpty,
        s"$t rows differ between regenerations")
    }
  }

  test("documents: factor x rows, ids unique, copies permute not clone") {
    val out = gen("docs", 3)
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.count() === srcDocs.count() * 3)
    assert(docs.select("doc_id").distinct().count() === docs.count())
    // a copy's text must not be a byte-clone of its source (a cloned
    // corpus would plant factor-sized exact-dup classes and poison
    // every dedup measurement); the stride permutation only degrades
    // to identity on degenerate lengths (n <= 1 or stride = 1 mod n),
    // so require MOST long docs to differ
    val joined = docs.filter(col("doc_id") >= 1000000000L)
      .withColumn("src_id", col("doc_id") % 1000000000L)
      .join(srcDocs.select(col("doc_id").as("src_id"),
        col("text").as("src_text")), "src_id")
    val long = joined.filter(size(split(col("src_text"), "\\s+")) >= 10)
    val cloned = long.filter(col("text") === col("src_text")).count()
    assert(cloned.toDouble / math.max(long.count(), 1) < 0.2,
      s"$cloned cloned copies — the permutation is not permuting")
  }

  test("factor>10: copies of one source do not near-duplicate EACH OTHER") {
    // the decade-curve contract: scaling the corpus must not change
    // its near-dup composition. The first factor-100 scheme (additive
    // rotation offsets per stride cycle) made same-stride copies
    // cyclic rotations of each other — jaccard ~0.9, ~11-strong
    // planted dup classes per source — and sent q129's sf10 shuffle
    // superlinear. Factor 12 crosses the cycle boundary (c=10..11
    // share a stride family with c=1..2), so this test would have
    // caught it: under rotations, every (c, c+9) pair verifies near
    // 0.9; under multiplicative powers they share only O(1) trigrams.
    val out = gen("cross", 12)
    val shift = 1000000000L
    val copies = spark.read.parquet(s"$out/documents.parquet")
      .filter(col("doc_id") >= shift)
      .select((col("doc_id") % shift * 100L + (col("doc_id") / shift))
          .as("uid"),
        col("doc_id").%(shift).as("src_id"), col("text"))
      .filter(size(split(col("text"), "\\s+")) >= 20)
    val pairs = copies.select(col("src_id"), col("uid").as("id_a"))
      .join(copies.select(col("src_id"), col("uid").as("id_b")), "src_id")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val (near, total) = graft.ops.dedup.Dedup.jaccardTextScoped(
      pairs, copies.select(col("uid"), col("text")), "uid", "text") { j =>
      (j.filter(col("jaccard") >= 0.5).count(), j.count())
    }
    assert(total > 1000, s"fixture too small to be meaningful: $total pairs")
    // allow a thin residue for per-doc arithmetic coincidences
    // (small multiplicative order of a stride mod a doc's length)
    assert(near.toDouble / total < 0.02,
      s"$near / $total cross-copy pairs are near-dups — the corpus " +
        "generator is planting duplicate classes again")
  }

  test("copies are true permutations: word multiset preserved, never collapsed") {
    // i -> i*m mod n is bijective ONLY for gcd(m, n) = 1. The first
    // prime-stride scheme skipped that check: a doc whose length is
    // divisible by the copy's stride COLLAPSED to n/s repeated words
    // — 9.6% of factor-100 copies, carrying 97.5% of q129's sf10
    // candidate-pair pollution (the 1.44 byte exponent of the first
    // decade run). Collapsed copies sit BELOW the 0.5-jaccard verify
    // bar, so the cross-copy near-dup test above cannot see them; the
    // multiset identity can. Factor 12 crosses the stride-list wrap
    // (the exponent-bump path) so the wrap arithmetic is covered too.
    val out = gen("perm", 12)
    val shift = 1000000000L
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
      .select(col("doc_id").as("src_id"),
        array_sort(split(col("text"), "\\s+")).as("src_sorted"))
    val bad = spark.read.parquet(s"$out/documents.parquet")
      .filter(col("doc_id") >= shift)
      .select((col("doc_id") % shift).as("src_id"),
        array_sort(split(col("text"), "\\s+")).as("sorted"))
      .join(srcDocs, "src_id")
      .filter(col("sorted") =!= col("src_sorted"))
      .count()
    assert(bad === 0L, s"$bad copies are not permutations of their source")
  }

  test("factor>10: no exact-clone embedding vectors across copies") {
    // rotation-only lane shifts repeat every 9 copies at dim 64
    // (7c mod 63): copy 1 and copy 10 were EXACT clones before the
    // per-cycle sign-flip pattern
    val out = gen("embx", 12)
    val shift = 1000000000L
    val copies = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(col("vec_id") >= shift)
      .select((col("vec_id") % shift).as("src_id"),
        col("vec_id"), col("embedding"))
    val clonePairs = copies.as("a")
      .join(copies.as("b"),
        col("a.src_id") === col("b.src_id") &&
          col("a.vec_id") < col("b.vec_id") &&
          col("a.embedding") === col("b.embedding"))
      .count()
    assert(clonePairs === 0L, s"$clonePairs exact-clone vector pairs")
  }

  test("embeddings: copies are norm-preserving rotations of the source") {
    val out = gen("emb", 3)
    val srcEmb = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id").as("src_id"),
        aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x * x).as("src_sq"),
        col("embedding").as("src_vec"))
    val copies = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(col("vec_id") >= 1000000000L)
      .withColumn("src_id", col("vec_id") % 1000000000L)
      .select(col("src_id"), col("vec_id"),
        aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x * x).as("sq"),
        col("embedding").as("vec"))
      .join(srcEmb, "src_id")
    // rotation preserves the exact multiset of coordinates, hence the
    // exact sum of squares (no float re-association: same values, one
    // fold order per row)
    val badNorm = copies
      .filter(abs(col("sq") - col("src_sq")) > (col("src_sq") + lit(1.0)) * 1e-6)
      .count()
    assert(badNorm === 0L, s"$badNorm copies changed their norm")
    // and no copy is an identity rotation (a clone would be its own
    // nearest neighbor at cosine 1 and corrupt ANN recall baselines)
    val clones = copies.filter(col("vec") === col("src_vec")).count()
    assert(clones === 0L, s"$clones embedding copies are exact clones")
  }
}
