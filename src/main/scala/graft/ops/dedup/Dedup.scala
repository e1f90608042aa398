package graft.ops.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite for corpus-scale pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard.
  *
  * All hashing is md5-derived so results are reproducible across
  * engines (the DuckDB oracle recomputes identical signatures):
  * h(seed, x) = first 15 hex digits of md5("<seed>|" + x) as int64
  * (60 bits, always non-negative).
  *
  * Scale notes: every step is groupBy/join on hashed keys — shuffles
  * are on (doc, seed) or (band, key) with partial aggregation; no
  * driver-side state, no quadratic all-pairs stage (LSH restricts
  * Jaccard verification to bucket-colliding candidates only).
  */
object Dedup {

  /** md5-based deterministic 60-bit hash of a string column. */
  def h60(seed: Column, x: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit("|"), x)), 1, 15), 16, 10)
      .cast("long")

  /** Exact dedup: keep the row with min(id) per identical content
    * hash (hash-groupBy; map-side combine). Returns
    * (content_hash, keep_id, n_copies, <minOf> mins). */
  def exact(df: DataFrame, idCol: String, contentCol: String,
            minOf: Seq[String] = Nil): DataFrame = {
    val aggs = Seq(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies")) ++
      minOf.map(c => min(col(c)).as(c))
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Distinct (id, word) pairs from whitespace-tokenized text. */
  def wordSet(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), "\\s+")).as("w")).distinct()

  /** Distinct (id, w) pairs where w is a word k-gram shingle — the
    * order-sensitive unit for near-dup detection (word sets are too
    * coarse on small vocabularies: reordered text still matches).
    * Same output shape as wordSet so minHash/jaccard compose. */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = df.select(col(idCol),
      posexplode(split(col(textCol), "\\s+")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val withLags = (1 until k).foldLeft(t) { (d, i) =>
      d.withColumn(s"tok_$i", lag(col("tok"), i).over(w))
    }
    val parts = ((k - 1) to 1 by -1).map(i => col(s"tok_$i")) :+ col("tok")
    withLags
      .filter(col(s"tok_${k - 1}").isNotNull)
      .select(col(idCol),
        concat(parts.flatMap(p => Seq(p, lit(" "))).dropRight(1): _*).as("w"))
      .distinct()
  }

  /** MinHash signatures: for each of `n` seeds, the min h60 over the
    * doc's word set. Output (id, seed, minhash). */
  def minHash(words: DataFrame, idCol: String, n: Int = 16): DataFrame =
    words
      .select(col(idCol), col("w"),
        explode(sequence(lit(0), lit(n - 1))).as("seed"))
      .groupBy(col(idCol), col("seed"))
      .agg(min(h60(col("seed"), col("w"))).as("minhash"))

  /** LSH banding: group signature rows into bands of `rowsPerBand`
    * seeds; band key = md5 of ':'-joined minhash values in seed
    * order. Output (id, band, band_key). */
  def lshBands(sig: DataFrame, idCol: String, rowsPerBand: Int = 4): DataFrame =
    sig
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(md5(array_join(
        expr("transform(array_sort(collect_list(struct(seed, minhash))), x -> CAST(x.minhash AS STRING))"),
        ":")).as("band_key"))

  /** Candidate pairs: ids sharing any (band, band_key) bucket,
    * a < b, distinct. The whole point of LSH: the later exact
    * verification only touches these pairs, never all N^2.
    *
    * Implemented as collect_list-per-bucket + in-row pair expansion,
    * NOT a self-join — a self-join would evaluate the whole upstream
    * signature pipeline twice (measured 2x wall time at sf0.1), and
    * bucket sizes are small by construction so the m^2 expansion per
    * bucket is bounded. */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame =
    bands.groupBy(col("band"), col("band_key"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

  /** Exact word-set Jaccard for given candidate pairs. */
  def jaccard(pairs: DataFrame, words: DataFrame, idCol: String): DataFrame = {
    val counts = words.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val wa = words.select(col(idCol).as("id_a"), col("w"))
    val wb = words.select(col(idCol).as("id_b"), col("w"))
    val inter = pairs.join(wa, "id_a").join(wb, Seq("id_b", "w"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .join(counts.withColumnRenamed("n", "n_a")
        .withColumnRenamed(idCol, "id_a"), "id_a")
      .join(counts.withColumnRenamed("n", "n_b")
        .withColumnRenamed(idCol, "id_b"), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
  }

  /** SimHash (64-bit, as two int32-range longs hi/lo): per distinct
    * word take md5 bits, sum ±1 votes per bit position over the doc,
    * bit = (vote sum > 0). Output (id, simhash_hi, simhash_lo).
    *
    * The 64x explode is the portable formulation; a custom Catalyst
    * Expression computing the 64 votes per word in one pass is the
    * optimized path at scale. */
  def simHash(words: DataFrame, idCol: String): DataFrame = {
    val bits = words
      .withColumn("wh", md5(col("w")))
      .select(col(idCol), col("wh"), explode(sequence(lit(0), lit(63))).as("j"))
      // hex digit (j div 4) of md5, bit (3 - j%4) within the digit
      .withColumn("hexd", conv(expr("substring(wh, CAST(j / 4 AS INT) + 1, 1)"), 16, 10).cast("int"))
      .withColumn("p",
        when(col("j") % 4 === 0, 8).when(col("j") % 4 === 1, 4)
          .when(col("j") % 4 === 2, 2).otherwise(1))
      .withColumn("bit", (col("hexd") / col("p")).cast("int") % 2)
      .withColumn("vote", col("bit") * 2 - 1)
    bits.groupBy(col(idCol), col("j"))
      .agg(sum(col("vote")).as("v"))
      .withColumn("b", when(col("v") > 0, 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(
        sum(when(col("j") >= 32, col("b") * pow(lit(2.0), col("j") - 32).cast("long"))).as("simhash_hi"),
        sum(when(col("j") < 32, col("b") * pow(lit(2.0), col("j")).cast("long"))).as("simhash_lo"))
  }
}
