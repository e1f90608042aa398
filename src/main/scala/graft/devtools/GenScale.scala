package graft.devtools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: scale the driver-generated testdata one more decade
  * for the SCALE.md curve (sf0.1 x 10 -> "sf1"). NOT part of the
  * library surface — a measurement tool, like dev/check.py.
  *
  * Copies 1..factor-1 must not be trivial re-crawls or the dedup
  * family's timing would measure a pathological 100%-duplicate
  * corpus instead of a bigger natural one, so:
  *  - documents: ids shift by c*10^9; copy texts are STRIDE
  *    PERMUTATIONS of the original words (stride coprime to most
  *    lengths, per-copy) — contiguous shingles are destroyed, so a
  *    copy is NOT a near-duplicate of its source under k-gram
  *    MinHash/Jaccard, while keeping the token distribution (and so
  *    df/LSH bucket load) realistic.
  *  - embeddings: ids shift; vectors circular-shift by 7c lanes —
  *    far from the source in cosine, same norm/coordinate stats.
  *  - lineitem: l_orderkey shifts by c*10^9 — join keys stay unique
  *    per copy, value distributions identical.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/root/repo/tmp/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame)(mk: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(c => mk(df, c)).reduce(_ unionByName _)

    val shift = 1000000000L

    val docs = spark.read.parquet(s"$src/documents.parquet")
    copies(docs) { (df, c) =>
      if (c == 0) df
      else {
        val stride = Seq(3, 7, 11, 13, 17, 19, 23, 29, 31)((c - 1) % 9)
        // factors beyond 10 cycle the 9 strides, which would make
        // copies c and c+9 EXACT duplicates of each other (same
        // permutation of the same source) and plant huge artificial
        // dup classes — a rotation offset per stride cycle keeps
        // every copy distinct while c <= 9 output stays byte-stable
        // (off = 0 reproduces the original transform, so tmp/sf1
        // regenerates identically)
        val off = (c - 1) / 9
        val words = split(col("text"), "\\s+")
        val n = size(words)
        val permuted0 = array_join(
          transform(sequence(lit(0), n - 1),
            i => element_at(words, ((i * stride + off) % n) + 1)), " ")
        val permuted = when(n > 0, permuted0).otherwise(col("text"))
        df.select((col("doc_id") + c * shift).as("doc_id"),
          permuted.as("text"), col("lang"), col("source"),
          length(permuted).cast("long").as("n_chars"))
      }
    }.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val idCol = "vec_id"
    val vecCol = "embedding"
    copies(emb) { (df, c) =>
      if (c == 0) df
      else {
        val v = col(vecCol)
        val d = size(v)
        // lane shift wrapped into [1, d-1]: equals the original 7c for
        // 7c <= d-1 (so c <= 9 output is byte-stable at dim 64+), and
        // never 0 (an identity shift would clone the source vector
        // exactly) for the factor-100 second decade
        val k = pmod(lit(7 * c) - 1, d - 1) + 1
        val shifted = concat(slice(v, k + 1, d - k), slice(v, lit(1), k))
        df.withColumn(idCol, col(idCol) + c * shift).withColumn(vecCol, shifted)
      }
    }.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    copies(li) { (df, c) =>
      if (c == 0) df else df.withColumn("l_orderkey", col("l_orderkey") + c * shift)
    }.repartition(32).write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // remaining tables: straight copies (only read whole by the
    // curve's queries, if at all)
    Seq("region", "nation", "customer", "supplier", "part", "orders", "events")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    println(s"wrote $out at ${factor}x $src")
    spark.stop()
  }
}
