package graft.devtools

import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.ops.dedup.Dedup

/** Dev-only magnitude check: the map-only signature expressions
  * (MinHashSig / SimHashSig) must be bit-identical to the aggregate
  * formulations at EVERY scale, not just the sf0.001 the specs run
  * on — magnitude-dependent divergence (overflow, collision-order,
  * codegen splits) is the historical failure mode. Run with
  * SPARK_GRAFT_SF_DIR at the corpus under test; exits nonzero on any
  * diverging row. */
object SigEquiv {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/tmp/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val n = docs.count()

    val mhAgg = Dedup.minHash(Dedup.shingleSet(docs, "doc_id", "text", 3), "doc_id", 16)
    val mhMap = Dedup.minHashText(docs, "doc_id", "text", 3, 16)
    val mhDiff = mhMap.exceptAll(mhAgg).count() + mhAgg.exceptAll(mhMap).count()
    println(s"[sigequiv] $sfDir docs=$n minhash rows=${mhMap.count()} diff=$mhDiff")

    val shAgg = Dedup.simHash(Dedup.wordSet(docs, "doc_id", "text"), "doc_id")
    val shMap = Dedup.simHashText(docs, "doc_id", "text")
    val shDiff = shMap.exceptAll(shAgg).count() + shAgg.exceptAll(shMap).count()
    println(s"[sigequiv] $sfDir docs=$n simhash rows=${shMap.count()} diff=$shDiff")

    spark.stop()
    if (mhDiff != 0 || shDiff != 0) sys.exit(1)
    println("[sigequiv] PASS")
  }
}
