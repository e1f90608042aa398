package graft.devtools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.similarity.VectorOps

/** Dev probe: broadcast bytes of the hierarchical assignment's two
  * shapes at a given rung — the one-bundle-row path (all nlist
  * centroids ride the broadcast) vs the sharded path (only the
  * nSuper super-centroids are broadcast; the super→cells shards meet
  * vectors through a shuffle join). Prints each form's
  * BroadcastExchange dataSize totals, clock, and an
  * order-independent digest that must MATCH (the
  * HierarchicalAssignSpec parity, re-checked at rung scale).
  *
  * Usage: ShardBytesProbe [embDir] [wSuper] — default
  * /root/repo/tmp/sf10, 2. */
object ShardBytesProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmp/sf10")
    val wSuper = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // AQE off so executedPlan.collect sees the BroadcastExchange
      // nodes directly (metrics probe, not a perf run)
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.core.Tables.embeddings(spark, dir)
    val n = emb.count()
    val nlist = math.max(8L, n / 64L).toInt
    val nSuper = math.max(2, math.ceil(math.sqrt(nlist.toDouble)).toInt)
    println(s"[shard-probe] corpus=$n nlist=$nlist nSuper=$nSuper wSuper=$wSuper")
    val t0 = System.nanoTime()
    val (_, cents) = VectorOps.ivfBuildHierarchical(emb, "vec_id", nlist, nSuper)
    val centsDir = java.nio.file.Files.createTempDirectory("shard_probe").toString
    cents.write.mode("overwrite").parquet(centsDir)
    println(f"[shard-probe] index build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val stored = spark.read.parquet(centsDir)

    def run(label: String, mk: () => DataFrame): Unit = {
      spark.catalog.clearCache(); System.gc()
      val agg = mk().select(xxhash64(col("vec_id").cast("string"),
          col("cell").cast("string")).cast("decimal(38,0)").as("h"))
        .agg(sum(col("h")), count(lit(1)))
      val t = System.nanoTime()
      val row = agg.head()
      val sec = (System.nanoTime() - t) / 1e9
      println(f"[shard-probe] $label: ${sec}%6.1f s " +
        s"rows=${row.getLong(1)} digest=${row.get(0)}")
    }
    run("bundle ", () => VectorOps.assignCellsHierarchical(
      emb, "vec_id", stored, nSuper, wSuper))
    run("sharded", () => VectorOps.assignCellsHierarchicalSharded(
      emb, "vec_id", stored, nSuper, wSuper))

    // broadcast PAYLOADS, weighed directly (driver-side object size
    // of the collected rows): the bundle path's broadcast carries the
    // supers PLUS every nlist centroid (the cmap); the sharded path
    // broadcasts the supers ONLY — its cells meet vectors through the
    // shard shuffle join, nothing nlist-sized rides a broadcast
    val (sc2, _) = VectorOps.superQuantizer(stored, nSuper)
    val supersBytes = org.apache.spark.GraftMetricsBridge
      .estimateSize(sc2.collect())
    val cellsBytes = org.apache.spark.GraftMetricsBridge
      .estimateSize(stored.collect())
    println(f"[shard-probe] broadcast payloads: bundle = supers + all cells " +
      f"= ${(supersBytes + cellsBytes) / 1048576.0}%.2f MB; " +
      f"sharded = supers only = ${supersBytes / 1024.0}%.1f KB " +
      f"(nlist=$nlist cells ${cellsBytes / 1048576.0}%.2f MB stay off the broadcast)")
    spark.stop()
  }
}
