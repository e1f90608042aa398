package graft

import org.apache.spark.sql.functions._
import graft.ops.ZOrder

/** Z-order layout: the interleave math against a plain-Scala
  * reference, and the property the layout exists for — after
  * layoutByZ, every physical partition's bounding box is narrow in
  * BOTH dimensions (that is what lets parquet min/max stats prune
  * multi-dimensional filters after a z-ordered write). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(dims: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; j <- dims.indices)
      z |= ((dims(j) >> i) & 1L) << (i * dims.size + j)
    z
  }

  test("zValue matches the reference interleave, 2 and 3 dims") {
    val samples = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (3L, 7L, 1L),
      (255L, 255L, 255L), (170L, 85L, 0L), (129L, 64L, 200L))
    val df = samples.toDF("x", "y", "w")
    val got2 = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 8)).collect().map(_.getLong(0))
    val want2 = samples.map { case (x, y, _) => refZ(Seq(x, y), 8) }
    assert(got2.toSeq == want2)
    val got3 = df.select(ZOrder.zValue(Seq(col("x"), col("y"), col("w")), 8))
      .collect().map(_.getLong(0))
    val want3 = samples.map { case (x, y, w) => refZ(Seq(x, y, w), 8) }
    assert(got3.toSeq == want3)
    // interleave is a bijection on the grid: distinct inputs -> distinct z
    assert(got2.distinct.length == got2.length)
    intercept[IllegalArgumentException] { ZOrder.zValue(Seq(col("x")), 64) }
  }

  test("aligned z intervals are exact tiles — the pruning guarantee") {
    // every ALIGNED 2^(2k)-sized z interval of a 2-D interleave is
    // exactly a 2^k x 2^k tile: the mathematical fact a z-ordered
    // file layout converts into parquet min/max pruning on both keys.
    // (Deterministic — unlike sampled range-partition boundaries,
    // which may straddle a Morton quadrant jump.)
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
    val cells = df.withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 6))
      .groupBy((col("z") / 256).cast("long").as("cell"))
      .agg(count(lit(1)).as("n"),
        (max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(cells.length == 16 && cells.map(_.getAs[Long]("n")).sum == 64L * 64L)
    cells.foreach { c =>
      assert(c.getAs[Long]("n") == 256L &&
        c.getAs[Long]("sx") == 15L && c.getAs[Long]("sy") == 15L,
        s"cell ${c.getAs[Long]("cell")} is not a 16x16 tile: $c")
    }
  }

  test("layoutByZ preserves rows, drops the helper column, and sorts by z within partitions") {
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y").repartition(8) // scrambled input layout
    val laid = ZOrder.layoutByZ(df, Seq(col("x"), col("y")), 6, numParts = 16)
    assert(laid.columns.toSeq == Seq("x", "y"), "helper column must be dropped")
    assert(laid.count() == 64L * 64L, "no rows lost")
    // per physical partition: z non-decreasing (the write order parquet
    // row-group stats see), and most partitions are tile-narrow in
    // BOTH dims (a sampled boundary may straddle one quadrant jump, so
    // assert the aggregate shape, not every box)
    val parts = laid
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), 6))
      .withColumn("pid", spark_partition_id())
    val sortedWithin = parts.rdd
      .mapPartitions { it =>
        val zs = it.map(_.getAs[Long]("z")).toSeq
        Iterator.single(zs == zs.sorted)
      }.collect()
    assert(sortedWithin.forall(identity), "z must be sorted within partitions")
    val boxes = parts.groupBy("pid")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    val tiles = boxes.count(b => b.getAs[Long]("sx") <= 31 && b.getAs[Long]("sy") <= 31)
    assert(tiles >= boxes.length / 2,
      s"only $tiles/${boxes.length} partitions are tile-narrow — layout is not z-clustered")
  }
}
