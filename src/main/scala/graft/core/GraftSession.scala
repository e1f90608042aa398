package graft.core

import org.apache.spark.sql.SparkSession

/** The library's session front door: one place for the settings every
  * graft deployment needs, so Verify/Bench/tests/user code cannot
  * drift apart.
  *
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` registers
  *    the custom strategy + the window-top-k rewrite at session build
  *    (the only route that covers SQL-only users too);
  *  - nanos-parquet read flag for the events table;
  *  - UTC session timezone (the cross-engine determinism contract);
  *  - shuffle partitions default from the core count (cluster
  *    deployments override with a higher count + AQE coalescing).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session sized to the machine (tests / single-node runs). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).config("spark.ui.enabled", "false").getOrCreate()
}
