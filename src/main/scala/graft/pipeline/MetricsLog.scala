package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-job/stage instrumentation as a queryable table — the Spark
  * answer to the reference's ELAPSED_MS rows persisted to
  * TS_INS_JOB_LOG (farm_processor.py:131-139, orchestrator.py:
  * 1087-1104, SURVEY §4 "optional listener -> log table"): a
  * SparkListener accumulates job/stage wall-clock and task metrics,
  * `snapshot` renders them as a DataFrame for the same
  * `Sinks.appendJobLog`-style sink the run log uses.
  *
  * Listener callbacks are driver-side and O(#stages) — no effect on
  * executor work at any scale.
  */
object MetricsLog {
  // top-level (not inner) so Spark can derive Encoders for toDF
  final case class StageRow(stageId: Int, name: String, numTasks: Int,
                            runTimeMs: Long, cpuTimeMs: Long,
                            shuffleReadBytes: Long, shuffleWriteBytes: Long,
                            spillBytes: Long)
  final case class JobRow(jobId: Int, submittedMs: Long, completedMs: Long)
}

class MetricsLog extends SparkListener {
  import MetricsLog.{JobRow, StageRow}

  private val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
  private val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
  private val jobs = new java.util.concurrent.ConcurrentLinkedQueue[JobRow]()

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val m = si.taskMetrics
    stages.add(StageRow(si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks,
      m.executorRunTime, m.executorCpuTime / 1000000L,
      m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
      m.memoryBytesSpilled + m.diskBytesSpilled))
  }

  override def onJobStart(js: SparkListenerJobStart): Unit =
    jobStarts.put(js.jobId, js.time)

  override def onJobEnd(je: SparkListenerJobEnd): Unit = {
    val t0 = Option(jobStarts.remove(je.jobId)).getOrElse(je.time)
    jobs.add(JobRow(je.jobId, t0, je.time))
  }

  /** Install on a session's SparkContext; returns this for chaining. */
  def install(spark: SparkSession): MetricsLog = {
    spark.sparkContext.addSparkListener(this)
    this
  }

  /** Collected stage metrics as a DataFrame (drain-free snapshot). */
  def stageSnapshot(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    stages.asScala.toSeq.toDF()
  }

  /** Collected job wall-clocks as a DataFrame. */
  def jobSnapshot(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    jobs.asScala.toSeq.map(j => (j.jobId, j.submittedMs, j.completedMs,
      j.completedMs - j.submittedMs)).toDF("job_id", "submitted_ms", "completed_ms", "elapsed_ms")
  }
}
