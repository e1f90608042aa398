package graft.ops

import org.apache.spark.sql.DataFrame

/** Eager materialization into a plan LEAF with DETERMINISTIC storage
  * release — the shared machinery behind ConnectedComponents'
  * superstep checkpoints and DistributedRank's materialize-once input
  * (expensive iterative upstreams under a range shuffle).
  *
  * leafCache = `localCheckpoint(eager = true)`: downstream plans see a
  * LogicalRDD leaf (no re-analysis of the upstream tree, no
  * re-execution of the upstream jobs) backed by stored InternalRows.
  * release() frees those blocks NOW instead of pinning them until some
  * future driver GC lets ContextCleaner run — the difference between a
  * bounded-storage loop and a slow leak in a long-lived session.
  *
  * Durability caveat: localCheckpoint trades lineage recoverability
  * away — an executor loss after release fails the job instead of
  * recomputing. On a cluster, a reliable checkpoint()/staging table is
  * the durable variant. */
object Materialize {

  /** Materialize `df` eagerly into a lineage-free leaf. Pair with
    * [[release]] once the frame's DATA is no longer needed. */
  def leafCache(df: DataFrame): DataFrame =
    df.localCheckpoint(true)

  /** Collect `df` into a self-contained LOCAL relation: the returned
    * frame pins nothing — no cached/checkpointed blocks, no upstream
    * lineage — so query-shaped callers that cannot release() after
    * their consumer's action get deterministic cleanup anyway (the
    * minLabelLocalized discipline). ONLY for corpus-SUBLINEAR results
    * (verified near-dup pairs, component labels, per-group reports);
    * at cluster scale the localize step becomes a staging-table
    * write + release instead of a driver materialization, and the
    * local relation broadcast-joins downstream for free. */
  def localize(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Free a leafCache'd frame's stored blocks NOW. Only safe once the
    * frame's data is no longer needed (consumer's action finished, or
    * the data provably lives on elsewhere — e.g. in already-written
    * shuffle files whose stages will be skipped).
    *
    * Fails LOUDLY (stderr; an exception is avoided — a release is
    * cleanup, not a correctness step) if the plan shape is not the
    * LogicalRDD leaf localCheckpoint(true) produces: a Spark upgrade
    * that changes the shape would otherwise turn every call into a
    * silent storage leak — the exact pinning problem this object
    * exists to prevent. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case other =>
        System.err.println(
          "[graft.Materialize] release() expected a LogicalRDD leaf " +
            s"but saw ${other.getClass.getSimpleName}: the " +
            "localCheckpoint plan shape changed and checkpoint storage " +
            "is now being LEAKED until driver GC. Fix release() for " +
            "this Spark version.")
    }
}
