package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-init delete policies for the weekly batch
  * (`/root/reference/run_etl.py:56-60`,
  * `/root/reference/src/weekly/orchestrator.py:758-884`
  * `_delete_existing_master`): the data-protection guards and the
  * cascade order the reference runs before a test re-run.
  *
  * Policy (reference-exact):
  *   - not test mode, or test mode without a flag -> delete NOTHING
  *     (production-data protection; both guards short-circuit).
  *   - --test --init-week -> doomed masters are those matching
  *     (year, week_no); --test --init-all -> every master.
  *   - week / week_sub / job_log rows under a doomed master are
  *     deleted — restricted to `farms` when given.
  *   - --init-week: a doomed MASTER row is deleted only when NO week
  *     rows remain under it (the reference checks COUNT(*) after the
  *     farm-scoped deletes; with no farm list that is always zero, so
  *     the master always goes).
  *   - --init-all WITH a farm list: masters are NEVER deleted — the
  *     reference's `_delete_all_test_data` (orchestrator.py:730-731)
  *     simply skips the master delete when farm_list is given, even
  *     for masters whose week rows all fell to the farm-scoped
  *     cascade. Only the no-farm init_all run clears masters.
  *
  * Batch-engine formulation: deletion = anti-join retention. Each
  * table's retained frame is one broadcast join against the doomed
  * master set (masters are few); the master-retention rule is a
  * semi-join against the retained week rows. No row comparison, no
  * driver loops — on parquet these frames feed partition-overwrite
  * writes (S5), on Delta/Iceberg they become DELETE WHERE. */
object ReInit {

  /** The four report tables of the cascade. */
  final case class Frames(master: DataFrame, week: DataFrame,
                          weekSub: DataFrame, jobLog: DataFrame)

  def reInit(f: Frames, year: Int, weekNo: Int, farms: Option[Seq[Int]],
             testMode: Boolean, initAll: Boolean, initWeek: Boolean): Frames = {
    if (!testMode || (!initAll && !initWeek)) return f
    val doomed = (if (initAll) f.master
                  else f.master.filter(col("report_year") === year &&
                    col("report_week_no") === weekNo))
      .select(col("master_seq")).distinct()

    // retained = NOT (row's master doomed AND row's farm in scope).
    // NULL farm_no must SURVIVE a farm-scoped delete: the reference's
    // `DELETE ... WHERE farm_no IN (1,3)` never matches NULL (SQL
    // three-valued logic), so the coalesce pins the in-scope test to
    // false for NULL rather than letting the OR go null and drop the
    // row.
    def cut(df: DataFrame): DataFrame = farms match {
      case None => df.join(broadcast(doomed), Seq("master_seq"), "left_anti")
      case Some(fs) =>
        df.join(broadcast(doomed.withColumn("__doomed", lit(1))),
            Seq("master_seq"), "left")
          .filter(col("__doomed").isNull ||
            !coalesce(col("farm_no").isin(fs.map(Int.box): _*), lit(false)))
          .drop("__doomed")
    }
    val week = cut(f.week)
    val master =
      if (initAll && farms.isDefined) f.master
      // init_week: a doomed master survives only while week rows still
      // reference it (farm-scoped deletes can leave survivors)
      else {
        val stillUsed = week.select(col("master_seq")).distinct()
        f.master.join(broadcast(doomed), Seq("master_seq"), "left_anti")
          .unionByName(f.master
            .join(broadcast(doomed), Seq("master_seq"), "left_semi")
            .join(broadcast(stillUsed), Seq("master_seq"), "left_semi"))
      }
    Frames(master, week, cut(f.weekSub), cut(f.jobLog))
  }
}
