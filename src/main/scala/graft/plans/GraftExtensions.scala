package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Library extension entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` registers the
  * custom planner strategies at session build (the deployment-grade
  * route; `TopKPerKey.install` is the programmatic equivalent for an
  * already-built session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerKey.TopKStrategy)
    ext.injectOptimizerRule(_ => RewriteWindowTopK)
  }
}
