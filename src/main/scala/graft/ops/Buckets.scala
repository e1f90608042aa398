package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Histogram bucketing (SURVEY A7).
  *
  * Reference: return-interval buckets for the mating chart
  * (`/root/reference/src/weekly/processors/mating.py:258-267,380-421`),
  * elapsed-day buckets (`accident.py:291-371`), delay buckets
  * (`alert.py:188-204`). All are closed-form chained CASE expressions —
  * codegen-friendly, no UDF.
  */
object Buckets {

  /** Label `c` by upper-inclusive edges: value <= edges(i) -> labels(i),
    * else labels.last (the open top bucket). labels.size == edges.size+1. */
  def byUpperEdges(c: Column, edges: Seq[Double], labels: Seq[String]): Column = {
    require(labels.size == edges.size + 1, "labels must have one more entry than edges")
    edges.zip(labels).foldRight(lit(labels.last): Column) {
      case ((edge, label), acc) => when(c <= edge, label).otherwise(acc)
    }
  }
}
