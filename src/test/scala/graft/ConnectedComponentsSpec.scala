package graft

import org.apache.spark.sql.functions._
import graft.ops.dedup.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation finds components across chains") {
    // two components: a 4-chain 1-2-3-4 (diameter 3 — needs real
    // propagation, not just one hop) and a pair 10-11
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comp = ConnectedComponents.minLabel(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("cycle converges and keeps min label") {
    val edges = Seq((5L, 6L), (6L, 7L), (7L, 5L)).toDF("id_a", "id_b")
    val comp = ConnectedComponents.minLabel(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("empty edge list yields empty labels") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(ConnectedComponents.minLabel(edges).count() == 0)
  }
}
