package graft

import org.apache.spark.sql.functions._
import graft.ops.Graphs

/** Triangle counting: hand-counted fixtures, brute-force equivalence
  * on a random graph, and robustness to dirty input (duplicates,
  * reversed edges, self-loops). */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-counted fixture: K4 plus a pendant") {
    // K4 on a,b,c,d has 4 triangles (every node in 3); pendant e-a in none
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("e", "a")).toDF("u", "v")
    val got = Graphs.triangleCounts(edges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("a") == ((4L, 3L, 0.5)), got.toString) // deg 4, 3 tris, 6/12
    Seq("b", "c", "d").foreach(n => assert(got(n) == ((3L, 3L, 1.0)), s"$n: ${got(n)}"))
    assert(got("e") == ((1L, 0L, 0.0)))
  }

  test("dirty input: duplicates, reversed orientation and self-loops collapse") {
    val clean = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("u", "v")
    val dirty = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"),
      ("c", "a"), ("a", "a")).toDF("u", "v")
    val g1 = Graphs.triangleCounts(clean).collect().map(_.toSeq).toSet
    val g2 = Graphs.triangleCounts(dirty).collect().map(_.toSeq).toSet
    assert(g1 == g2, "canonicalization must make the inputs equivalent")
    assert(g1.forall(r => r(2) == 1L), "one triangle, every node in it")
  }

  test("matches brute-force on a pseudo-random graph") {
    val n = 24
    val edges = (for {
      i <- 0 until n; j <- i + 1 until n
      if (i * 31 + j * 17) % 5 == 0
    } yield (s"n$i", s"n$j"))
    val df = edges.toDF("u", "v")
    val got = Graphs.triangleCounts(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // brute force
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = adj.map { case (node, nbrs) =>
      val t = nbrs.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      node -> t.toLong
    }
    assert(got == want)
    // total triangle identity: sum of per-node counts = 3 * #triangles
    assert(got.values.sum % 3 == 0)
  }

  test("kCorePeel: K4 core survives, pendant chain peels one layer per round") {
    // K4 (a,b,c,d) + chain d-e-f: e/f below k=2... with k=2 the whole
    // chain peels (f round 1, e round 2); K4 is the 2-core (deg 3 each)
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("d", "e"), ("e", "f")).toDF("u", "v")
    val got = Graphs.kCorePeel(edges, k = 2, rounds = 4).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), Option(r.get(2)), Option(r.get(3))))).toMap
    Seq("a", "b", "c", "d").foreach { n =>
      assert(got(n) == (("core", None, Some(3L))), s"$n: ${got(n)}") }
    assert(got("f") == (("peeled", Some(1), None)))
    assert(got("e") == (("peeled", Some(2), None)))
  }

  test("kCorePeel counts zero-degree stragglers as peelable") {
    // x-y-z path with k=2: round 1 peels x and z (deg 1); y then has
    // NO edges left — it must still be peeled (round 2), not linger
    // as a phantom 'core' node missing from the degree count
    val edges = Seq(("x", "y"), ("y", "z")).toDF("u", "v")
    val got = Graphs.kCorePeel(edges, k = 2, rounds = 3).collect()
      .map(r => r.getString(0) -> ((r.getString(1), Option(r.get(2))))).toMap
    assert(got("x") == (("peeled", Some(1))))
    assert(got("z") == (("peeled", Some(1))))
    assert(got("y") == (("peeled", Some(2))), s"straggler: ${got("y")}")
  }

  test("kCorePeel is dirty-input tolerant and idle past fixpoint") {
    val clean = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("u", "v")
    val dirty = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"),
      ("c", "a"), ("b", "b")).toDF("u", "v")
    val g1 = Graphs.kCorePeel(clean, 2, 2).collect().map(_.toSeq).toSet
    val g2 = Graphs.kCorePeel(dirty, 2, 5).collect().map(_.toSeq).toSet
    assert(g1 == g2, "canonicalization + idle rounds must not change the result")
    assert(g1.forall(r => r(1) == "core"))
  }
}
