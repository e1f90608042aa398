package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the reference's numeric invariants
  * (SURVEY §5) — exhaustive over small deterministic domains. */
class PropertySpec extends AnyFunSuite {

  test("round-half-up-1 (floor(x*10+0.5)/10) matches BigDecimal HALF_UP on positives") {
    var n = 0
    while (n < 100000) {
      val x = n / 100.0 // all 2-dec values in [0, 1000)
      val mine = math.floor(x * 10 + 0.5) / 10
      val bd = BigDecimal(x).setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mine == bd, s"x=$x mine=$mine bd=$bd")
      n += 1
    }
  }

  test("rolling hash equals direct polynomial on seeded random byte strings") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.ArrayData
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val len = rnd.nextInt(60)
      val s = new String(Array.fill(len)((32 + rnd.nextInt(95)).toChar))
      for (k <- Seq(1, 2, 5, 8)) {
        val got = graft.functions.RollingHash(
            org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(s)), k)
          .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
        val b = s.getBytes("UTF-8")
        val want = (0 to b.length - k).map { i =>
          var h = 0L
          for (j <- i until i + k) h = h * graft.functions.RollingHash.M + (b(j) & 0xffL)
          h
        }
        assert(got == want, s"len=$len k=$k")
      }
    }
  }

  test("pogae invariant: pogae = silsan - sdotae + yangja (farrowing.py:175-182)") {
    for (silsan <- 0 to 15; sdotae <- 0 to 5; ji <- 0 to 4; jc <- 0 to 4) {
      val yangja = ji - jc
      val pogae = silsan - sdotae + yangja
      assert(pogae == silsan - sdotae + ji - jc)
    }
  }

  test("bucket labels by upper edges partition the whole line") {
    val edges = Seq(3.0, 7.0, 10.0)
    val labels = Seq("a", "b", "c", "d")
    def label(x: Double): String =
      edges.zip(labels).collectFirst { case (e, l) if x <= e => l }.getOrElse(labels.last)
    for (n <- -5 to 30) {
      val x = n.toDouble
      val l = label(x)
      assert(labels.contains(l))
      assert((x > 10.0) == (l == "d"))
    }
  }

  test("fixture invariants: gapless SEQ per sow, transfers within [bun, eu]") {
    import graft.domain.Fixtures
    val bySow = Fixtures.generated.modonWk.groupBy(r => (r.getInt(0), r.getString(1)))
    bySow.foreach { case (_, rows) =>
      val seqs = rows.map(_.getInt(2)).sorted
      assert(seqs == (1 to seqs.size).toList, "SEQ must be gapless from 1")
    }
    Fixtures.generated.trans.foreach { t =>
      val wk = t.getString(5); val b = t.getString(8); val eu = t.getString(9)
      assert(b <= wk && wk <= eu, "transfer date must lie within [bun_dt, eu_dt]")
    }
    // every weaning row has a same-parity farrowing row behind it
    val bunKeys = Fixtures.generated.modonWk
      .filter(_.getString(4) == "B").map(r => (r.getInt(0), r.getString(1), r.getInt(5))).toSet
    Fixtures.generated.modonWk.filter(_.getString(4) == "E").foreach { e =>
      assert(bunKeys.contains((e.getInt(0), e.getString(1), e.getInt(5))),
        "weaning without same-parity farrowing")
    }
  }
}
