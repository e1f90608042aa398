package graft

import graft.devtools.RecallSweep

/** ANN serving QUALITY: the recall-vs-knob sweep (round-14 verdict
  * task 1) pinned in the suite at sf0.001 scale. The planted-twin
  * fixture gives every probe 10 true neighbors at ~0.85 cosine whose
  * cloud straddles IVF cells, so exact brute-force truth is the
  * planted structure and recall measures the index, not the noise
  * floor. Asserts the three knob monotonicities (shortlist exact,
  * nprobe on shortlist > k slices, wSuper across builds) and the
  * documented operating point (wSuper=2, nprobe=8, shortlist=200)
  * at recall@10 ≥ 0.9. The sf1 frontier lives in SCALE.md
  * (devtools.RecallSweep main). */
class RecallSweepSpec extends SparkSpec {

  test("recall is monotone in each knob and >= 0.9 at the operating point") {
    val fixDir = java.nio.file.Files.createTempDirectory("recall_spec").toString
    RecallSweep.plantFixture(spark, "/root/testdata/sf0.001", fixDir,
      nProbes = 50)
    val pts = RecallSweep.sweep(spark, fixDir, k = 10,
      wSupers = Seq(1, 2), nprobes = Seq(1, 2, 8), shortlists = Seq(10, 50, 200),
      log = _ => ())
    assert(pts.size == 18)
    val breaches = RecallSweep.monotoneBreaches(pts, k = 10)
    assert(breaches.isEmpty, breaches.mkString("\n"))
    // the knobs must SEPARATE (a sweep over a flat surface proves
    // nothing): the weakest point is materially below the strongest
    val weakest = pts.find(p => p.wSuper == 1 && p.nprobe == 1 && p.shortlist == 10).get
    val op = pts.find(p => p.wSuper == 2 && p.nprobe == 8 && p.shortlist == 200).get
    assert(op.recall >= 0.9, s"operating point recall ${op.recall} below 0.9")
    assert(op.recall - weakest.recall >= 0.2,
      s"knobs do not separate: weakest ${weakest.recall} vs op ${op.recall}")
  }
}
