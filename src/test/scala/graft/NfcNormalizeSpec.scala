package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.NfcNormalize

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("composes canonical sequences; idempotent; ASCII untouched by reference") {
    val dec = UTF8String.fromString("café")
    assert(NfcNormalize.normalize(dec).toString == "caf\u00E9")
    // idempotence: normalizing an already-NFC string is a no-op value-wise
    val once = NfcNormalize.normalize(dec)
    assert(NfcNormalize.normalize(once).toString == once.toString)
    // ASCII fast path returns the SAME object — no allocation
    val ascii = UTF8String.fromString("plain ascii")
    assert(NfcNormalize.normalize(ascii) eq ascii)
    // Hangul jamo compose to the precomposed syllable
    assert(NfcNormalize.normalize(
      UTF8String.fromString("각")).toString == "\uAC01")
    // supplementary-plane text (surrogate pair) passes through unharmed
    val emoji = UTF8String.fromString("ok 😀 é")
    assert(NfcNormalize.normalize(emoji).toString == "ok \uD83D\uDE00 \u00E9")
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    val df = Seq(Some("café"), Some("café"), Some("x"), None)
      .toDF("s").select(NfcNormalize.nfc(col("s")).as("n"))
    val got = df.collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("caf\u00E9"), Some("caf\u00E9"), Some("x"), None))
    // the expression must sit INSIDE WholeStageCodegen, not break it —
    // over a parquet scan (a local Seq constant-folds to LocalTableScan
    // via ConvertToLocalRelation, which exercises only the interpreted
    // path; the check above already covered that path's values)
    val scan = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(NfcNormalize.nfc(col("text")).as("n"))
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString
    // "*(1)" is the WholeStageCodegen stage marker in simpleString form
    assert(plan.linesIterator.next().startsWith("*("), plan)
    // dedup motivation: both surface forms land in ONE group after nfc
    val groups = Seq("café", "café")
      .toDF("s").groupBy(NfcNormalize.nfc(col("s"))).count().collect()
    assert(groups.length == 1 && groups(0).getLong(1) == 2L)
  }
}
