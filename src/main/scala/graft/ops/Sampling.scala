package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling primitives. All randomness is
  * content-derived (md5 of the row key), so every sample is a pure
  * function of the input — re-runs reproduce it byte-for-byte (the
  * replayability discipline the whole engine follows), and any
  * SQL engine can replay the draw for verification.
  */
object Sampling {

  /** Weighted sample WITHOUT replacement as a bottom-k sketch
    * (Cohen/Kaplan): row `id` holds `w` integer tickets; ticket i
    * draws key md5(id:i); the row's key is its MINIMUM ticket key;
    * the sample is the k smallest row keys. Equivalent to drawing
    * rows ticket-by-ticket without replacement, and the integer/
    * lexicographic twin of A-ES u^(1/w) priority sampling — chosen
    * because it needs no pow()/ln(), so keys compare exactly in any
    * engine. Adding tickets can only LOWER a row's key, so inclusion
    * is monotone in weight (spec-asserted).
    *
    * `w` is an integral Column; rows with w < 1 hold no tickets and
    * are EXCLUDED up front (the standard zero-weight semantics —
    * and a required guard: Spark's sequence(1, 0) would descend
    * [1, 0] and mint two phantom tickets where SQL engines'
    * generate_series(1, 0) is empty). Weights are the TICKET-count
    * resolution (cap them — cost is Σw exploded rows, a pure map).
    * Output: one row per input row in the sample — (id, w, key),
    * the k lexicographically-smallest keys, via TakeOrdered
    * (per-partition top-k + k-sized driver merge; no global sort,
    * no window). */
  def weightedBottomK(df: DataFrame, id: Column, w: Column, k: Int): DataFrame =
    df.select(id.as("id"), w.cast("long").as("w"))
      .filter(col("w") >= 1L)
      .select(col("id"), col("w"),
        explode(sequence(lit(1L), col("w"))).as("i"))
      .select(col("id"), col("w"),
        md5(concat(col("id").cast("string"), lit(":"),
          col("i").cast("string"))).as("k"))
      .groupBy("id", "w").agg(min("k").as("key"))
      .orderBy("key").limit(k)
}
