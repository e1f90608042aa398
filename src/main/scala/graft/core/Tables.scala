package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the fixture tables (TESTDATA.md).
  *
  * Mirrors the reference's scan layer (`/root/reference/src/weekly/
  * data_loader.py:209-277`): every load is a plain table read with
  * pushed-down predicates; here Catalyst does the pushdown, so readers
  * stay bare and filters live at the call site.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** events.ts arrives in one of two physical encodings, by testdata
    * generation vintage:
    *   - TIMESTAMP(NANOS), which Spark 4 refuses by default — read as
    *     a long (legacy flag) and floor-divide to microseconds,
    *     matching DuckDB's ns->us truncation so the oracle compares
    *     equal;
    *   - TIMESTAMP(MICROS) (isAdjustedToUTC=false -> inferred
    *     TIMESTAMP_NTZ) — cast to the session TIMESTAMP type; with
    *     the UTC session every query/oracle sees identical instants.
    * Dispatch is on the READ schema, so either vintage of the parquet
    * works unchanged.
    *
    * The flag is an INTENTIONAL session-global toggle: the driver's
    * harness calls `SparkEntry.queries` on a session it builds itself,
    * so the flag cannot be assumed preset. Setting it here is
    * idempotent (every caller wants `true`, and our own mains/specs
    * also set it at session build), but it does flip read behavior of
    * nanos-parquet for anything else sharing the session. */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ != "true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long vintage
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000"))
      case _ => // micros vintage (NTZ or LTZ)
        org.apache.spark.sql.functions.col("ts").cast("timestamp")
    }
    raw.withColumn("ts", ts)
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
