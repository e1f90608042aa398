package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.domain.Fixtures

/** DataSource V2 provider exposing the deterministic domain fixtures
  * as a real Spark format:
  *
  *   spark.read.format("graft.sources.FixtureSource")
  *     .option("table", "modon").load()
  *
  * The §2.1 custom-source leg done the connector way (TableProvider →
  * ScanBuilder → Batch → PartitionReader) with BOTH optimizer
  * contracts implemented: SupportsPushDownRequiredColumns (column
  * pruning reaches the reader) and SupportsPushDownFilters
  * (equality/comparison/null predicates evaluated inside the
  * partition reader, reported as pushed in the scan description). In
  * a real deployment the reader would wrap the farm API / Oracle
  * extract; the contract with Catalyst is exactly this.
  */
class FixtureSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixtureSource.schemaOf(options.get("table"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FixtureTable(properties.get("table"))
}

object FixtureSource {
  def schemaOf(table: String): StructType = table match {
    case "modon" => Fixtures.modonSchema
    case "modon_wk" => Fixtures.modonWkSchema
    case "bunman" => Fixtures.bunmanSchema
    case "farm_config" => Fixtures.farmConfigSchema
    case other => throw new IllegalArgumentException(s"unknown fixture table: $other")
  }

  def rowsOf(table: String): Seq[org.apache.spark.sql.Row] = table match {
    case "modon" => Fixtures.generated.modon
    case "modon_wk" => Fixtures.generated.modonWk
    case "bunman" => Fixtures.generated.bunman
    case "farm_config" => Fixtures.farmConfig
    case other => throw new IllegalArgumentException(s"unknown fixture table: $other")
  }

  /** Evaluate a pushed source filter against a fixture Row by name. */
  def eval(f: Filter, schema: StructType, r: org.apache.spark.sql.Row): Boolean = {
    def v(attr: String): Any = r.get(schema.fieldIndex(attr))
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: Int, y: Number) => java.lang.Integer.compare(x, y.intValue())
      case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue())
      case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
      case (x: String, y: String) => x.compareTo(y)
      case _ => throw new IllegalArgumentException(s"uncomparable: $a vs $b")
    }
    // null comparands (e.g. col.isin(1, null)) evaluate to non-match,
    // mirroring SQL three-valued logic — never a reader crash
    def ok(a: String, x: Any)(p: Int => Boolean): Boolean =
      v(a) != null && x != null && p(cmp(v(a), x.asInstanceOf[AnyRef]))
    f match {
      case EqualTo(a, x) => ok(a, x)(_ == 0)
      case GreaterThan(a, x) => ok(a, x)(_ > 0)
      case GreaterThanOrEqual(a, x) => ok(a, x)(_ >= 0)
      case LessThan(a, x) => ok(a, x)(_ < 0)
      case LessThanOrEqual(a, x) => ok(a, x)(_ <= 0)
      case IsNotNull(a) => v(a) != null
      case IsNull(a) => v(a) == null
      case In(a, xs) => xs.exists(x => ok(a, x)(_ == 0))
      case And(l, rr) => eval(l, schema, r) && eval(rr, schema, r)
      case Or(l, rr) => eval(l, schema, r) || eval(rr, schema, r)
      case _ => true // unsupported filters are never accepted as pushed
    }
  }

  def supported(f: Filter): Boolean = f match {
    case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual | _: LessThan |
         _: LessThanOrEqual | _: IsNotNull | _: IsNull | _: In => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case _ => false
  }
}

class FixtureTable(tableName: String) extends Table with SupportsRead {
  override def name(): String = s"fixtures.$tableName"
  override def schema(): StructType = FixtureSource.schemaOf(tableName)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixtureScanBuilder(tableName,
      Option(options.get("rowsPerBatch")).map(_.toInt).getOrElse(50))
}

class FixtureScanBuilder(tableName: String, rowsPerBatch: Int = 50)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private val full = FixtureSource.schemaOf(tableName)
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full
  private var agg: Option[org.apache.spark.sql.connector.expressions.aggregate.Aggregation] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(FixtureSource.supported)
    pushed = ok
    rest // residual filters Spark must still evaluate
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) pushdown (the third optimizer contract), grouped or
    * global: a source that can answer counts from its metadata/cursor
    * returns one row per group instead of streaming the table. Scope:
    * a single COUNT(*) aggregate, group-by columns limited to plain
    * field references — everything else stays in Spark. */
  private def aggSupported(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    aggregation.aggregateExpressions.length == 1 &&
      aggregation.aggregateExpressions.head.isInstanceOf[CountStar] &&
      aggregation.groupByExpressions.forall {
        case f: NamedReference => f.fieldNames().length == 1
        case _ => false
      }
  }

  override def pushAggregation(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val ok = aggSupported(aggregation)
    if (ok) agg = Some(aggregation)
    ok
  }

  /** Complete (not partial) pushdown: the returned rows ARE the final
    * groups — correct here because the scan is a single partition.
    * Spark 4.x asks this BEFORE pushAggregation, so the decision must
    * evaluate the passed Aggregation itself — checking the `agg` field
    * would always answer false and silently degrade to partial
    * pushdown (a redundant final aggregate over one row per group). */
  override def supportCompletePushDown(
      aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    aggSupported(aggregation)

  override def build(): Scan =
    agg match {
      case Some(a) =>
        import org.apache.spark.sql.connector.expressions.NamedReference
        val groupCols = a.groupByExpressions.toSeq
          .map(_.asInstanceOf[NamedReference].fieldNames().head)
        new FixtureCountScan(tableName, full, pushed, groupCols)
      case None => new FixtureScan(tableName, full, required, pushed, rowsPerBatch)
    }
}

/** Scan answering a pushed (optionally grouped) COUNT(*): one row per
  * group, computed from the (filtered) fixture rows — no row
  * streaming into Spark. */
class FixtureCountScan(tableName: String, full: StructType,
                       pushed: Array[Filter], groupCols: Seq[String])
    extends Scan with Batch {
  import org.apache.spark.sql.types.{LongType, StructField}
  private val aggSchema = StructType(
    groupCols.map(c => full(full.fieldIndex(c))) :+ StructField("count(*)", LongType))
  override def readSchema(): StructType = aggSchema
  override def description(): String =
    s"FixtureCountScan($tableName) PushedAggregates: [COUNT(*)], " +
      s"PushedGroupBy: ${groupCols.mkString("[", ", ", "]")}, " +
      s"PushedFilters: ${pushed.mkString("[", ", ", "]")}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(FixturePartition(tableName, 0, 1))
  override def createReaderFactory(): PartitionReaderFactory =
    FixtureCountReaderFactory(full, pushed, groupCols)
}

/** Top-level (serializable) factory for the pushed-COUNT(*) reader —
  * an inner anonymous class would drag the Scan into the closure. */
case class FixtureCountReaderFactory(full: StructType, pushed: Array[Filter],
                                     groupCols: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val table = p.asInstanceOf[FixturePartition].tableName
      private val groupSchema = StructType(
        groupCols.map(c => full(full.fieldIndex(c))))
      private val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(groupSchema)
      private val it: Iterator[InternalRow] = {
        val rows = FixtureSource.rowsOf(table)
          .filter(r => pushed.forall(FixtureSource.eval(_, full, r)))
        val idx = groupCols.map(full.fieldIndex)
        rows.groupBy(r => idx.map(r.get)).iterator.map { case (key, grp) =>
          val keyRow = conv(org.apache.spark.sql.Row.fromSeq(key))
            .asInstanceOf[InternalRow]
          InternalRow.fromSeq(
            keyRow.toSeq(groupSchema) :+ grp.length.toLong)
        }
      }
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

class FixtureScan(tableName: String, full: StructType, required: StructType,
                  pushed: Array[Filter], rowsPerBatch: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"FixtureScan($tableName) PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(FixturePartition(tableName, 0, FixtureSource.rowsOf(tableName).length))
  override def createReaderFactory(): PartitionReaderFactory =
    new FixtureReaderFactory(full, required, pushed)

  /** Micro-batch face of the same scan: the fixture rows replayed in
    * offset-tracked chunks of `rowsPerBatch` — the arrival-simulation
    * form of the farm ingest (a real source would map offsets to an
    * API cursor / redo log position). Pushdown applies identically. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new FixtureMicroBatchStream(tableName, full, required, pushed, rowsPerBatch)
}

/** Row-range partition: [start, end) over the fixture row seq. */
case class FixturePartition(tableName: String, start: Int, end: Int)
    extends InputPartition

case class FixtureOffset(pos: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pos.toString
}

class FixtureMicroBatchStream(tableName: String, full: StructType,
                              required: StructType, pushed: Array[Filter],
                              rowsPerBatch: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val total = FixtureSource.rowsOf(tableName).length
  // Trigger.AvailableNow target: everything present when the query
  // started; batches drain toward it under the read limit
  private var target: Int = total
  override def prepareForTriggerAvailableNow(): Unit = target = total

  override def initialOffset(): Offset = FixtureOffset(0)
  override def latestOffset(): Offset = FixtureOffset(total)
  override def deserializeOffset(json: String): Offset = FixtureOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  // admission control: cap each micro-batch at rowsPerBatch rows —
  // the rate-limiting contract a real ingest source needs anyway
  // (and what makes Trigger.AvailableNow drain in several batches
  // instead of one giant one)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FixtureOffset].pos
    FixtureOffset(math.min(s + rowsPerBatch, target))
  }
  override def reportLatestOffset(): Offset = FixtureOffset(total)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FixtureOffset].pos
    val e = end.asInstanceOf[FixtureOffset].pos
    // one partition per rowsPerBatch chunk inside the offset range
    (s until e by rowsPerBatch)
      .map(lo => FixturePartition(tableName, lo, math.min(lo + rowsPerBatch, e)))
      .toArray[InputPartition]
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FixtureReaderFactory(full, required, pushed)
}

class FixtureReaderFactory(full: StructType, required: StructType,
                           pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FixturePartition]
    new PartitionReader[InternalRow] {
      private val idx = required.fields.map(f => full.fieldIndex(f.name))
      private val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToCatalystConverter(required)
      private val it = FixtureSource.rowsOf(p.tableName).iterator
        .slice(p.start, p.end)
        .filter(r => pushed.forall(FixtureSource.eval(_, full, r)))
        .map { r =>
          val pruned = org.apache.spark.sql.Row.fromSeq(idx.toIndexedSeq.map(r.get))
          conv(pruned).asInstanceOf[InternalRow]
        }
      private var cur: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
