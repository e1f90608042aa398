package graft.v2

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** TEST-ONLY in-memory V2 catalog whose tables support ROW-LEVEL
  * OPERATIONS — the missing piece that lets the suite EXECUTE the
  * MERGE INTO statement [[graft.sinks.MergeSink]] emits, instead of
  * only asserting its text (no Delta/Iceberg ships in this sandbox).
  *
  * TWO row-level table shapes, selected per table via the
  * `rowlevel.mode` create property, so the emitted statement executes
  * through BOTH of Spark's MERGE rewrites:
  *
  *  - `group` (default): group-based operations (the copy-on-write
  *    posture): the operation's scan reads the whole table as one
  *    group with no row-id attributes, Spark plans a ReplaceData
  *    whose query is the complete post-merge contents, and the write
  *    COMMIT replaces the store wholesale — "rewrite every affected
  *    file" collapsed to one file.
  *  - `delta`: delta-based operations (the merge-on-read/positional
  *    posture, `SupportsDelta`): the table exposes a `_row_index`
  *    METADATA column as the row id, Spark plans a WriteDelta whose
  *    query tags each row with its operation, and the writer receives
  *    per-row delete(id)/update(id, row)/insert(row) calls — exactly
  *    the deletion-vector/positional-delete shape, applied to the
  *    store positionally at commit.
  *
  * Deliberately minimal, from the PUBLIC connector API only; rows
  * live in a JVM-global store (single-JVM local mode); reads
  * serialize the row arrays into the input partition, writes collect
  * per-task rows/deltas into the commit messages (catalyst values —
  * UTF8String etc. — all Serializable). Column pruning is supported
  * (the delta scan must emit the metadata row id); no other pushdown,
  * no namespaces beyond pass-through.
  */
object GraftMemStore {
  // key -> (schema, rows as catalyst-value arrays)
  val tables = new TrieMap[String, (StructType, Array[Array[Any]])]
  // key -> row-level mode ("group" | "delta")
  val modes = new TrieMap[String, String]
  def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  val RowIndexCol = "_row_index"
  val ModeProperty = "rowlevel.mode"
}

class GraftMemCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    GraftMemStore.tables.keys.toArray.map { k =>
      val parts = k.split('.'); Identifier.of(parts.dropRight(1), parts.last)
    }
  override def loadTable(ident: Identifier): Table = {
    val k = GraftMemStore.key(ident)
    GraftMemStore.tables.get(k) match {
      case Some((schema, _)) =>
        new GraftMemTable(k, schema, GraftMemStore.modes.getOrElse(k, "group"))
      case None =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    }
  }
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "partitioned mem tables not supported")
    val k = GraftMemStore.key(ident)
    val mode = Option(properties.get(GraftMemStore.ModeProperty)).getOrElse("group")
    require(mode == "group" || mode == "delta", s"bad ${GraftMemStore.ModeProperty}: $mode")
    GraftMemStore.tables.put(k, (schema, Array.empty))
    GraftMemStore.modes.put(k, mode)
    new GraftMemTable(k, schema, mode)
  }
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("alterTable")
  override def dropTable(ident: Identifier): Boolean = {
    GraftMemStore.modes.remove(GraftMemStore.key(ident))
    GraftMemStore.tables.remove(GraftMemStore.key(ident)).isDefined
  }
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("renameTable")

  // SupportsNamespaces: accept everything (flat store)
  override def listNamespaces(): Array[Array[String]] = Array(Array("ns"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    Array.empty
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    new util.HashMap[String, String]()
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit = ()
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = true
  override def namespaceExists(namespace: Array[String]): Boolean = true
}

class GraftMemTable(key: String, tableSchema: StructType, mode: String)
    extends Table with SupportsRead with SupportsWrite
    with SupportsRowLevelOperations with SupportsMetadataColumns {
  override def name(): String = key
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  // the positional row id the delta mode scans and writes against;
  // exposed in both modes (harmless for group tables — nothing
  // requests it there)
  override def metadataColumns(): Array[MetadataColumn] =
    Array(new MetadataColumn {
      override def name(): String = GraftMemStore.RowIndexCol
      override def dataType(): DataType = LongType
      override def isNullable: Boolean = false
    })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftMemScanBuilder(key, tableSchema)

  // plain writes (INSERT INTO / append) — append commit
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftMemWriteBuilder(key, info.schema(), replaceAll = false)

  // the row-level entry point: the group mode's operation scans the
  // table (one group) and its write REPLACES it; the delta mode's
  // operation is SupportsDelta — Spark plans WriteDelta and the
  // writer applies positional per-row deltas
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    if (mode == "delta")
      () => new RowLevelOperation with SupportsDelta {
        override def command(): RowLevelOperation.Command = info.command()
        override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
          new GraftMemScanBuilder(key, tableSchema)
        override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
          new GraftMemDeltaWriteBuilder(key, info.schema())
        override def requiredMetadataAttributes(): Array[NamedReference] =
          Array.empty
        override def rowId(): Array[NamedReference] =
          Array(Expressions.column(GraftMemStore.RowIndexCol))
      }
    else
      () => new RowLevelOperation {
        override def command(): RowLevelOperation.Command = info.command()
        override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
          new GraftMemScanBuilder(key, tableSchema)
        override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
          new GraftMemWriteBuilder(key, info.schema(), replaceAll = true)
        override def requiredMetadataAttributes(): Array[NamedReference] =
          Array.empty
      }
}

/** Column-pruning scan: the projection may name data columns in any
  * order and/or the [[GraftMemStore.RowIndexCol]] metadata column
  * (the delta mode's row id — emitted as the row's POSITION in the
  * store array, the in-memory stand-in for (file, offset)). */
class GraftMemScanBuilder(key: String, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan with Batch {
    private val out = required
    override def readSchema(): StructType = out
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      // column index per output field: data columns map to their
      // table position, the metadata row id to -1 (position sentinel)
      val proj = out.fieldNames.map {
        case GraftMemStore.RowIndexCol => -1
        case f => tableSchema.fieldIndex(f)
      }
      Array(GraftMemPartition(GraftMemStore.tables(key)._2, proj))
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftMemReaderFactory
  }
}

case class GraftMemPartition(rows: Array[Array[Any]],
                             proj: Array[Int]) extends InputPartition

class GraftMemReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val part = p.asInstanceOf[GraftMemPartition]
      private var i = -1
      override def next(): Boolean = { i += 1; i < part.rows.length }
      override def get(): InternalRow = new GenericInternalRow(
        part.proj.map(j => if (j == -1) i.toLong else part.rows(i)(j)))
      override def close(): Unit = ()
    }
}

/** Shared value extraction: copy the WHOLE row out of the writer's
  * reused buffer first (row.copy() gives the extracted values —
  * UTF8String, array, struct, binary views — a private backing
  * buffer), THEN extract; per-type copies would miss every
  * buffer-backed type except the one remembered. */
private[v2] object GraftMemRows {
  def extract(row: InternalRow, types: Array[DataType], off: Int): Array[Any] = {
    val stable = row.copy()
    val vals = new Array[Any](types.length)
    var i = 0
    while (i < types.length) {
      vals(i) = if (stable.isNullAt(i + off)) null
        else stable.get(i + off, types(i))
      i += 1
    }
    vals
  }
}

/** The write side reads rows with the WRITE schema Spark hands it
  * (a ReplaceData query's attribute order need not match the table's)
  * and reorders to the table's column order BY NAME at commit. */
class GraftMemWriteBuilder(key: String, writeSchema: StructType,
                           replaceAll: Boolean) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        new GraftMemWriterFactory(writeSchema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val tableSchema = GraftMemStore.tables(key)._1
        val idx = tableSchema.fieldNames.map(writeSchema.fieldIndex)
        val incoming = messages.flatMap(_.asInstanceOf[GraftMemCommit].rows)
          .map(r => idx.map(r))
        GraftMemStore.tables.updateWith(key) {
          case Some((schema, old)) =>
            Some((schema, if (replaceAll) incoming else old ++ incoming))
          case None => None
        }
        ()
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

case class GraftMemCommit(rows: Array[Array[Any]]) extends WriterCommitMessage

class GraftMemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      private val types = schema.fields.map(_.dataType)
      override def write(row: InternalRow): Unit = {
        // Group-based row-level writes PREPEND RowDeltaUtils.
        // OPERATION_COLUMN (an int: 5 = WRITE, 6 = WRITE_WITH_METADATA)
        // to the data columns — the writer contract is to consume the
        // marker and read the data at +1 (Spark's own test tables do
        // the same). Plain appends carry the bare data columns.
        val off = row.numFields - types.length
        require(off == 0 || (off == 1 && {
          val op = row.getInt(0)
          op == org.apache.spark.sql.catalyst.util.RowDeltaUtils.WRITE_OPERATION ||
            op == org.apache.spark.sql.catalyst.util.RowDeltaUtils.WRITE_WITH_METADATA_OPERATION
        }), s"unexpected write row shape: ${row.numFields} fields for " +
          s"${types.length} data columns")
        buf += GraftMemRows.extract(row, types, off)
      }
      override def commit(): WriterCommitMessage = GraftMemCommit(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

// ---------------- delta (positional) write path ----------------

/** One task's buffered positional deltas: deleted row indices,
  * (index → replacement values) updates, inserted values. */
case class GraftMemDeltaCommit(deletes: Array[Long],
                               updates: Array[(Long, Array[Any])],
                               inserts: Array[Array[Any]]) extends WriterCommitMessage

/** WriteDelta's writer/commit pair: per-row delete/update/insert by
  * the `_row_index` positional id, applied to the store at commit —
  * updates and deletes address the PRE-COMMIT array (every index was
  * read from this same snapshot: single-writer semantics, like a
  * lakehouse commit), inserts append after. */
class GraftMemDeltaWriteBuilder(key: String, writeSchema: StructType)
    extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new DeltaWrite {
    override def toBatch: DeltaBatchWrite = new DeltaBatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DeltaWriterFactory =
        new GraftMemDeltaWriterFactory(writeSchema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val all = messages.map(_.asInstanceOf[GraftMemDeltaCommit])
        val tableSchema = GraftMemStore.tables(key)._1
        val idx = tableSchema.fieldNames.map(writeSchema.fieldIndex)
        val deletes = all.flatMap(_.deletes).toSet
        val updates = all.flatMap(_.updates)
          .map { case (i, vals) => i -> idx.map(vals) }.toMap
        val inserts = all.flatMap(_.inserts).map(vals => idx.map(vals))
        GraftMemStore.tables.updateWith(key) {
          case Some((schema, old)) =>
            val kept = old.indices.iterator
              .filterNot(i => deletes.contains(i.toLong))
              .map(i => updates.getOrElse(i.toLong, old(i)))
              .toArray
            Some((schema, kept ++ inserts))
          case None => None
        }
        ()
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

class GraftMemDeltaWriterFactory(schema: StructType) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val types = schema.fields.map(_.dataType)
      private val deletes = scala.collection.mutable.ArrayBuffer.empty[Long]
      private val updates =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Any])]
      private val inserts = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        deletes += id.getLong(0)
      override def update(meta: InternalRow, id: InternalRow,
                          row: InternalRow): Unit =
        updates += (id.getLong(0) -> GraftMemRows.extract(row, types, 0))
      override def insert(row: InternalRow): Unit =
        inserts += GraftMemRows.extract(row, types, 0)
      override def commit(): WriterCommitMessage =
        GraftMemDeltaCommit(deletes.toArray, updates.toArray, inserts.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
