package graft.v2

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** TEST-ONLY in-memory V2 catalog whose tables support ROW-LEVEL
  * OPERATIONS — the missing piece that lets the suite EXECUTE the
  * MERGE INTO statement [[graft.sinks.MergeSink]] emits, instead of
  * only asserting its text (no Delta/Iceberg ships in this sandbox).
  *
  * Deliberately minimal, from the PUBLIC connector API only:
  *  - group-based row-level operations (the Delta/Iceberg
  *    copy-on-write posture): the operation's scan reads the whole
  *    table as one group with no metadata/row-id attributes, so
  *    Spark's MERGE rewrite plans a ReplaceData whose query is the
  *    complete post-merge contents, and the operation's write COMMIT
  *    replaces the store wholesale — exactly "rewrite every affected
  *    file" collapsed to one file.
  *  - rows live in a JVM-global store (single-JVM local mode); reads
  *    serialize the row arrays into the input partition, writes
  *    collect per-task rows into the commit messages (catalyst
  *    values — UTF8String etc. — all Serializable).
  *  - no pruning, no pushdown, no namespaces beyond pass-through:
  *    none of that is what the contract test exercises.
  */
object GraftMemStore {
  // key -> (schema, rows as catalyst-value arrays)
  val tables = new TrieMap[String, (StructType, Array[Array[Any]])]
  def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")
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
      case Some((schema, _)) => new GraftMemTable(k, schema)
      case None =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    }
  }
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "partitioned mem tables not supported")
    val k = GraftMemStore.key(ident)
    GraftMemStore.tables.put(k, (schema, Array.empty))
    new GraftMemTable(k, schema)
  }
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("alterTable")
  override def dropTable(ident: Identifier): Boolean =
    GraftMemStore.tables.remove(GraftMemStore.key(ident)).isDefined
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

class GraftMemTable(key: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite with SupportsRowLevelOperations {
  override def name(): String = key
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftMemScanBuilder(key, tableSchema)

  // plain writes (INSERT INTO / append) — append commit
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftMemWriteBuilder(key, info.schema(), replaceAll = false)

  // the row-level entry point: group-based MERGE/UPDATE/DELETE — the
  // operation scans the table (one group) and its write REPLACES it
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
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

class GraftMemScanBuilder(key: String, schema: StructType) extends ScanBuilder {
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = schema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(GraftMemPartition(GraftMemStore.tables(key)._2))
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftMemReaderFactory
  }
}

case class GraftMemPartition(rows: Array[Array[Any]]) extends InputPartition

class GraftMemReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val rows = p.asInstanceOf[GraftMemPartition].rows
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i))
      override def close(): Unit = ()
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
        // copy the WHOLE row out of the writer's reused buffer first
        // (row.copy() gives the extracted values — UTF8String, array,
        // struct, binary views — a private backing buffer), THEN
        // extract: per-type copies would miss every buffer-backed
        // type except the one remembered
        val stable = row.copy()
        val vals = new Array[Any](types.length)
        var i = 0
        while (i < types.length) {
          vals(i) = if (stable.isNullAt(i + off)) null
            else stable.get(i + off, types(i))
          i += 1
        }
        buf += vals
      }
      override def commit(): WriterCommitMessage = GraftMemCommit(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
