package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `format("sheet")` — DataSource V2 worksheet connector (SURVEY §2.1,
  * reference `publish.py:161-193`).
  *
  * Semantics mirror the Sheets sink: a write is always **clear + update**
  * (truncate + overwrite of one worksheet, header row included), the read
  * path serves the dry-run diff. Worksheets are tiny by construction
  * (reference creates 200×10 sheets), so executors ship their rows to the
  * driver via commit messages and the driver performs the single
  * "API call" — here a TSV file per worksheet under `path`, where a real
  * deployment would swap in the Sheets client without touching the plan.
  *
  * Row order: partition index then row order within partition — a sorted
  * DataFrame (range-partitioned) lands in the sheet in global order.
  */
class SheetDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sheet"

  // Writes may target a worksheet that doesn't exist yet: let Spark hand
  // us the query schema instead of requiring one inferred from disk.
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val file = SheetBackend.file(options.get("path"), options.get("worksheet"))
    if (Files.exists(file)) {
      val header = Files.readAllLines(file).asScala.headOption.getOrElse("")
      StructType(header.split("\t", -1).toIndexedSeq
        .filter(_.nonEmpty).map(StructField(_, StringType)))
    } else StructType(Nil)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SheetTable(schema, properties.get("path"), properties.get("worksheet"))
}

object SheetBackend {
  def file(path: String, worksheet: String): java.nio.file.Path = {
    require(path != null, "option 'path' is required")
    val ws = Option(worksheet).getOrElse("canonical")
    Paths.get(path, s"$ws.tsv")
  }

  /** Atomic truncate+overwrite, the `ws.clear(); ws.update(...)` pair. */
  def clearAndUpdate(path: String, worksheet: String,
      header: Seq[String], rows: Seq[Seq[String]]): Unit = {
    val f = file(path, worksheet)
    Files.createDirectories(f.getParent)
    val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
    val content = (header +: rows).map(_.mkString("\t")).mkString("\n") + "\n"
    Files.writeString(tmp, content)
    Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def readRows(path: String, worksheet: String): Seq[Seq[String]] = {
    val f = file(path, worksheet)
    if (!Files.exists(f)) Seq.empty
    else Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty)
      .map(_.split("\t", -1).toIndexedSeq)
  }
}

class SheetTable(schema: StructType, path: String, worksheet: String)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"sheet:${Option(worksheet).getOrElse("canonical")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          Array(SheetPartition(path, Option(worksheet).getOrElse("canonical")))
        override def createReaderFactory(): PartitionReaderFactory =
          new SheetReaderFactory(schema)
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new SheetWriteBuilder(info.schema(), path, Option(worksheet).getOrElse("canonical"))
}

case class SheetPartition(path: String, worksheet: String) extends InputPartition

class SheetReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SheetPartition]
    val rows = SheetBackend.readRows(sp.path, sp.worksheet).drop(1) // header
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      private var cur: Seq[String] = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow.fromSeq(
        schema.indices.map(i =>
          UTF8String.fromString(if (i < cur.length) cur(i) else "")))
      override def close(): Unit = ()
    }
  }
}

class SheetWriteBuilder(schema: StructType, path: String, worksheet: String)
    extends WriteBuilder with SupportsTruncate {
  // Every sheet write IS a truncate (clear+update) — accept and ignore.
  override def truncate(): WriteBuilder = this

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        new SheetWriterFactory(schema)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val rows = messages.collect { case m: SheetRowsMessage => m }
          .sortBy(_.partitionId).flatMap(_.rows).toSeq
        SheetBackend.clearAndUpdate(path, worksheet,
          schema.fieldNames.toIndexedSeq, rows)
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

case class SheetRowsMessage(partitionId: Int, rows: Seq[Seq[String]])
    extends WriterCommitMessage

class SheetWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ListBuffer[Seq[String]]()
      override def write(r: InternalRow): Unit =
        buf += schema.indices.map { i =>
          if (r.isNullAt(i)) ""
          else r.get(i, schema(i).dataType).toString
        }
      override def commit(): WriterCommitMessage = SheetRowsMessage(partitionId, buf.toList)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
