package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face of [[ArrowInterchange]] — `spark.read
  * .format("arrow-ipc").load(dir)`. The point over the function-style
  * reader: column pruning comes FROM THE PLAN. A `select`/projection
  * anywhere downstream reaches this scan as `SupportsPushDownRequiredColumns
  * .pruneColumns`, so the reader decodes exactly the projected vectors with
  * no API cooperation from the caller — the DSv2 analog of the reference
  * scan's `column_indices` pushdown (DataStreams/ParquetBlockInputStream
  * .cpp:33-38), and the same mechanism Spark's own parquet source uses.
  *
  * Scale shape: one `InputPartition` per IPC file (the natural parallel
  * unit — each file streams batch-by-batch, never loaded whole), executor-
  * side file opens through the Hadoop FS API (`file:`/`hdfs:`/`s3a:`),
  * decode straight to Catalyst internal values (no `Row` boxing →
  * `createDataFrame` round-trip). Every file header is validated by NAME
  * against the dataset schema with the offending path in the error; the
  * `_schema.arrows` sentinel + `_SUCCESS` completeness gate carry over
  * unchanged from [[ArrowInterchange.readStream]].
  */
class ArrowIpcSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "arrow-ipc"
  override def supportsExternalMetadata(): Boolean = true

  private def dir(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).orElse(Option(options.get("paths")))
    require(p.isDefined && p.get.nonEmpty,
      "arrow-ipc: a directory path is required — spark.read.format(\"arrow-ipc\").load(dir)")
    // .load(dir) passes a JSON array through "paths" for multi-path loads;
    // this source reads ONE dataset directory (one schema contract)
    val raw = p.get
    if (raw.startsWith("[")) {
      val inner = raw.stripPrefix("[").stripSuffix("]").split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      require(inner.length == 1, s"arrow-ipc: exactly one directory, got ${inner.length}")
      inner.head
    } else raw
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowInterchange.readSchema(SparkSession.active, dir(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ArrowIpcTable(schema,
      dir(new CaseInsensitiveStringMap(properties)))
}

private[sources] class ArrowIpcTable(tableSchema: StructType, dir: String)
    extends Table with SupportsRead {
  override def name(): String = s"arrow-ipc `$dir`"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowIpcScanBuilder(tableSchema, dir)
}

private[sources] class ArrowIpcScanBuilder(full: StructType, dir: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands back a subset of `full` in table-schema order; empty
    // (count(*)-style) is legal — the reader then just counts rows.
    required = requiredSchema
  override def build(): Scan = new ArrowIpcScan(required, dir)
}

private[sources] class ArrowIpcScan(required: StructType, dir: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"arrow-ipc $dir [${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    // same completeness gate as the function-style reader: our sentinel
    // without the job marker means a partial write — refuse, don't guess
    require(!fs.exists(new Path(dirPath, "_schema.arrows")) ||
      fs.exists(new Path(dirPath, "_SUCCESS")),
      s"Arrow interchange: $dir has a schema sentinel but no _SUCCESS marker " +
        "— the writing job did not complete; refusing to read partial data")
    val glob = new Path(dir, "part-*.arrows")
    Option(fs.globStatus(glob)).getOrElse(Array.empty)
      .map(st => ArrowFilePartition(st.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowIpcReaderFactory(required,
      new SerializableHadoopConf(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

private[sources] case class ArrowFilePartition(file: String) extends InputPartition

private[sources] class ArrowIpcReaderFactory(
    required: StructType, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ArrowIpcPartitionReader(
      partition.asInstanceOf[ArrowFilePartition].file, required, conf)
}

/** Streams one IPC file batch-by-batch, decoding only the required
  * columns into reused-nothing `GenericInternalRow`s. Pruned reads
  * tolerate extra (even unsupported-typed) columns in the file — the
  * validation covers exactly the projected set. */
private[sources] class ArrowIpcPartitionReader(
    file: String, required: StructType, conf: SerializableHadoopConf)
    extends PartitionReader[InternalRow] {

  private val alloc = new RootAllocator()
  private val reader = {
    val p = new Path(file)
    new ArrowStreamReader(p.getFileSystem(conf.value).open(p), alloc,
      CommonsCompressionFactory.INSTANCE)
  }
  private val root = reader.getVectorSchemaRoot
  private val cols: Array[Int] =
    try ArrowInterchange.resolveColumns(root.getSchema, required, file, exact = false)
    catch { case e: Throwable => closeQuietly(); throw e }
  private val types = required.fields.map(_.dataType)

  private var i = 0
  private var n = 0
  private var done = false
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (!done && i >= n) {
      if (reader.loadNextBatch()) { n = root.getRowCount; i = 0 }
      else done = true
    }
    if (done) return false
    val vals = new Array[Any](types.length)
    var c = 0
    while (c < types.length) {
      vals(c) = ArrowInterchange.getInternalValue(root.getVector(cols(c)), types(c), i)
      c += 1
    }
    current = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
    i += 1
    true
  }

  override def get(): InternalRow = current

  private def closeQuietly(): Unit =
    try { reader.close(); alloc.close() } catch { case _: Throwable => () }
  override def close(): Unit = closeQuietly()
}
