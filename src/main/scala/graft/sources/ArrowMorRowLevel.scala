package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DataWriter, DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationInfo, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** Row-level DML as MERGE-ON-READ position deltas — Spark's
  * `SupportsDelta` protocol (the same public API Iceberg's position
  * deltas ride) wired to [[ArrowDeleteVectors]]. Where the group-based
  * COW operation rewrites every affected file in full, this one ships
  * per-ROW effects:
  *
  *  - DELETE: each matching row's `(_file, _pos)` → cumulative deletion
  *    vectors, O(deleted rows) of sidecar metadata, zero rewrite
  *    ([[ArrowMorDeltaWrite]]);
  *  - UPDATE / MERGE (`representUpdateAsDeleteAndInsert`): an updated
  *    row is a position delete of its OLD image plus an insert of its
  *    NEW image into a fresh appended file; not-matched MERGE rows are
  *    plain inserts. Unchanged rows in touched files are NEVER
  *    rewritten — the statement's cost is O(changed rows), not
  *    O(affected file bytes) ([[ArrowMorUpdateWrite]]).
  *
  * The update commit is ATOMIC: inserts stage as a complete hidden
  * dataset (`.mor-<id>/`, own sentinel + stats + blooms via the ordinary
  * batch write, clustered on the standing layout keys), and ONE
  * intent/latch/replay commit lands staged files, new vector gens and
  * the snapshot delta together ([[ArrowDeleteVectors.commitDelta]]) —
  * a crash anywhere replays to completion; readers never see inserts
  * without their paired deletes (that would be DUPLICATE rows).
  *
  * Routing: `spark.graft.arrow.deleteMode` / `updateMode` / `mergeMode`
  * = `cow` (default) | `mor`. Provable whole-file DELETEs still take
  * the metadata path first; the caps guard bulk statements toward COW,
  * whose cost amortizes there.
  *
  * Beyond-reference by construction: the reference's write side is a
  * blind append (arrow_clickhouse ParallelInputsSink — no mutation
  * story at all); this is the public Spark `SupportsDelta` connector
  * API over [[ArrowDeleteVectors]]'s snapshot-log/OCC substrate, with
  * Delta Lake's deletion vectors and Iceberg's position deltas as the
  * shape precedents. */
private[sources] class ArrowMorOperation(
    schema: StructType, dir: String, info: RowLevelOperationInfo)
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  override def command(): RowLevelOperation.Command = info.command
  override def description(): String = s"arrow-ipc MOR ${info.command} $dir"

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder =
    new ArrowIpcScanBuilder(schema, dir)

  /** Position-based row identity: the `_file`/`_pos` metadata columns —
    * stable because data files are immutable. */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(ArrowRowLevel.FileColumn),
      Expressions.column(ArrowRowLevel.PosColumn))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty // (file, pos) is the complete delete payload

  /** An UPDATE is a delete of the old image + an insert of the new one —
    * the position-delta representation (Iceberg's choice too): the
    * writer never needs in-place row mutation. */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newWriteBuilder(
      writeInfo: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        if (info.command == RowLevelOperation.Command.DELETE)
          new ArrowMorDeltaWrite(dir)
        else new ArrowMorUpdateWrite(schema, dir, writeInfo)
    }
}

/** One task's deleted positions, keyed by the scan's `_file` constants;
  * `inner` carries the staged-insert commit message when the command
  * writes rows (UPDATE/MERGE). */
private[sources] case class ArrowMorDeltaCommit(
    perFile: Map[String, Array[Long]],
    inner: Option[WriterCommitMessage] = None) extends WriterCommitMessage

/** DELETE-only delta write: positions in, vectors out — nothing staged
  * before the commit tail. */
private[sources] class ArrowMorDeltaWrite(dir: String)
    extends DeltaWrite with DeltaBatchWrite {

  override def toBatch: DeltaBatchWrite = this
  override def description(): String = s"arrow-ipc MOR delta DELETE $dir"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    // converge any crashed swap before this statement's scan-side work
    // lands on a half-replayed directory (same head as every DML path)
    ArrowMaintenance.recover(SparkSession.active, dir)
    val cap = ArrowDeleteVectors.morMaxRows
    new DeltaWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long)
          : DeltaWriter[InternalRow] = new ArrowMorDeltaWriter(cap, None)
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    // dedupe/sort/cap/stage/validate/intent/replay — the shared tail; a
    // lost OCC race surfaces as CommitConflictException, which
    // ArrowDml's transparent retry re-plans (statements issued through
    // it compose with this path unchanged)
    ArrowDeleteVectors.commitDeletes(SparkSession.active, dir,
      ArrowMorUpdateWrite.mergedPositions(messages))

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  // nothing persisted before commit: positions live in the messages
}

/** UPDATE/MERGE delta write: deletes collect as positions, inserts run
  * through an ordinary batch write pointed at the hidden staging dir
  * (standing layout keys + blooms preserved, like the COW rewrite); the
  * commit lands both through ONE crash-safe vector commit. */
private[sources] class ArrowMorUpdateWrite(
    schema: StructType, dir: String, writeInfo: LogicalWriteInfo)
    extends DeltaWrite with DeltaBatchWrite
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  private val dirPath = new Path(dir)
  private def fs = dirPath.getFileSystem(
    SparkSession.active.sparkContext.hadoopConfiguration)

  private val stagingName =
    ".mor-" + java.util.UUID.randomUUID.toString.take(8)

  // standing layout + blooms, read once at write planning — the inserts
  // keep the directory's clustering and pruning capability (the COW
  // write's own derivation)
  private val (standingKeys, standingHive, standingBlooms) = {
    val f = fs
    val keys = ArrowLayout.read(f, dirPath)
    val hive = ArrowHiveLayout.read(f, dirPath)
    val blooms = ArrowFileStats.read(f, dirPath).values
      .flatMap(_.cols.collect { case (n, c) if c.bloom.isDefined => n })
      .toSet.intersect(schema.fieldNames.toSet)
    (keys, hive, blooms)
  }

  private val inner = new ArrowIpcWrite(writeInfo.schema(),
    new Path(dirPath, stagingName).toString, None, writeInfo.queryId(),
    false, standingKeys, standingHive, standingBlooms)

  override def toBatch: DeltaBatchWrite = this
  override def description(): String =
    s"arrow-ipc MOR delta UPDATE/MERGE $dir staging=$stagingName"

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    inner.requiredDistribution()
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    inner.requiredOrdering()

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    ArrowMaintenance.recover(SparkSession.active, dir)
    ArrowDeleteVectors.sweepStaleStaged(fs, dirPath)
    val cap = ArrowDeleteVectors.morMaxRows
    val innerFactory = inner.createBatchWriterFactory(info)
    new DeltaWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long)
          : DeltaWriter[InternalRow] =
        new ArrowMorDeltaWriter(cap,
          Some(innerFactory.createWriter(partitionId, taskId)))
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val innerMsgs = messages.collect {
      case ArrowMorDeltaCommit(_, Some(m)) => m
    }
    try {
      // staging becomes a complete dataset (sentinel, stats, _SUCCESS) —
      // the live directory is untouched and readable until the swap
      inner.commit(innerMsgs)
      ArrowDeleteVectors.commitDelta(SparkSession.active, dir,
        ArrowMorUpdateWrite.mergedPositions(messages), stagingName)
    } catch {
      case e: Throwable =>
        scala.util.Try(fs.delete(new Path(dirPath, stagingName), true))
        throw e
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    inner.abort(messages.collect { case ArrowMorDeltaCommit(_, Some(m)) => m })
    fs.delete(new Path(dirPath, stagingName), true)
  }
}

private[sources] object ArrowMorUpdateWrite {
  /** Merge every task's per-file deleted positions, enforcing the
    * STATEMENT-LEVEL cap incrementally while folding: the per-task cap
    * ([[ArrowMorDeltaWriter]]) bounds each message, but N tasks each
    * just under it could otherwise accumulate N×cap Longs in this map
    * before any check fired — the fold aborts the moment the running
    * total crosses the cap, so the merged structure never materializes
    * past cap+1 positions on the driver. */
  def mergedPositions(messages: Array[WriterCommitMessage])
      : Array[(String, Array[Long])] = {
    val cap = ArrowDeleteVectors.morMaxRows
    var total = 0L
    val merged = scala.collection.mutable.HashMap.empty[String,
      scala.collection.mutable.ArrayBuffer[Long]]
    messages.foreach {
      case ArrowMorDeltaCommit(perFile, _) =>
        perFile.foreach { case (f, ps) =>
          total += ps.length
          require(total <= cap,
            s"arrow-ipc MOR delta: statement matched more than " +
              s"spark.graft.arrow.morMaxDeletedRows=$cap rows across its " +
              "tasks — use the COW path (deleteMode/updateMode/" +
              "mergeMode=cow), whose cost amortizes at that scale")
          merged.getOrElseUpdate(f,
            scala.collection.mutable.ArrayBuffer.empty[Long]) ++= ps
        }
      case other => throw new IllegalStateException(
        s"arrow-ipc MOR delta: unexpected commit message $other")
    }
    merged.iterator.map { case (f, b) => (f, b.toArray) }.toArray
  }
}

/** Task-side collector: `delete(meta, id)` appends the row's position to
  * its file's buffer; `insert(row)` (UPDATE/MERGE only) runs through the
  * staged batch writer. Memory is O(task's deleted rows), guarded by the
  * statement cap so a runaway predicate fails in the task, not as a
  * driver OOM. */
private[sources] class ArrowMorDeltaWriter(
    cap: Long, insertWriter: Option[DataWriter[InternalRow]])
    extends DeltaWriter[InternalRow] {

  private val perFile = scala.collection.mutable.HashMap.empty[String,
    scala.collection.mutable.ArrayBuffer[Long]]
  private var total = 0L

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(0).toString
    val pos = id.getLong(1)
    perFile.getOrElseUpdate(file,
      scala.collection.mutable.ArrayBuffer.empty[Long]) += pos
    total += 1
    require(total <= cap,
      s"arrow-ipc MOR delta: this task alone matched more than " +
        s"spark.graft.arrow.morMaxDeletedRows=$cap rows — use the COW " +
        "path (deleteMode/updateMode/mergeMode=cow), whose cost " +
        "amortizes at that scale")
  }

  override def insert(row: InternalRow): Unit =
    insertWriter.getOrElse(throw new UnsupportedOperationException(
      "arrow-ipc MOR delta: DELETE writes no rows")).write(row)

  override def update(meta: InternalRow, oldId: InternalRow,
      newRow: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "arrow-ipc MOR delta represents UPDATE as delete+insert")

  override def commit(): WriterCommitMessage =
    ArrowMorDeltaCommit(
      perFile.iterator.map { case (f, b) => (f, b.toArray) }.toMap,
      insertWriter.map(_.commit()))
  override def abort(): Unit = {
    perFile.clear()
    insertWriter.foreach(_.abort())
  }
  override def close(): Unit = insertWriter.foreach(_.close())
}
