package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationInfo, WriterCommitMessage}
import org.apache.spark.sql.types.StructType

/** Plain SQL `DELETE FROM` as a MERGE-ON-READ position delta — Spark's
  * `SupportsDelta` row-level protocol (the same public API Iceberg's
  * position-delta mode rides) wired to [[ArrowDeleteVectors]]. Where the
  * group-based COW operation rewrites every affected file in full,
  * this one's ReplaceData dual ships only `(operation, _file, _pos)`
  * per MATCHING row: Spark plans the delete as a scan of the statically
  * kept candidates projecting the row-id metadata columns, each task
  * hands its deleted positions to [[ArrowMorDeltaWriter]], and the
  * driver commit stages cumulative deletion vectors through the same
  * OCC-validated tail as `CALL delete_mor`
  * ([[ArrowDeleteVectors.commitDeletes]]).
  *
  * Routing (`spark.graft.arrow.deleteMode`): `cow` (default) keeps the
  * rewrite semantics; `mor` sends DELETE here. Orthogonal layers keep
  * their own precedence: Spark's OptimizeMetadataOnlyDeleteFromTable
  * still intercepts PROVABLE whole-file deletes first (strictly better
  * than any vector), and UPDATE/MERGE always take the COW path — their
  * merge-on-read dual needs delete-AND-insert deltas, whose write
  * amplification this source prefers to pay as an honest rewrite.
  *
  * Scale shape vs COW: cost is one pruned scan plus O(deleted rows) of
  * metadata, independent of file sizes — the GDPR point-delete answer.
  * The per-statement cap (`spark.graft.arrow.morMaxDeletedRows`) is
  * enforced BOTH task-side (a single writer past the cap fails fast,
  * before the driver sees a byte) and at the commit tail. */
private[sources] class ArrowMorDeleteOperation(
    schema: StructType, dir: String, info: RowLevelOperationInfo)
    extends RowLevelOperation
    with org.apache.spark.sql.connector.write.SupportsDelta {

  require(info.command == RowLevelOperation.Command.DELETE,
    s"arrow-ipc: the merge-on-read row-level operation handles DELETE " +
      s"only, got ${info.command}")

  override def command(): RowLevelOperation.Command = info.command
  override def description(): String = s"arrow-ipc MOR DELETE $dir"

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

  override def newWriteBuilder(
      writeInfo: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new ArrowMorDeltaWrite(dir)
    }
}

/** One task's deleted positions, keyed by the scan's `_file` constants. */
private[sources] case class ArrowMorDeltaCommit(
    perFile: Map[String, Array[Long]]) extends WriterCommitMessage

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
          : DeltaWriter[InternalRow] = new ArrowMorDeltaWriter(cap)
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val merged = scala.collection.mutable.HashMap.empty[String,
      scala.collection.mutable.ArrayBuffer[Long]]
    messages.foreach {
      case ArrowMorDeltaCommit(perFile) =>
        perFile.foreach { case (f, ps) =>
          merged.getOrElseUpdate(f,
            scala.collection.mutable.ArrayBuffer.empty[Long]) ++= ps
        }
      case other => throw new IllegalStateException(
        s"arrow-ipc MOR delta: unexpected commit message $other")
    }
    // dedupe/sort/cap/stage/validate/intent/replay — the shared tail; a
    // lost OCC race surfaces as CommitConflictException, which
    // ArrowDml.delete's transparent retry re-plans (DELETE statements
    // issued through it compose with this path unchanged)
    ArrowDeleteVectors.commitDeletes(SparkSession.active, dir,
      merged.iterator.map { case (f, b) => (f, b.toArray) }.toArray)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  // nothing persisted before commit: positions live in the messages
}

/** Task-side collector: `delete(meta, id)` appends the row's position to
  * its file's buffer. Memory is O(task's deleted rows), guarded by the
  * statement cap so a runaway predicate fails in the task, not as a
  * driver OOM. */
private[sources] class ArrowMorDeltaWriter(cap: Long)
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
      s"arrow-ipc MOR delete: this task alone matched more than " +
        s"spark.graft.arrow.morMaxDeletedRows=$cap rows — use the COW " +
        "path (DELETE with deleteMode=cow), whose cost amortizes at " +
        "that scale")
  }

  override def update(meta: InternalRow, oldId: InternalRow,
      newRow: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "arrow-ipc MOR delta handles DELETE only")
  override def insert(row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "arrow-ipc MOR delta handles DELETE only")

  override def commit(): WriterCommitMessage =
    ArrowMorDeltaCommit(perFile.iterator
      .map { case (f, b) => (f, b.toArray) }.toMap)
  override def abort(): Unit = perFile.clear()
  override def close(): Unit = ()
}
