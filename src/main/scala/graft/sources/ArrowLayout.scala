package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{HasPartitionKey, InputPartition, PartitionReader}
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Key-grouped layout declaration for an arrow-ipc directory
  * (`_layout.json`): the writer's claim that every data file is
  * single-valued on the listed columns. The claim is what makes
  * STORAGE-PARTITIONED JOINS possible: the scan groups files by key value,
  * reports `KeyGroupedPartitioning` to Catalyst, and a join of two
  * directories keyed the same way runs with ZERO shuffle (and, because a
  * single-valued partition is trivially sorted on its key, zero sort) —
  * the co-located-join answer at 100 TB, where shuffling either side is
  * the dominant cost.
  *
  * The claim is never trusted blind: the scan re-proves single-valuedness
  * per file from the exact-or-invalid `_stats.json` intervals before
  * reporting any partitioning ([[ArrowFileStats.singleValue]]). A foreign
  * append or a stale declaration therefore degrades to a plain shuffled
  * read, never to wrong co-location. Compaction destroys grouping by
  * construction (coalesce mixes keys), so [[ArrowMaintenance]] deletes the
  * declaration as part of its swap.
  */
private[graft] object ArrowLayout {
  val FileName = "_layout.json"

  def read(fs: FileSystem, dir: Path): Seq[String] = {
    val p = new Path(dir, FileName)
    if (!fs.exists(p)) Nil
    else {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(ArrowFileStats.readFully(fs, p)) \
        "partitionKeys" match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case other => throw new IllegalStateException(s"bad $FileName: $other")
      }
    }
  }

  def write(fs: FileSystem, dir: Path, keys: Seq[String]): Unit = {
    val body = keys.map(k => "\"" + ArrowFileStats.esc(k) + "\"")
      .mkString("{\"partitionKeys\":[", ",", "]}")
    ArrowOcc.writeAtomic(fs, new Path(dir, FileName),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  def delete(fs: FileSystem, dir: Path): Unit =
    fs.delete(new Path(dir, FileName), false)
}

/** One key group of a key-grouped directory: every row of every listed
  * file carries exactly `key` on the grouping columns (canonical stat
  * strings; null element = the all-NULL group). Implements
  * [[HasPartitionKey]] so Spark can co-locate compatible scans.
  * `hiveValues` (parallel to `files`, empty for flat layouts) carries
  * each file's directory-derived hive partition values so the hive
  * reader can splice them back — hive-partitioned datasets participate
  * in storage-partitioned joins through the same partition type. */
private[sources] case class ArrowKeyedPartition(
    files: Seq[String], key: Seq[Option[String]], keyTypes: Seq[DataType],
    hiveValues: Seq[Seq[Option[String]]] = Nil,
    dvs: Seq[Option[String]] = Nil)
    extends InputPartition with HasPartitionKey {
  /** Per-file deletion-vector paths, parallel to `files` (Nil = none —
    * normalized so readers can always zip). */
  def dvOrNone: Seq[Option[String]] =
    if (dvs.isEmpty) files.map(_ => None) else dvs
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      key.zip(keyTypes).map {
        case (None, _) => null
        case (Some(s), StringType) =>
          org.apache.spark.unsafe.types.UTF8String.fromString(s): Any
        case (Some(s), dt) => ArrowFileStats.internalFromCanonical(dt, s)
      }.toArray)
}

/** Sequential chain of per-item readers — a key group reads its files one
  * after another inside a single Spark partition (`A` = whatever per-file
  * descriptor the factory needs: a path, or a path + hive values). */
private[sources] class ChainedPartitionReader[A, T](
    files: Seq[A], mk: A => PartitionReader[T])
    extends PartitionReader[T] {
  private val remaining = files.iterator
  private var current: PartitionReader[T] = _

  override def next(): Boolean = {
    while (true) {
      if (current == null) {
        if (!remaining.hasNext) return false
        current = mk(remaining.next())
      }
      if (current.next()) return true
      current.close(); current = null
    }
    false // unreachable
  }

  override def get(): T = current.get()

  override def close(): Unit = if (current != null) { current.close(); current = null }
}
