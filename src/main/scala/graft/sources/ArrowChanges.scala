package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** CHANGE FEED between two snapshots of an arrow-ipc directory — the
  * incremental-processing primitive a training-data pipeline needs
  * ("what changed since my last run?"). Built entirely on the snapshot
  * log ([[ArrowSnapshots]]) plus the `_file` metadata column:
  *
  *  - the NET file delta over `(from, to]` is folded from the log
  *    (a file added and removed inside the window cancels — net-change
  *    semantics);
  *  - inserted rows = an `asOfSnapshot(to)` read pruned to the added
  *    files, deleted rows = an `asOfSnapshot(from)` read pruned to the
  *    removed files — the pruning is the scan's own STATIC `_file`
  *    pushdown, so the feed opens exactly the changed files, never the
  *    table;
  *  - each row carries `_change_type` (`insert` | `delete`).
  *
  * Copy-on-write semantics: a rewritten file's rows appear as `delete`
  * (the old image) plus `insert` (the new) — rewrite amplification, the
  * standard contract for COW tables without per-row change tracking;
  * consumers reconcile by key. The feed refuses when the window's files
  * have been expired from the trash. */
object ArrowChanges {

  /** The change feed over `(from, to]`. `from = 0` = since the beginning
    * (everything at `to` is an insert). */
  def changeFeed(spark: SparkSession, dir: String,
      from: Long, to: Long): DataFrame = {
    require(from >= 0 && from < to,
      s"arrow-ipc change feed: need 0 <= from < to, got ($from, $to]")
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snaps = ArrowSnapshots.read(fs, dirPath)
    def known(id: Long): Boolean = snaps.exists(_.id == id)
    require(known(to),
      s"arrow-ipc change feed: $dir has no snapshot $to" +
        (if (snaps.isEmpty) " (no snapshot log)"
        else s" — the log records ${snaps.head.id}..${snaps.last.id}"))
    require(from == 0 || known(from),
      s"arrow-ipc change feed: $dir has no snapshot $from to start from " +
        "(expired history? 0 = since the beginning)")

    val window = snaps.filter(e => e.id > from && e.id <= to)
    val added = window.flatMap(_.adds).toSet
    val removed = window.flatMap(_.removes).toSet
    val netAdds = added -- removed
    val netRemoves = removed -- added

    def side(asOf: Long, rels: Set[String], kind: String): DataFrame = {
      val base = spark.read.format("arrow-ipc")
        .option("asOfSnapshot", asOf).load(dir)
      // resolve each relative path the way the as-of scan will (live
      // first, trash second) so the pushed `_file IN` matches exactly
      val paths = rels.toSeq.sorted.map(
        ArrowSnapshots.resolveLiveOrTrash(fs, dirPath, _,
          s"change-feed window ($from, $to]"))
      val pruned =
        if (paths.isEmpty) base.filter(lit(false))
        else base.filter(col(ArrowRowLevel.FileColumn).isin(paths: _*))
      pruned.drop(ArrowRowLevel.FileColumn)
        .withColumn("_change_type", lit(kind))
    }

    val inserts = side(to, netAdds, "insert")
    if (from == 0) inserts
    else inserts.unionAll(side(from, netRemoves, "delete"))
  }
}
