package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WRITE-AUDIT-PUBLISH branches (round 13): stage writes INVISIBLY to
  * main readers, validate them with real queries, then publish
  * atomically — the Iceberg WAP / audit-branch workflow (and the last
  * common lake workflow the source lacked, per the round-12 verdict).
  *
  * Design: a branch IS a complete arrow-ipc dataset under
  * `.branch/<name>/` — dotted, so main listings never see it, while
  * every standing capability (task-committed writes, stats manifests,
  * OCC, pruning) works on it unchanged because it is just a directory
  * table. [[write]] creates-or-appends through the ordinary DSv2 path;
  * [[read]] serves main ∪ branch (the overlay view an auditor
  * validates); [[publish]] hands the branch directory to the generic
  * intent/replay AS THE STAGING DIR — data files move into the table
  * root, their stats fold into the root manifest, one snapshot entry
  * (op = "publish") lands, and the branch metadata dies with the
  * staging cleanup, all under the commit lock with the same crash
  * convergence as every other swap (a crash mid-publish leaves
  * intent + staging; recover() finishes it). [[drop]] abandons.
  *
  * Contract: branches are APPEND overlays — the WAP shape (stage an
  * ingest batch, audit, publish). Row-level DML against a branch is
  * not a surface (Iceberg's WAP stages appends the same way);
  * validation is read-side. Flat layouts only (a hive table routes
  * batches through per-value directories the overlay union would have
  * to re-nest); branch names are [A-Za-z0-9_-]. Equality-delete
  * sequencing is preserved: published files are stamped with the
  * current sequence exactly like a plain append, so standing
  * tombstones never mask the (newer) published rows.
  *
  * Beyond-reference by construction: the reference has no snapshot,
  * branch, or publish story (its write side is a blind
  * `IBlockOutputStream::write`); the workflow precedent is Iceberg's
  * WAP (`wap.id` staged snapshots + cherry-pick publish). */
object ArrowBranch {

  val BranchRoot = ".branch"

  private def branchPath(dirPath: Path, name: String): Path = {
    require(name.matches("[A-Za-z0-9_-]+"),
      s"arrow-ipc branch: invalid branch name '$name' ([A-Za-z0-9_-] only)")
    new Path(dirPath, s"$BranchRoot/$name")
  }

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Live branch names (directories under `.branch/`). */
  def list(fs: FileSystem, dirPath: Path): Seq[String] = {
    val root = new Path(dirPath, BranchRoot)
    if (!scala.util.Try(fs.exists(root)).getOrElse(false)) return Nil
    Option(fs.listStatus(root)).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
  }

  case class BranchInfo(name: String, files: Int, bytes: Long,
    rows: Long, modifiedMs: Long)

  /** Branches with their staged footprint: data-file count/bytes, rows
    * from the branch's stats manifest, and the NEWEST modification time
    * under the branch (the age an expiry policy judges by — one fresh
    * write renews the whole branch). */
  def detail(fs: FileSystem, dirPath: Path): Seq[BranchInfo] =
    list(fs, dirPath).map { name =>
      val bp = new Path(dirPath, s"$BranchRoot/$name")
      val parts = Option(fs.globStatus(new Path(bp, "part-*.arrows")))
        .getOrElse(Array.empty)
      val rows = scala.util.Try(
        ArrowFileStats.read(fs, bp).values.map(_.rows).sum).getOrElse(0L)
      val newest = (Option(fs.listStatus(bp)).getOrElse(Array.empty)
        .map(_.getModificationTime) :+
        scala.util.Try(fs.getFileStatus(bp).getModificationTime)
          .getOrElse(0L)).max
      BranchInfo(name, parts.length, parts.map(_.getLen).sum, rows, newest)
    }

  /** Stage `df` on `branch` — created on first write, appended after;
    * main readers see NOTHING until [[publish]]. Schema must match the
    * main table's column names (the publish would otherwise land
    * foreign columns). */
  def write(spark: SparkSession, dir: String, branch: String,
      df: DataFrame): Unit = {
    val (fs, dirPath) = fsOf(spark, dir)
    require(fs.exists(new Path(dirPath, "_schema.arrows")),
      s"arrow-ipc branch: $dir is not an arrow-ipc table")
    require(ArrowHiveLayout.read(fs, dirPath).isEmpty,
      s"arrow-ipc branch: $dir is hive-partitioned — branches are " +
        "flat-layout only")
    val main = ArrowInterchange.readSchema(spark, dir)
    require(df.schema.fieldNames.sorted.sameElements(main.fieldNames.sorted),
      s"arrow-ipc branch: batch columns ${df.schema.fieldNames.mkString(",")}" +
        s" do not match table ${main.fieldNames.mkString(",")}")
    val bp = branchPath(dirPath, branch)
    val aligned = df.select(main.fieldNames.map(org.apache.spark.sql
      .functions.col).toIndexedSeq: _*)
    // append creates the dataset on first write (the source's append
    // path initializes an empty directory), and appends after
    aligned.write.format("arrow-ipc").mode("append").save(bp.toString)
  }

  /** The audit view: main ∪ branch — what the table WILL be after
    * [[publish]]. Both sides are ordinary arrow-ipc reads (pruning,
    * masks, stats all apply on each). */
  def read(spark: SparkSession, dir: String, branch: String): DataFrame = {
    val (fs, dirPath) = fsOf(spark, dir)
    val bp = branchPath(dirPath, branch)
    val main = spark.read.format("arrow-ipc").load(dir)
    if (!fs.exists(bp)) main
    else main.unionByName(spark.read.format("arrow-ipc").load(bp.toString))
  }

  case class PublishResult(files: Int, rows: Long)

  /** Atomically move the branch's data files into the main table: one
    * intent/replay under the commit lock — readers see the whole batch
    * or none of it, and a crash converges via recover(). The branch
    * directory IS the staging dir, so its stats manifest folds into the
    * root's and its metadata is cleaned by the replay's staging
    * removal. */
  def publish(spark: SparkSession, dir: String, branch: String): PublishResult = {
    val (fs, dirPath) = fsOf(spark, dir)
    val bp = branchPath(dirPath, branch)
    require(fs.exists(bp),
      s"arrow-ipc branch: $dir has no branch '$branch' to publish")
    // mirror [[write]]'s flat-only refusal: a branch staged while the
    // table was flat could otherwise publish AFTER an evolution to a
    // hive layout, landing root part files a pure-hive read never lists
    // — a "successful" publish whose rows are silently invisible
    require(ArrowHiveLayout.read(fs, dirPath).isEmpty,
      s"arrow-ipc branch: $dir is hive-partitioned — a publish would " +
        "land flat part files a hive read never lists; branches are " +
        "flat-layout only")
    ArrowMaintenance.recover(spark, dir) // finish any crashed swap first
    ArrowOcc.withCommitLock(fs, dirPath) {
      // a branch write IN FLIGHT (live pending marker on the branch
      // dir) would land files after this listing and lose them to the
      // staging cleanup — refuse; the writer finishes, publish re-runs
      require(ArrowOcc.livePendingQueryIds(fs, bp).isEmpty,
        s"arrow-ipc branch: '$branch' has a write in flight — " +
          "let it commit, then publish")
      val stats = ArrowFileStats.read(fs, bp)
      val rels = ArrowSnapshots.listDataFiles(fs, bp)
      require(rels.forall(r => new Path(r).getParent == null ||
          new Path(r).getParent.toString == ""),
        s"arrow-ipc branch: '$branch' holds nested files — flat only")
      // equality-delete sequencing: published files are NEWER than any
      // standing tombstone — stamp like a plain append (under the same
      // lock tombstone commits take, so the order is total)
      val eqSeq = ArrowEqualityDeletes.currentSeq(fs, dirPath)
      val stamped =
        if (eqSeq == 0L) stats
        else stats.map { case (n, st) => n -> st.copy(seq = eqSeq) }
      if (stamped != stats) ArrowFileStats.write(fs, bp, stamped)
      val rows = stamped.values.map(_.rows).sum
      ArrowMaintenance.commitIntent(fs, dirPath, ArrowMaintenance.Intent(
        olds = Nil, staging = s"$BranchRoot/$branch",
        moves = rels.map(r => r -> r).toMap,
        kind = "publish", layoutKeys = Nil, dvs = Nil,
        txn = ArrowDeleteVectors.currentCdcTxn()))
      PublishResult(rels.size, rows)
    }
  }

  /** Abandon a branch: everything staged on it is discarded; main was
    * never touched. */
  def drop(spark: SparkSession, dir: String, branch: String): Boolean = {
    val (fs, dirPath) = fsOf(spark, dir)
    fs.delete(branchPath(dirPath, branch), true)
  }
}
