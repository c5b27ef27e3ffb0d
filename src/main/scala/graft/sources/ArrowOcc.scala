package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** OPTIMISTIC CONCURRENCY for arrow-ipc directory commits — the piece
  * that turns the round-9 "NO CONCURRENT WRITER" contracts into actual
  * serializable behavior, so the flagship loop (streaming ingest +
  * periodic compaction + occasional DML on ONE directory) needs no
  * external coordination. The reference has no multi-writer story at all
  * (its output side is a blind `IBlockOutputStream::write`,
  * DataStreams/IBlockOutputStream.h); the protocol here is the shape
  * Delta/Iceberg treat as table stakes, re-expressed over this source's
  * sidecar files.
  *
  * Protocol — stage optimistically, commit serially, validate, losers
  * retry:
  *
  *  1. STAGING is lock-free and concurrent: appends write unique-named
  *     files, maintenance/DML stage into their own hidden `.compact-*` /
  *     `.cow-*` dirs, streaming epochs land invisible-until-ledger files.
  *     Nothing any reader or other writer can observe changes.
  *  2. Every COMMIT's metadata section (manifest merge, ledger flip,
  *     snapshot-log advance, latch restore, swap replay) runs under the
  *     directory's [[withCommitLock]] — an atomically-claimed
  *     `_commit.lock` file. Critical sections are metadata-only
  *     (milliseconds), so the lock is never held across a staging job.
  *     Snapshot ids therefore advance atomically: the log's next id is
  *     assigned and written only by the lock holder — the "snapshot-id
  *     CAS" is claim-lock → read tip → write tip+1 → release.
  *  3. Remove-carrying commits VALIDATE under the lock that every file
  *     they replace is still live ([[validateOldsLive]]). A concurrent
  *     commit that removed one first wins; the loser throws
  *     [[CommitConflictException]] — maintenance ops retry their whole
  *     run against the new state, a DML statement surfaces the conflict
  *     to the user (its staged rows were computed by an executed plan
  *     that cannot be transparently re-run). Add-only commits (batch
  *     append, streaming epoch) conflict with nothing and always win —
  *     they only wait their turn.
  *  4. Hygiene sweeps that used to assume a single writer (stale
  *     `.compact-*`/`.cow-*` staging dirs, uncommitted stream-named
  *     orphans, task temps) are STALENESS-GATED: anything younger than
  *     [[staleMs]] may belong to a live concurrent run and is left
  *     alone. As a backstop, the streaming epoch commit re-checks its
  *     files still exist before the ledger flip, so a swept in-flight
  *     epoch fails loudly (and replays) instead of committing a ledger
  *     that points at deleted files.
  *  5. The `_SUCCESS` completeness latch stays honest under concurrency
  *     via PENDING-APPEND markers (`_pending-<queryId>`): a batch append
  *     drops the latch and leaves a marker for its whole write; every
  *     OTHER committer restores the latch only when no live marker
  *     remains ([[appendsPending]]), so a concurrent maintenance replay
  *     can never re-expose the directory mid-append.
  *
  * Lock mechanics: claimed by atomic create-exclusive (O_EXCL via
  * java.nio for `file:` — Hadoop's RawLocalFileSystem create(overwrite=
  * false) has a TOCTOU gap — and `FileSystem.create(path, false)` for
  * HDFS-like stores, where it is atomic). A crashed holder's lock is
  * broken after [[staleMs]]; the window must dwarf the longest critical
  * section, and metadata-only sections keep that margin ~10^5. Stores
  * with no atomic create-exclusive (bare S3 without a coordination
  * layer) are outside this protocol's contract — same stance as
  * delta-io's LogStore.
  */
private[graft] object ArrowOcc {
  val LockFile = "_commit.lock"
  private val PendingPrefix = "_pending-"

  /** A remove-carrying commit lost its race: the files it staged a
    * replacement for are no longer the live state. */
  final class CommitConflictException(msg: String)
      extends RuntimeException(msg)

  private def conf(key: String, default: Long): Long =
    scala.util.Try(org.apache.spark.sql.SparkSession.active.conf
      .get(key, default.toString).toLong).getOrElse(default)

  /** Age beyond which an unreleased lock, an unswept staging dir, an
    * uncommitted stream file, or a pending-append marker is presumed
    * dead. Lowered by specs that simulate crashed runs. */
  def staleMs: Long = conf("spark.graft.arrow.occStaleMs", 10L * 60 * 1000)

  /** How long a committer waits for the lock before giving up. */
  def timeoutMs: Long = conf("spark.graft.arrow.occTimeoutMs", 60L * 1000)

  // reentrancy: an op holding a directory's lock may call helpers that
  // also lock it (compact → recover-replay); per-thread, keyed by the
  // qualified lock path
  private val held = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  private def tryClaim(fs: FileSystem, lock: Path, body: Array[Byte]): Boolean =
    if ("file" == Option(lock.toUri.getScheme).getOrElse(fs.getUri.getScheme)) {
      // O_EXCL — atomic on POSIX even across processes
      val local = java.nio.file.Paths.get(lock.toUri.getPath)
      try {
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.write(local, body,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    } else {
      try {
        val out = fs.create(lock, false)
        try out.write(body) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException => !fs.exists(lock) && {
          throw new java.io.IOException(s"occ: cannot create $lock")
        }
      }
    }

  /** Run `body` as the directory's sole committer. Reentrant within a
    * thread. Throws after [[timeoutMs]] of contention. */
  def withCommitLock[T](fs: FileSystem, dirPath: Path)(body: => T): T = {
    val lock = new Path(fs.makeQualified(dirPath), LockFile)
    val key = lock.toString
    if (held.get().contains(key)) return body
    val holder = java.util.UUID.randomUUID().toString
    val payload =
      s"""{"holder":"$holder","ts":${System.currentTimeMillis()}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var claimed = false
    while (!claimed) {
      fs.mkdirs(dirPath)
      if (tryClaim(fs, lock, payload)) claimed = true
      else {
        // contended: break a dead holder's lock, else wait a beat.
        // (The conditional delete is read-check-delete — not atomic, but
        // the race window is microseconds against a staleness window of
        // minutes, and a wrongly-broken FRESH lock still leads both
        // holders through validate-under-latch paths whose steps are
        // individually idempotent.)
        val stale = scala.util.Try {
          val st = fs.getFileStatus(lock)
          System.currentTimeMillis() - st.getModificationTime > staleMs
        }.getOrElse(false) // vanished → just retry the claim
        if (stale) fs.delete(lock, false)
        else if (System.nanoTime() > deadline)
          throw new java.io.IOException(
            s"arrow-ipc occ: could not acquire $lock within ${timeoutMs}ms " +
              "— a concurrent commit is holding it (or a dead one within " +
              s"the ${staleMs}ms staleness window)")
        else Thread.sleep(5L + scala.util.Random.nextInt(20))
      }
    }
    held.set(held.get() + key)
    try body
    finally {
      held.set(held.get() - key)
      scala.util.Try(fs.delete(lock, false))
    }
  }

  /** Conflict validation for a remove-carrying commit: every relative
    * path this commit replaces must still be live. Call ONLY under the
    * commit lock. */
  def validateOldsLive(fs: FileSystem, dirPath: Path, olds: Seq[String],
      what: String): Unit = {
    val gone = olds.filterNot(rel => fs.exists(new Path(dirPath, rel)))
    if (gone.nonEmpty)
      throw new CommitConflictException(
        s"arrow-ipc occ: $what on $dirPath lost its race — " +
          s"${gone.size} of the ${olds.size} files it rewrites were " +
          s"removed by a concurrent commit (first: ${gone.head}); " +
          "retry against the new state")
  }

  /** Atomically REPLACE `path` with `bytes`: a concurrent (lock-free)
    * reader sees the old content or the new content, never a torn,
    * empty, or vanished file. Commits hold the directory lock against
    * each other, but READS are deliberately lock-free — so every
    * correctness-bearing sidecar (stream ledger, stats manifest/shards/
    * index, layout declarations, lineage) must flip atomically.
    * `file:` rides java.nio ATOMIC_MOVE (any stale ChecksumFileSystem
    * `.crc` sibling from a pre-OCC write is deleted first — checksums
    * of a replaced file would otherwise fail reads); other stores ride
    * `FileContext.rename(OVERWRITE)`, which HDFS implements atomically. */
  def writeAtomic(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit = {
    val q = fs.makeQualified(path)
    if ("file" == Option(q.toUri.getScheme).getOrElse("file")) {
      val fin = java.nio.file.Paths.get(q.toUri.getPath)
      java.nio.file.Files.createDirectories(fin.getParent)
      val tmp = fin.resolveSibling(
        "." + fin.getFileName.toString + "." +
          java.util.UUID.randomUUID.toString.take(8) + ".tmp")
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.deleteIfExists(
        fin.resolveSibling("." + fin.getFileName.toString + ".crc"))
      java.nio.file.Files.move(tmp, fin,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val tmp = new Path(q.getParent,
        "." + q.getName + "." +
          java.util.UUID.randomUUID.toString.take(8) + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        q.toUri, fs.getConf)
      fc.rename(tmp, q, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  // ── pending-append markers ────────────────────────────────────────────

  private def markerPath(dirPath: Path, queryId: String) =
    new Path(dirPath, PendingPrefix + queryId)

  /** Record that a batch append is in flight (latch down on purpose). */
  def markPending(fs: FileSystem, dirPath: Path, queryId: String): Unit = {
    fs.mkdirs(dirPath)
    fs.create(markerPath(dirPath, queryId), true).close()
  }

  /** The append committed or aborted; its marker goes away. */
  def clearPending(fs: FileSystem, dirPath: Path, queryId: String): Unit =
    fs.delete(markerPath(dirPath, queryId), false)

  /** Is any OTHER batch append still in flight (live marker, not mine,
    * younger than the staleness window)? Gates every latch restore. */
  def appendsPending(fs: FileSystem, dirPath: Path,
      exceptQueryId: Option[String] = None): Boolean = {
    val now = System.currentTimeMillis()
    Option(fs.globStatus(new Path(dirPath, PendingPrefix + "*")))
      .getOrElse(Array.empty).exists { st =>
        val qid = st.getPath.getName.stripPrefix(PendingPrefix)
        !exceptQueryId.contains(qid) &&
          (now - st.getModificationTime <= staleMs)
      }
  }

  /** Query ids of batch appends currently in flight (live markers). File
    * names embed their commit queryId, so membership here marks a file
    * as possibly-uncommitted. */
  def livePendingQueryIds(fs: FileSystem, dirPath: Path): Set[String] = {
    val now = System.currentTimeMillis()
    Option(fs.globStatus(new Path(dirPath, PendingPrefix + "*")))
      .getOrElse(Array.empty)
      .filter(st => now - st.getModificationTime <= staleMs)
      .map(_.getPath.getName.stripPrefix(PendingPrefix)).toSet
  }

  /** Sweep pending markers old enough to belong to dead runs. */
  def sweepStalePending(fs: FileSystem, dirPath: Path): Unit = {
    val now = System.currentTimeMillis()
    Option(fs.globStatus(new Path(dirPath, PendingPrefix + "*")))
      .getOrElse(Array.empty)
      .filter(st => now - st.getModificationTime > staleMs)
      .foreach(st => fs.delete(st.getPath, false))
  }

  /** Restore `_SUCCESS` unless a live append owns the latch. Call under
    * the commit lock. */
  def restoreLatch(fs: FileSystem, dirPath: Path,
      exceptQueryId: Option[String] = None): Unit =
    if (!appendsPending(fs, dirPath, exceptQueryId)) {
      val success = new Path(dirPath, "_SUCCESS")
      if (!fs.exists(success)) fs.create(success, true).close()
    }

  /** Newest modification time of `dir` or any of its immediate children
    * — the liveness signal for a staging directory (a hive staging run
    * touches value subdirs, not the top dir). */
  def newestMTime(fs: FileSystem, dir: Path): Long = {
    val top = scala.util.Try(fs.getFileStatus(dir).getModificationTime)
      .getOrElse(0L)
    val kids = Option(scala.util.Try(fs.listStatus(dir)).getOrElse(null))
      .getOrElse(Array.empty).map(_.getModificationTime)
    (top +: kids.toSeq).max
  }

  /** Sweep stale `.<name>.<uuid>.tmp` files a crashed [[writeAtomic]]
    * left at the dataset root or in `_snapshots/` (live ones exist for
    * sub-second windows; the staleness gate protects them). Returns the
    * count swept. */
  def sweepStaleTmp(fs: FileSystem, dirPath: Path): Int = {
    val now = System.currentTimeMillis()
    Seq(dirPath, new Path(dirPath, "_snapshots")).map { at =>
      if (!fs.exists(at)) 0
      else {
        val dead = Option(fs.listStatus(at)).getOrElse(Array.empty)
          .filter(st => st.isFile &&
            st.getPath.getName.startsWith(".") &&
            st.getPath.getName.endsWith(".tmp") &&
            now - st.getModificationTime > staleMs)
        dead.foreach(st => fs.delete(st.getPath, false))
        dead.length
      }
    }.sum
  }

  /** Delete staging dirs (`.compact-*` / `.cow-*`) only when provably
    * dead — untouched for longer than the staleness window. A younger
    * dir may be a CONCURRENT run mid-stage; its own commit validates, so
    * leaving it costs only disk until it finishes or goes stale.
    * Returns how many dirs were swept. */
  def sweepStaleStaging(fs: FileSystem, dirPath: Path, glob: String): Int = {
    val now = System.currentTimeMillis()
    val dead = Option(fs.globStatus(new Path(dirPath, glob)))
      .getOrElse(Array.empty)
      .filter(st => now - newestMTime(fs, st.getPath) > staleMs)
    dead.foreach(st => fs.delete(st.getPath, true))
    dead.length
  }
}
