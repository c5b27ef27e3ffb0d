package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** PLUGGABLE COMMIT PRIMITIVES (round 11): the two atomic operations the
  * whole OCC protocol reduces to, extracted behind an interface so the
  * multi-writer guarantee extends past POSIX/HDFS to the store class a
  * real 100 TB deployment runs on — object stores with CONDITIONAL
  * WRITES (S3's public `If-None-Match: *` PUT / `If-Match` DELETE).
  *
  *  - CREATE-EXCLUSIVE: the lock claim. POSIX spells it O_EXCL, HDFS
  *    `create(path, overwrite=false)`, S3 an If-None-Match PUT.
  *  - ATOMIC REPLACE: the sidecar flip lock-free readers depend on.
  *    POSIX spells it temp + ATOMIC_MOVE rename, HDFS
  *    `FileContext.rename(OVERWRITE)`, S3 a plain PUT (objects replace
  *    atomically by contract).
  *
  * Release and stale-break are derived but store-specific: a filesystem
  * breaks by rename-to-tombstone (single winner) and releases by
  * payload-verified delete; a conditional store does both with
  * `If-Match` deletes against the tag captured at claim/observation —
  * strictly stronger (a true compare-and-delete). [[ArrowOcc]] resolves
  * the store per dataset path; specs register a simulated
  * conditional-write store to prove the protocol against exactly that
  * API surface. */
private[graft] trait ArrowCommitStore {
  /** Atomically create `lock` with `body` iff absent. Returns a RELEASE
    * TOKEN on success (holder id for filesystems, the object tag for
    * conditional stores); None when the lock exists. */
  def tryClaim(fs: FileSystem, lock: Path, body: Array[Byte]): Option[String]

  /** Release a held lock — must not evict a DIFFERENT holder's claim
    * (the lock may have been broken and re-claimed while we overran). */
  def release(fs: FileSystem, lock: Path, token: String): Unit

  /** Break `lock` iff it has been untouched for longer than `staleMs`;
    * of N concurrent breakers at most one wins, and a FRESH lock (or one
    * that turns fresh mid-break) survives. */
  def breakStale(fs: FileSystem, lock: Path, staleMs: Long): Unit

  /** Atomically replace `path` with `bytes`: a lock-free reader sees the
    * old content or the new, never torn/empty/vanished. */
  def atomicReplace(fs: FileSystem, path: Path, bytes: Array[Byte]): Unit
}

/** The POSIX/HDFS implementation — O_EXCL claims, rename-to-tombstone
  * breaks, payload-verified release, temp+ATOMIC_MOVE replace. This is
  * the default store for every scheme. */
private[graft] object PosixCommitStore extends ArrowCommitStore {

  override def tryClaim(fs: FileSystem, lock: Path,
      body: Array[Byte]): Option[String] =
    if (rawCreateExclusive(fs, lock, body))
      Some(new String(body, java.nio.charset.StandardCharsets.UTF_8))
    else None

  /** Create-exclusive on a filesystem: O_EXCL via java.nio for `file:`
    * (Hadoop's RawLocalFileSystem create(overwrite=false) has a TOCTOU
    * gap) and `FileSystem.create(path, false)` for HDFS-like stores,
    * where it is atomic. */
  private[sources] def rawCreateExclusive(fs: FileSystem, lock: Path,
      body: Array[Byte]): Boolean =
    if ("file" == Option(lock.toUri.getScheme).getOrElse(fs.getUri.getScheme)) {
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

  override def release(fs: FileSystem, lock: Path, token: String): Unit =
    // payload-verified: delete ONLY a lock that is still ours — if this
    // holder overran the staleness window and was broken, the path now
    // holds the next committer's claim and must survive
    scala.util.Try {
      if (readFully(fs, lock).contains(token)) fs.delete(lock, false)
    }

  /** Break a presumed-dead lock. Three fences close the double-holder
    * races of a read-check-delete design:
    *
    *  1. breakers SERIALIZE through a create-exclusive breaker mutex —
    *     of N waiters that all observed the stale lock, exactly one
    *     breaks (the stampede where a loser's break lands on the
    *     winner's fresh CLAIM is structurally gone);
    *  2. the one breaker RE-STATS the lock under the mutex — a claim
    *     that slid in since the waiter's staleness observation is seen
    *     fresh and left alone;
    *  3. the break is an ATOMIC RENAME to a unique tombstone, and
    *     rename preserves mtime, so the breaker re-verifies staleness ON
    *     the tombstone and renames a fresh victim straight back.
    *
    * The breaker mutex is held for microseconds; a crashed breaker's
    * mutex is swept by the same staleness window. */
  override def breakStale(fs: FileSystem, lock: Path, staleMs: Long): Unit = {
    val breaker = new Path(lock.getParent, s".${lock.getName}.breaker")
    scala.util.Try {
      if (System.currentTimeMillis() -
          fs.getFileStatus(breaker).getModificationTime > staleMs)
        fs.delete(breaker, false)
    }
    // contended mutex → skip; the current breaker's work frees the lock
    // for this waiter's next claim attempt too
    if (!rawCreateExclusive(fs, breaker, Array.emptyByteArray)) return
    try {
      val stillStale = scala.util.Try {
        System.currentTimeMillis() -
          fs.getFileStatus(lock).getModificationTime > staleMs
      }.getOrElse(false)
      if (!stillStale) return
      // the `.tmp` suffix puts a crashed breaker's orphaned tombstone
      // under [[ArrowOcc.sweepStaleTmp]]'s existing collection
      val tomb = new Path(lock.getParent,
        s".${lock.getName}.broken-" +
          java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      if (scala.util.Try(fs.rename(lock, tomb)).getOrElse(false)) {
        val freshVictim = scala.util.Try {
          System.currentTimeMillis() -
            fs.getFileStatus(tomb).getModificationTime <= staleMs
        }.getOrElse(false)
        if (freshVictim) {
          // A claim slid in between the re-stat and the rename: put it
          // back. If the rename-back loses (a third claimant already
          // took the lock path), LEAVE the tombstone — it holds the
          // fresh victim's live claim, and deleting it would destroy
          // the only on-disk record that two holders overlap. The
          // `.tmp` name puts it under sweepStaleTmp once it goes stale.
          scala.util.Try(fs.rename(tomb, lock))
        } else scala.util.Try(fs.delete(tomb, false))
      }
    } finally scala.util.Try(fs.delete(breaker, false))
  }

  override def atomicReplace(fs: FileSystem, path: Path,
      bytes: Array[Byte]): Unit = {
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

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }
}

/** The minimal surface a CONDITIONAL-WRITE object store offers — S3's
  * public capability set: whole-object GET (with tag + mtime), plain PUT
  * (atomic replace by object semantics), PUT-if-absent
  * (`If-None-Match: *`) and DELETE-if-match (`If-Match: <tag>`). No
  * rename, no O_EXCL, no append, no directories. */
private[graft] trait ObjectStoreApi {
  case class Obj(bytes: Array[Byte], tag: String, mtimeMs: Long)
  def get(key: String): Option[Obj]
  def put(key: String, bytes: Array[Byte]): Unit
  /** True iff the key was absent and the object landed. */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
  /** True iff the key's current tag matched and the object was removed. */
  def deleteIfMatch(key: String, tag: String): Boolean
}

/** [[ArrowCommitStore]] over conditional writes alone. Claims are
  * If-None-Match PUTs; release and stale-break are If-Match DELETEs
  * against the tag captured at claim/observation — a true
  * compare-and-delete, so the filesystem impl's tombstone dance is
  * unnecessary: of N breakers that observed one stale tag, exactly one
  * delete succeeds, and a fresh re-claim (new tag) survives every
  * stale-tagged delete. Sidecar flips are plain PUTs (atomic by object
  * semantics). */
private[graft] final class ConditionalPutCommitStore(api: ObjectStoreApi)
    extends ArrowCommitStore {
  private def key(p: Path): String = p.toUri.getPath

  override def tryClaim(fs: FileSystem, lock: Path,
      body: Array[Byte]): Option[String] =
    if (api.putIfAbsent(key(lock), body))
      api.get(key(lock)).map(_.tag) // our own put's tag
    else None

  override def release(fs: FileSystem, lock: Path, token: String): Unit = {
    api.deleteIfMatch(key(lock), token)
    ()
  }

  override def breakStale(fs: FileSystem, lock: Path, staleMs: Long): Unit =
    api.get(key(lock)).foreach { o =>
      if (System.currentTimeMillis() - o.mtimeMs > staleMs)
        api.deleteIfMatch(key(lock), o.tag) // single winner per tag
    }

  override def atomicReplace(fs: FileSystem, path: Path,
      bytes: Array[Byte]): Unit =
    api.put(key(path), bytes)
}

/** SIMULATED conditional-write store over the local filesystem: persists
  * objects as real files (so every lock-free READER in the engine sees
  * them), but the writing surface is restricted to exactly
  * [[ObjectStoreApi]] — no rename, no O_EXCL. Per-key linearizability of
  * the conditional operations is enforced with an in-process striped
  * monitor, standing in for the store's own metadata layer; the plain
  * PUT lands via temp + atomic move, which is the local emulation of an
  * object PUT's reader-visible atomicity (S3 gives that by contract).
  * Exists so specs can prove the OCC protocol against the S3 capability
  * surface; a production adapter would bind the same four calls to real
  * conditional requests. */
private[graft] final class SimulatedObjectStore extends ObjectStoreApi {
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def sync[T](k: String)(body: => T): T =
    monitors.computeIfAbsent(k, _ => new Object).synchronized(body)
  private def file(k: String) = java.nio.file.Paths.get(k)
  private def tagOf(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  override def get(k: String): Option[Obj] = sync(k) {
    val f = file(k)
    if (!java.nio.file.Files.exists(f)) None
    else {
      val bytes = java.nio.file.Files.readAllBytes(f)
      Some(Obj(bytes, tagOf(bytes),
        java.nio.file.Files.getLastModifiedTime(f).toMillis))
    }
  }

  override def put(k: String, bytes: Array[Byte]): Unit = sync(k) {
    val f = file(k)
    java.nio.file.Files.createDirectories(f.getParent)
    val tmp = f.resolveSibling(
      "." + f.getFileName.toString + "." +
        java.util.UUID.randomUUID.toString.take(8) + ".tmp")
    java.nio.file.Files.write(tmp, bytes)
    java.nio.file.Files.deleteIfExists(
      f.resolveSibling("." + f.getFileName.toString + ".crc"))
    java.nio.file.Files.move(tmp, f,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def putIfAbsent(k: String, bytes: Array[Byte]): Boolean = sync(k) {
    if (java.nio.file.Files.exists(file(k))) false
    else { put(k, bytes); true }
  }

  override def deleteIfMatch(k: String, tag: String): Boolean = sync(k) {
    get(k).exists(o => o.tag == tag && {
      java.nio.file.Files.deleteIfExists(file(k)); true
    })
  }
}
