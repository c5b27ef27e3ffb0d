package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** TAGS (round 14): named, immutable references to snapshots — the
  * Iceberg tag surface (`VERSION AS OF 'v1.0'`) over this source's
  * snapshot log. A tag names the exact file set a release/audit was
  * validated against, so "the data behind model run X" stays readable
  * by NAME while ordinary history retention collapses everything
  * un-pinned around it.
  *
  * Design: one file per tag under `_tags/<name>.json` (underscore
  * prefix → invisible to every data listing, like `_snapshots/`),
  * holding the snapshot id and creation time. Creation is
  * CREATE-EXCLUSIVE — tags are immutable by contract (Iceberg's tags
  * are retargetable; an audit pin that can silently move is a weaker
  * promise, so this source refuses instead: drop and re-create is the
  * explicit form). Resolution feeds the same `asOf` pin as
  * `VERSION AS OF <id>` / `option("asOfSnapshot", …)` — scans read the
  * tagged file set (trash-resolved), mutations against the pinned
  * relation refuse.
  *
  * Retention: [[ArrowMaintenance.expireSnapshots]] REFUSES when any
  * tag pins a snapshot below `keepFrom` (naming the tags), so a
  * nightly `vacuum(keepFrom = …)` can never expire a release pin;
  * dropping the tag is the explicit opt-out. Tags have no TTL — unlike
  * WAP branches (abandoned workflow staging, expired by age), a tag is
  * a deliberate mark whose whole point is surviving until dropped.
  *
  * Crash shape: the tag file is written to a hidden temp name and
  * renamed into place (round 15), so a crash mid-write leaves only an
  * invisible `.tmp` orphan — the visible `<name>.json` is always whole.
  * Should a torn file ever appear anyway (foreign writer), [[resolve]]
  * refuses LOUDLY (naming drop_tag + re-create as the repair) rather
  * than serving a wrong snapshot. No intent/replay needed — a tag
  * references history, it never moves data.
  *
  * Beyond-reference by construction: the reference has no snapshot or
  * ref story; the surface precedent is Iceberg's named refs (spec §
  * "Branches and Tags") re-expressed over this source's log. */
object ArrowTags {

  val TagsDir = "_tags"

  case class TagInfo(name: String, snapshot: Long, createdMs: Long)

  /** Tag names: word-ish ([A-Za-z0-9._-]), and NOT all digits — an
    * all-digit name would be indistinguishable from a snapshot id in
    * `VERSION AS OF`, which tries the numeric parse first. */
  private[graft] def validateName(name: String): Unit = {
    require(name.matches("[A-Za-z0-9._-]+"),
      s"arrow-ipc tag: invalid tag name '$name' ([A-Za-z0-9._-] only)")
    require(!name.forall(_.isDigit),
      s"arrow-ipc tag: tag name '$name' is all digits — VERSION AS OF " +
        "would read it as a snapshot id; include a letter or separator")
  }

  private def tagPath(dirPath: Path, name: String): Path = {
    validateName(name)
    new Path(dirPath, s"$TagsDir/$name.json")
  }

  /** Create `name` pointing at `snapshot` (default: the current tip).
    * Refuses when the tag exists (immutable — drop first), when the
    * table has no snapshot log, or when the id is not a retained
    * snapshot (unknown, or already expired below the base). */
  def create(fs: FileSystem, dirPath: Path, name: String,
      snapshot: Option[Long] = None): TagInfo = {
    require(fs.exists(new Path(dirPath, "_schema.arrows")),
      s"arrow-ipc tag: $dirPath is not an arrow-ipc table")
    val snaps = ArrowSnapshots.read(fs, dirPath)
    require(snaps.nonEmpty,
      s"arrow-ipc tag: $dirPath has no snapshot log — nothing to tag")
    val id = snapshot.getOrElse(ArrowSnapshots.currentTip(fs, dirPath))
    require(ArrowSnapshots.resolve(snaps, id).isDefined,
      s"arrow-ipc tag: $dirPath has no retained snapshot $id — the log " +
        s"records ${snaps.head.id}..${snaps.last.id}")
    val p = tagPath(dirPath, name)
    if (fs.exists(p)) throw new IllegalStateException(
      s"arrow-ipc tag: '$name' already exists on $dirPath — tags are " +
        "immutable; CALL drop_tag first to re-point it")
    fs.mkdirs(p.getParent)
    val now = System.currentTimeMillis()
    // ATOMIC create (round 15): write the JSON to a hidden temp name,
    // then rename into place. Because ArrowTags.list sits under the
    // expireSnapshots pin-check and vacuum's keepFrom clamp, a torn
    // `<name>.json` from a crashed in-place create would wedge ALL
    // retention maintenance until a manual drop_tag; with temp+rename a
    // crash mid-write leaves only an invisible `.tmp` orphan (not
    // `.json`-suffixed, so list() never sees it — vacuum's staging
    // sweep collects aged ones) and the visible file is always whole.
    // Immutability: rename alone is NOT exclusive everywhere (POSIX
    // rename replaces an existing destination), so the exists-check +
    // rename pair runs under the TABLE'S COMMIT LOCK — two racing
    // creates of one name serialize there, exactly one wins, the loser
    // refuses loudly, never a silent re-point. Tags are rare
    // control-plane writes; a commit-lock acquisition is the right
    // price for the exactly-one-winner contract the old
    // create-exclusive stream gave.
    // hidden-dot + `.tmp` suffix: the shared stale-tmp sweep
    // (ArrowOcc.sweepStaleTmp covers `_tags/` since round 15) collects
    // an orphan a crashed create leaves behind
    val tmp = new Path(p.getParent,
      s".$name-${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(
      s"""{"snapshot": $id, "createdMs": $now}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // the tmp is cleaned on EVERY failure path — a lost race below AND
    // a lock-acquisition failure here (otherwise the orphan waits for
    // vacuum's aged sweep)
    val renamed =
      try ArrowOcc.withCommitLock(fs, dirPath) {
        if (fs.exists(p)) false
        else
          try fs.rename(tmp, p)
          catch {
            // a failed rename is a lost race ONLY when the destination
            // actually appeared; otherwise it is a genuine filesystem
            // failure — swallowing it as "already exists" would discard
            // the root cause (round-16 advisor)
            case e: java.io.IOException =>
              if (fs.exists(p)) false else throw e
          }
      } catch { case e: Throwable =>
        scala.util.Try(fs.delete(tmp, false)); throw e
      }
    if (!renamed) {
      scala.util.Try(fs.delete(tmp, false))
      throw new IllegalStateException(
        s"arrow-ipc tag: '$name' already exists on $dirPath (lost a " +
          "racing create) — tags are immutable; CALL drop_tag first")
    }
    TagInfo(name, id, now)
  }

  private def parse(fs: FileSystem, p: Path): TagInfo = {
    val name = p.getName.stripSuffix(".json")
    val txt = try {
      val in = fs.open(p)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    } catch { case e: java.io.IOException =>
      throw new IllegalStateException(
        s"arrow-ipc tag: cannot read tag file $p", e)
    }
    val o = try org.json4s.jackson.JsonMethods.parse(txt)
    catch { case e: Exception => throw new IllegalStateException(
      s"arrow-ipc tag: '$name' at $p is unparseable (a crashed create " +
        "leaves a torn file) — CALL drop_tag and re-create it", e)
    }
    import org.json4s._
    (o \ "snapshot", o \ "createdMs") match {
      case (JInt(s), JInt(c)) => TagInfo(name, s.toLong, c.toLong)
      case _ => throw new IllegalStateException(
        s"arrow-ipc tag: '$name' at $p is malformed (a crashed create " +
          "leaves a torn file) — CALL drop_tag and re-create it")
    }
  }

  /** All tags on the table, name-sorted. Unparseable tag files refuse
    * loudly (see [[parse]]) — a listing that silently skipped a torn
    * release pin would report "not tagged" for data that IS pinned. */
  def list(fs: FileSystem, dirPath: Path): Seq[TagInfo] = {
    val root = new Path(dirPath, TagsDir)
    if (!scala.util.Try(fs.exists(root)).getOrElse(false)) return Nil
    Option(fs.listStatus(root)).getOrElse(Array.empty)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".json"))
      .map(st => parse(fs, st.getPath)).sortBy(_.name).toSeq
  }

  /** The snapshot `name` pins, or None when no such tag. */
  def resolve(fs: FileSystem, dirPath: Path, name: String): Option[Long] = {
    val p = tagPath(dirPath, name)
    if (!fs.exists(p)) None else Some(parse(fs, p).snapshot)
  }

  /** As [[resolve]] but refusing loudly on a missing tag — the read-path
    * form (`option("tag", …)` / `VERSION AS OF '<name>'`), where a
    * silent None would surface as a confusing downstream error. */
  def resolveRequired(fs: FileSystem, dirPath: Path, name: String): Long =
    resolve(fs, dirPath, name).getOrElse {
      val have = list(fs, dirPath).map(_.name)
      throw new IllegalArgumentException(
        s"arrow-ipc tag: $dirPath has no tag '$name'" +
          (if (have.isEmpty) " (no tags)" else s" — tags: ${have.mkString(", ")}"))
    }

  /** Remove `name`; false when it did not exist. The pinned snapshot
    * stays retained until the next expire_snapshots collapses it. */
  def drop(fs: FileSystem, dirPath: Path, name: String): Boolean =
    fs.delete(tagPath(dirPath, name), false)
}
