package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** TIME TRAVEL for arrow-ipc directories: an append-only snapshot log
  * (`_snapshots.json`) plus a `.trash/` retention area.
  *
  * Every committed mutation appends one snapshot entry recording the
  * file-set DELTA (relative paths added / removed). Removal never deletes
  * data: replaced and deleted files MOVE to `.trash/<relpath>` (names are
  * globally unique by the writer contract, so the flat-by-relpath trash
  * cannot collide), where `VERSION AS OF` reads find them until
  * [[ArrowMaintenance.expireSnapshots]] garbage-collects.
  *
  * Design stance — the log is ADVISORY HISTORY:
  *
  *  - LIVE reads never consult it. The live file set is what the listing
  *    machinery says it is; a missing, stale or corrupt log degrades
  *    time travel to a loud refusal and nothing else.
  *  - A time-travel read reconstructs the set at snapshot N by folding
  *    deltas with id ≤ N, then resolves each path live-first,
  *    trash-second; a path in neither place means the snapshot was
  *    expired — refuse loudly, never serve a partial snapshot.
  *  - Log integrity rides the same SINGLE-WRITER maintenance contract as
  *    the stats index (concurrent uncoordinated commits could drop each
  *    other's entry — the entry, never the data).
  *
  * Scale: one entry per commit, delta-sized. [[ArrowMaintenance
  * .expireSnapshots]] compacts the tail into one absolute entry, so the
  * log is bounded by retained history, not table lifetime. */
private[graft] object ArrowSnapshots {
  val FileName = "_snapshots.json"
  val TrashDir = ".trash"

  case class Snapshot(id: Long, tsMillis: Long,
      adds: Seq[String], removes: Seq[String])

  def read(fs: FileSystem, dir: Path): Seq[Snapshot] = {
    val p = new Path(dir, FileName)
    if (!fs.exists(p)) Nil
    else {
      import org.json4s._
      org.json4s.jackson.JsonMethods.parse(ArrowFileStats.readFully(fs, p)) \
        "snapshots" match {
        case JArray(xs) => xs.map {
          case o: JObject =>
            def strs(k: String): Seq[String] = (o \ k) match {
              case JArray(ys) => ys.collect { case JString(s) => s }
              case _ => Nil
            }
            def num(k: String): Long = (o \ k) match {
              case JInt(n) => n.toLong
              case JLong(n) => n
              case other => throw new IllegalStateException(
                s"bad $FileName: $k = $other")
            }
            Snapshot(num("id"), num("ts"), strs("adds"), strs("removes"))
          case other => throw new IllegalStateException(s"bad $FileName: $other")
        }
        case other => throw new IllegalStateException(s"bad $FileName: $other")
      }
    }
  }

  def write(fs: FileSystem, dir: Path, snaps: Seq[Snapshot]): Unit = {
    def esc(s: String) = ArrowFileStats.esc(s)
    val body = snaps.map { s =>
      s"""{"id":${s.id},"ts":${s.tsMillis},"adds":[${
        s.adds.sorted.map(a => "\"" + esc(a) + "\"").mkString(",")}],"removes":[${
        s.removes.sorted.map(r => "\"" + esc(r) + "\"").mkString(",")}]}"""
    }.mkString("{\"snapshots\":[", ",", "]}")
    // temp + rename: a torn log must not wedge time travel forever
    val tmp = new Path(dir, s"$FileName.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fin = new Path(dir, FileName)
    fs.delete(fin, false)
    if (!fs.rename(tmp, fin))
      throw new java.io.IOException(s"snapshots: rename $tmp -> $fin failed")
  }

  /** Append one delta entry; returns its id. IDEMPOTENT against crash
    * replay: an entry whose (adds, removes) equal the current tail's is
    * the same operation replayed, not a new one — skip it. */
  def append(fs: FileSystem, dir: Path,
      adds: Seq[String], removes: Seq[String]): Long = {
    val snaps = scala.util.Try(read(fs, dir)).getOrElse(Nil)
    snaps.lastOption match {
      case Some(last) if last.adds.sorted == adds.sorted &&
          last.removes.sorted == removes.sorted => last.id
      case _ =>
        val id = snaps.lastOption.fold(1L)(_.id + 1L)
        write(fs, dir, snaps :+ Snapshot(id, System.currentTimeMillis(),
          adds.sorted, removes.sorted))
        id
    }
  }

  /** The file set (relative paths) at snapshot `id`. None = the log has
    * no such snapshot (never written, expired past it, or corrupt). */
  def resolve(snaps: Seq[Snapshot], id: Long): Option[Set[String]] = {
    if (!snaps.exists(_.id == id)) return None
    // ids are appended monotonically; fold everything ≤ id
    val s = scala.collection.mutable.Set.empty[String]
    snaps.filter(_.id <= id).sortBy(_.id).foreach { e =>
      s ++= e.adds
      s --= e.removes
    }
    Some(s.toSet)
  }

  /** The latest snapshot id whose commit time is ≤ `tsMillis`. */
  def resolveAt(snaps: Seq[Snapshot], tsMillis: Long): Option[Long] =
    snaps.filter(_.tsMillis <= tsMillis).map(_.id).maxOption

  /** Path of `p` relative to the dataset root (bare name for flat
    * layouts, `key=value/...` for hive) — the log's and trash's shared
    * addressing. */
  def relativize(fs: FileSystem, dir: Path, p: Path): String = {
    val base = fs.makeQualified(dir)
    val segs = scala.collection.mutable.ListBuffer.empty[String]
    var cur = fs.makeQualified(p)
    while (cur != null && cur != base && cur.getName.nonEmpty) {
      segs.prepend(cur.getName)
      cur = cur.getParent
    }
    require(cur == base,
      s"arrow-ipc snapshots: $p is not under dataset root $base")
    segs.mkString("/")
  }

  /** Where a removed file waits for expiry (relative path preserved, so
    * hive value paths restore unambiguously). */
  def trashPath(dir: Path, rel: String): Path =
    new Path(new Path(dir, TrashDir), rel)

  /** Move `rel` to the trash (idempotent: gone-from-live no-ops; an
    * existing trash copy wins — same bytes by the unique-name contract). */
  def moveToTrash(fs: FileSystem, dir: Path, rel: String): Unit = {
    val src = new Path(dir, rel)
    if (fs.exists(src)) {
      val dst = trashPath(dir, rel)
      if (fs.exists(dst)) fs.delete(src, false)
      else {
        fs.mkdirs(dst.getParent)
        if (!fs.rename(src, dst))
          throw new java.io.IOException(s"snapshots: trash $src -> $dst failed")
      }
    }
  }
}
