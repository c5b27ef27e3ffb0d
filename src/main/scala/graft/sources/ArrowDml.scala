package graft.sources

import org.apache.spark.sql.SparkSession

/** BOUNDED TRANSPARENT RETRY for copy-on-write DML (round 11) — the
  * Delta-semantics answer to a lost commit race, the piece that makes
  * the flagship ingest loop (streaming epochs + compaction + DML on one
  * directory) hands-free instead of paged.
  *
  * A COW UPDATE/DELETE/MERGE stages rows computed by an EXECUTED
  * ReplaceData plan; when its swap loses the OCC race (a concurrent
  * commit removed a file it rewrites), the staged rows describe a
  * snapshot that no longer exists, and the CONNECTOR cannot re-run a
  * plan it did not author — [[ArrowMaintenance.cowSwap]] therefore
  * surfaces [[ArrowOcc.CommitConflictException]] and, critically,
  * changes NOTHING (validation precedes every mutating swap step, and
  * the loser's staging is cleaned). A losing statement is therefore
  * safe to re-plan and re-execute WHOLESALE, which is exactly what this
  * wrapper does: re-run the statement text against the new snapshot
  * (table resolution is stateless — every attempt re-lists the live
  * files) up to `spark.graft.arrow.dmlRetries` (default 6) extra
  * attempts, then surface. A bare `spark.sql("UPDATE …")` still
  * surfaces the first conflict — honest, since only the statement
  * layer can re-execute a statement; route DML through this surface
  * (Scala: [[update]]/[[delete]]/[[sql]]; SQL:
  * `CALL graft.system.update/delete_where(…)`) for the retrying
  * behavior.
  *
  * Both conflict shapes retry: the clean commit-time validation
  * exception AND the mid-staging vanish (a concurrent swap trashed a
  * file between this statement's planning and a task's open) — the same
  * [[ArrowMaintenance.lostRace]] signature maintenance retries on,
  * scoped to the statement's dataset directory so a genuinely missing
  * foreign path fails once, loudly. */
object ArrowDml {

  /** Extra attempts after the first (so the default 6 means up to seven
    * executions of a persistently-losing statement). Raised 3 → 6 in
    * round 15: maintenance yields to DML markers, but two DML
    * statements race each other freely, and under the heavier
    * background mix the stress probe now runs (vacuum auto-compaction
    * beside the compact/cluster loops) a seconds-long statement's
    * scan-to-commit window overlaps a busy peer's commits often enough
    * that four executions occasionally all lose. Retry capacity is THE
    * documented lever for collision pressure — losses are cheap and
    * idempotent (a losing statement changed nothing) — and the clamped
    * exponential backoff caps the added worst-case sleep at ~2.5 s
    * across six beats. */
  private def retries: Int =
    scala.util.Try(SparkSession.active.conf
      .get("spark.graft.arrow.dmlRetries", "6").toInt).getOrElse(6)

  /** Is a lost COW commit race anywhere in the cause chain? */
  def isCommitConflict(t: Throwable): Boolean = {
    var c = t
    var d = 0
    while (c != null && d < 16) {
      if (c.isInstanceOf[ArrowOcc.CommitConflictException]) return true
      c = c.getCause
      d += 1
    }
    false
  }

  /** Run `body` (a whole DML statement) with bounded re-execution on a
    * lost race against `dir`; returns (result, retries used). Safe
    * because a losing statement changed nothing — see the object doc.
    *
    * The statement advertises itself with an `_dml-<id>` marker
    * (heartbeat-refreshed) for its whole retry span: maintenance
    * rewrites YIELD their commit to it ([[ArrowOcc.yieldToDml]]), which
    * is what lets a ~seconds COW staging win against a continuous
    * compact/cluster loop — retry alone would re-lose every attempt. */
  def withRetry[T](spark: SparkSession, dir: String)(body: => T): (T, Int) = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (id, hb) = ArrowOcc.markDml(fs, dirPath)
    try {
      val max = math.max(0, retries)
      var attempt = 0
      while (true) {
        try return (body, attempt)
        catch {
          case e: Throwable
              if (isCommitConflict(e) ||
                ArrowMaintenance.lostRace(e, dir)) && attempt < max =>
            attempt += 1
            // the winner's critical section is milliseconds; a jittered
            // beat avoids re-colliding with a maintenance LOOP. The
            // backoff is EXPONENTIAL (round 15): maintenance yields to
            // DML, but two DML statements race each other freely, and a
            // flat beat can re-synchronize with a busy peer's issue loop
            // until the bounded retries exhaust — doubling the window
            // per attempt breaks the lockstep. The shift is CLAMPED (a
            // user-raised dmlRetries must widen the count, not the
            // window: an unclamped Int shift overflows Random's bound at
            // attempt 26 and sleeps for minutes long before) — worst
            // case ~0.8 s per beat.
            val shift = math.min(attempt, 4)
            Thread.sleep((10L << shift) +
              scala.util.Random.nextInt(40 << shift))
        }
      }
      sys.error("unreachable")
    } finally ArrowOcc.clearDml(fs, dirPath, id, hb)
  }

  /** Ensure a graft path catalog is registered; returns its name. */
  private def ensureCatalog(spark: SparkSession): String = {
    val key = "spark.sql.catalog.graft"
    if (scala.util.Try(spark.conf.get(key)).toOption.isEmpty)
      spark.conf.set(key, classOf[ArrowCatalog].getName)
    "graft"
  }

  /** `UPDATE <dir> SET <assignments> [WHERE <condition>]` with bounded
    * transparent retry; returns the retries used (0 = first attempt
    * won). `assignments`/`condition` are SQL fragments. */
  def update(spark: SparkSession, dir: String, assignments: String,
      condition: Option[String] = None): Int = {
    val cat = ensureCatalog(spark)
    val stmt = s"UPDATE $cat.`$dir` SET $assignments" +
      condition.fold("")(c => s" WHERE $c")
    withRetry(spark, dir) { spark.sql(stmt); () }._2
  }

  /** `DELETE FROM <dir> [WHERE <condition>]` with bounded retry — covers
    * both the metadata fast path (which cannot conflict: it classifies
    * and commits under one lock) and the COW rewrite fallback (which
    * can). */
  def delete(spark: SparkSession, dir: String,
      condition: Option[String] = None): Int = {
    val cat = ensureCatalog(spark)
    val stmt = s"DELETE FROM $cat.`$dir`" +
      condition.fold("")(c => s" WHERE $c")
    withRetry(spark, dir) { spark.sql(stmt); () }._2
  }

  /** Any DML statement (MERGE INTO, a multi-table form) with bounded
    * retry against `dir` — the statement TEXT is re-planned each
    * attempt, so every retry reads the new snapshot. */
  def sql(spark: SparkSession, dir: String, statement: String): Int =
    withRetry(spark, dir) { spark.sql(statement); () }._2
}
