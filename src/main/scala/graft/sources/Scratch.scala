package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cluster-honest scratch space for queries that materialize intermediate
  * data (format roundtrips, the parquet signature store).
  *
  * A bare `java.io.tmpdir` path is correct in local mode but silently wrong
  * on a cluster: `file:/tmp/...` written by the driver is invisible to
  * executors (and vice versa). The scratch BASE is therefore configurable —
  * on a cluster point it at shared storage (`hdfs://...`, `s3a://...`) —
  * resolved in order:
  *
  *   1. Spark conf `spark.graft.scratch` (runtime-settable, wins);
  *   2. env `SPARK_GRAFT_SCRATCH`;
  *   3. `java.io.tmpdir` (the local-mode default, unchanged behavior).
  *
  * Each call returns a fresh UUID-suffixed directory: a fixed shared name
  * would race two concurrent sessions (one's Overwrite deleting part-files
  * the other's read already listed). Every handed-out path is registered
  * for deletion on JVM exit through the Hadoop FileSystem API (scheme-
  * agnostic, so cleanup also works for `hdfs:`/`s3a:` bases) — repeated
  * bench/verify runs no longer accumulate parquet debris in /tmp.
  */
object Scratch {

  private val issued = new java.util.concurrent.ConcurrentLinkedQueue[(String, Configuration)]()
  private val hookInstalled = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** The configured scratch base URI (no trailing slash). */
  def base(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.scratch")
      .orElse(sys.env.get("SPARK_GRAFT_SCRATCH"))
      .getOrElse(System.getProperty("java.io.tmpdir"))
      .stripSuffix("/")

  /** A fresh scratch directory path under the configured base; registered
    * for best-effort deletion at JVM exit. The directory itself is created
    * by whatever writer first targets it (Spark writers mkdirs).
    *
    * The cleanup hook registers with Hadoop's ShutdownHookManager at a
    * priority ABOVE FileSystem's own close hook — a plain
    * Runtime.addShutdownHook would run unordered against Hadoop's
    * ClientFinalizer, so the delete could hit an already-closed FileSystem
    * and silently leak exactly the debris this exists to clean. */
  def dir(spark: SparkSession, prefix: String): String = {
    val path = s"${base(spark)}/${prefix}_${UUID.randomUUID()}"
    issued.add((path, spark.sparkContext.hadoopConfiguration))
    if (hookInstalled.compareAndSet(false, true)) {
      org.apache.hadoop.util.ShutdownHookManager.get().addShutdownHook(
        new Runnable {
          override def run(): Unit = {
            var e = issued.poll()
            while (e != null) {
              try {
                val p = new Path(e._1)
                p.getFileSystem(e._2).delete(p, true)
              } catch { case _: Throwable => () } // best-effort: exit must not fail
              e = issued.poll()
            }
          }
        },
        org.apache.hadoop.fs.FileSystem.SHUTDOWN_HOOK_PRIORITY + 20)
    }
    path
  }
}
