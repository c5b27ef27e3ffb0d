package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL `CALL` maintenance procedures (DSv2 ProcedureCatalog): every
  * maintenance op as one statement, riding the same OCC-serialized
  * crash-safe implementations as the Scala entry points. */
class ArrowProcedureSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")
    s
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def files(dir: String): Seq[String] =
    graft.sources.ArrowSnapshots.listDataFiles(
      new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(dir))

  test("CALL compact merges small files and returns the counts") {
    val dir = tmp("graft_proc_compact")
    (0 until 4).foreach { i =>
      spark.range(i * 50, (i + 1) * 50).select(col("id"))
        .coalesce(1).write.format("arrow-ipc").mode("append").save(dir)
    }
    val r = spark.sql(s"CALL graft.system.compact(dir => '$dir')").head()
    assert(r.getInt(0) === 4 && r.getInt(1) === 1)
    assert(files(dir).size === 1)
    assert(spark.read.format("arrow-ipc").load(dir).count() === 200)
    // nothing to do → empty result, not an error
    assert(spark.sql(s"CALL graft.system.compact('$dir')").count() === 0)
  }

  test("CALL cluster + zorder rewrite with pruning payoffs; CALL vacuum/recover report") {
    val dir = tmp("graft_proc_cluster")
    spark.range(0, 4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).as("b"))
      .repartition(4, (col("a") * 64 + col("b")))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    def pruned(c: String): (Int, Int) = {
      val desc = spark.read.format("arrow-ipc").load(dir).filter(col(c) < 8)
        .queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.scan.description()
        }.mkString("\n")
      val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(desc).get
      (m.group(1).toInt, m.group(2).toInt)
    }
    val rc = spark.sql(
      s"CALL graft.system.cluster('$dir', 'a', target_bytes => 8192)").head()
    assert(rc.getInt(0) === 4)
    val (ka, na) = pruned("a")
    assert(ka < na, s"clustered 'a' must prune: $ka/$na")
    val rz = spark.sql(
      s"CALL graft.system.zorder('$dir', 'a, b', bits => 6, target_bytes => 8192)").head()
    assert(rz.getInt(0) >= 1)
    val (ka2, na2) = pruned("a")
    val (kb2, nb2) = pruned("b")
    assert(ka2 < na2 && kb2 < nb2, s"z-order must prune both: $ka2/$na2 $kb2/$nb2")
    // vacuum + recover: nothing pending → clean report
    val rv = spark.sql(s"CALL graft.system.vacuum('$dir')").head()
    assert(!rv.getBoolean(0) && rv.getInt(1) === 0 && rv.getInt(2) === 0)
    assert(!spark.sql(s"CALL graft.system.recover('$dir')").head().getBoolean(0))
    assert(spark.sql(s"CALL graft.system.clean_orphans('$dir')").head().getInt(0) === 0)
  }

  test("CALL expire_snapshots collapses history; unknown procedures refuse with the roster") {
    val dir = tmp("graft_proc_expire")
    (0 until 3).foreach { i =>
      spark.range(i * 10, (i + 1) * 10).select(col("id"))
        .coalesce(1).write.format("arrow-ipc").mode("append").save(dir)
    }
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 10") // snapshot 4, trash
    val r = spark.sql(s"CALL graft.system.expire_snapshots('$dir', 4)").head()
    assert(r.getInt(0) === 3)
    assert(r.getInt(1) === 1) // the deleted file's trash copy collected
    intercept[Exception] {
      spark.read.format("arrow-ipc").option("asOfSnapshot", 2).load(dir).count()
    }
    assert(spark.read.format("arrow-ipc").load(dir).count() === 20)
    val e = intercept[Exception] {
      spark.sql(s"CALL graft.system.no_such_proc('$dir')")
    }
    assert(e.getMessage.contains("no procedure") ||
      Option(e.getCause).exists(_.getMessage.contains("no procedure")))
  }

  test("CALL current_snapshot pins reproducible reads; CALL history is the log, newest first") {
    val dir = tmp("graft_proc_hist")
    (0 until 3).foreach { i =>                            // snapshots 1..3
      spark.range(i * 10, (i + 1) * 10).select(col("id"))
        .coalesce(1).write.format("arrow-ipc").mode("append").save(dir)
    }
    val tip = spark.sql(s"CALL graft.system.current_snapshot('$dir')")
      .head().getLong(0)
    assert(tip === 3L)
    // pin → later mutations are invisible to the pinned read
    spark.sql(s"DELETE FROM graft.`$dir` WHERE id < 10")  // snapshot 4
    assert(spark.read.format("arrow-ipc")
      .option("asOfSnapshot", tip).load(dir).count() === 30)
    assert(spark.read.format("arrow-ipc").load(dir).count() === 20)
    assert(spark.sql(s"CALL graft.system.current_snapshot('$dir')")
      .head().getLong(0) === 4L)
    val hist = spark.sql(s"CALL graft.system.history('$dir')").collect()
    assert(hist.map(_.getLong(0)).toSeq === Seq(4L, 3L, 2L, 1L))
    assert(hist.head.getInt(3) === 0 && hist.head.getInt(4) === 1) // the delete
    assert(hist.last.getInt(3) === 1 && hist.last.getInt(4) === 0) // first append
    assert(hist.forall(_.getTimestamp(1) != null))
    // OPERATION kinds (round 12): the log reads like DESCRIBE HISTORY —
    // three appends, then the COW/metadata delete
    assert(hist.map(_.getString(2)).toSeq ===
      Seq("delete", "append", "append", "append"))
    // a merge-on-read delete reads as a VECTOR commit, not a file churn
    graft.sources.ArrowDeleteVectors.deleteMor(spark, dir, "id = 25")
    val h5 = spark.sql(s"CALL graft.system.history('$dir')").head()
    assert(h5.getLong(0) === 5L)
    assert(h5.getString(2) === "mor-delete")
    assert(h5.getInt(3) === 0 && h5.getInt(4) === 0) // zero files touched
    assert(h5.getInt(5) === 1 && h5.getInt(6) === 0) // one vector added
    // `limit` bounds the parse to the newest N, same rows, same order
    // (the deep-history diagnostic face — round 12)
    val h2 = spark.sql(s"CALL graft.system.history('$dir', limit => 2)")
      .collect()
    assert(h2.map(_.getLong(0)).toSeq === Seq(5L, 4L))
    assert(h2.head.getInt(5) === 1)
    assert(spark.sql(s"CALL graft.system.history('$dir', limit => 0)")
      .count() === 0L)
  }

  test("CALL detail reports metadata-exact table facts without opening data files") {
    val dir = tmp("graft_proc_detail")
    spark.range(0, 90).selectExpr("id", "cast(id % 3 as string) k")
      .write.format("arrow-ipc").mode("overwrite")
      .option("hivePartitionKeys", "k")
      .option("bloomColumns", "id").save(dir)
    val d = spark.sql(s"CALL graft.system.detail('$dir')").head()
    assert(d.getString(0) === dir)
    assert(d.getInt(1) === 3)          // one file per value dir
    assert(d.getLong(2) > 0)
    assert(d.getLong(3) === 90L)       // manifest-exact row count
    assert(d.getInt(4) === 0)          // no deletion vectors yet
    assert(d.getLong(5) === 0L)
    assert(d.getString(7) === "k")     // hive keys
    assert(d.getString(8) === "id")    // bloom columns
    assert(d.getLong(9) === 1L)        // first snapshot
    // a MOR delete shows up as vectors + masked rows, and the LIVE row
    // count subtracts them — all from metadata, no file opened
    graft.sources.ArrowDeleteVectors.deleteMor(spark, dir, "id < 9")
    val d2 = spark.sql(s"CALL graft.system.detail('$dir')").head()
    assert(d2.getLong(3) === 81L)
    assert(d2.getInt(4) === 3)
    assert(d2.getLong(5) === 9L)
  }

  test("CALL list_files is the per-file ops face: rows/bytes/seq/masked from metadata alone") {
    val dir = tmp("graft_proc_files")
    spark.range(0, 90).selectExpr("id", "cast(id % 3 as string) k")
      .repartition(3)
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val before = spark.sql(s"CALL graft.system.list_files('$dir')").collect()
    assert(before.length === 3)
    assert(before.map(_.getLong(1)).sum === 90L)          // manifest rows
    assert(before.forall(_.getLong(2) > 0L))              // bytes
    assert(before.forall(_.getLong(4) === 0L))            // nothing masked
    // a MOR delete surfaces as per-file masked_rows; an equality upsert
    // stamps NEW files with the tombstone's sequence
    graft.sources.ArrowDeleteVectors.deleteMor(spark, dir, "id < 9")
    graft.sources.ArrowEqualityDeletes.upsertBatch(spark, dir, "id",
      spark.range(200, 205).coalesce(1).selectExpr("id", "'x' AS k"))
    val after = spark.sql(s"CALL graft.system.list_files('$dir')").collect()
    assert(after.map(_.getLong(4)).sum === 9L)
    assert(after.exists(_.getLong(3) === 1L))             // stamped insert
    assert(after.length === 4)
    // a FOREIGN import (file the stats manifest never saw) reports the
    // -1 sentinel for BOTH rows and seq — a genuine first-commit
    // sequence of 0 stays distinguishable from "unknown"
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = fs.globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.arrows")).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
      new org.apache.hadoop.fs.Path(dir, "part-foreign-import.arrows"),
      false, spark.sparkContext.hadoopConfiguration)
    val withForeign = spark.sql(s"CALL graft.system.list_files('$dir')")
      .collect().filter(_.getString(0).contains("foreign"))
    assert(withForeign.length === 1)
    assert(withForeign.head.getLong(1) === -1L)           // rows sentinel
    assert(withForeign.head.getLong(3) === -1L)           // seq sentinel
  }

  test("CALL update / delete_where run retrying DML; vacuum takes keep_from") {
    val dir = tmp("graft_proc_dml")
    spark.range(0, 200).select(col("id"), lit("old").as("v"))
      .repartitionByRange(2, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)          // snap 1
    val u = spark.sql(s"CALL graft.system.update('$dir', " +
      "\"v = 'new'\", 'id < 50')").head()
    assert(u.getInt(0) === 0) // uncontended: first attempt won
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.filter(col("v") === "new").count() === 50)
    val del = spark.sql(
      s"CALL graft.system.delete_where('$dir', 'id >= 150')").head()
    assert(del.getInt(0) === 0)
    assert(spark.read.format("arrow-ipc").load(dir).count() === 150)
    // vacuum with retention: expires history before the current tip
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val tip = graft.sources.ArrowSnapshots.currentTip(
      fs, new org.apache.hadoop.fs.Path(dir))
    val v = spark.sql(
      s"CALL graft.system.vacuum('$dir', keep_from => $tip)").head()
    assert(v.getInt(3) >= 1, "expiry must have dropped history")
    // expired snapshot now refuses; the tip still reads
    intercept[Exception] {
      spark.read.format("arrow-ipc").option("asOfSnapshot", 1).load(dir)
        .count()
    }
    assert(spark.read.format("arrow-ipc")
      .option("asOfSnapshot", tip).load(dir).count() === 150)
    // plain vacuum (no retention) reports -1 for the expiry columns
    val v2 = spark.sql(s"CALL graft.system.vacuum('$dir')").head()
    assert(v2.getInt(3) === -1 && v2.getInt(4) === -1)
  }

  test("CALL delete_mor masks rows via deletion vectors without touching a file") {
    val dir = tmp("graft_proc_mor")
    spark.range(0, 300).select(col("id"), (col("id") % 3).as("k"))
      .repartitionByRange(3, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def files = fs.globStatus(
        new org.apache.hadoop.fs.Path(dir, "part-*.arrows"))
      .map(st => (st.getPath.getName, st.getModificationTime)).toSet
    val before = files
    val r = spark.sql(
      s"CALL graft.system.delete_mor('$dir', 'k = 1')").head()
    assert(r.getInt(0) === 3)    // files carrying a vector
    assert(r.getLong(1) === 100) // rows masked
    assert(r.getInt(2) === 0)    // uncontended: first attempt won
    assert(files === before, "delete_mor touched a data file")
    assert(spark.read.format("arrow-ipc").load(dir).count() === 200)
    assert(spark.read.format("arrow-ipc").load(dir)
      .filter(col("k") === 1).count() === 0)
    // compact folds the vectors and the directory reads columnar again
    spark.sql(s"CALL graft.system.compact('$dir')").collect()
    assert(graft.sources.ArrowDeleteVectors.live(fs,
      new org.apache.hadoop.fs.Path(dir)).isEmpty)
    assert(spark.read.format("arrow-ipc").load(dir).count() === 200)
  }

  test("CALL ivf_build / ivf_append maintain the stored ANN index from SQL") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def mk(ids: Range) = ids.map { i =>
      (i.toLong, Array.fill(16)((if (i % 2 == 0) 5.0f else -5.0f) +
        rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
    val src = tmp("graft_proc_ivf_src")
    val src2 = tmp("graft_proc_ivf_src2")
    val idx = tmp("graft_proc_ivf_idx")
    mk(0 until 60).write.format("arrow-ipc").mode("overwrite").save(src)
    mk(60 until 80).write.format("arrow-ipc").mode("overwrite").save(src2)
    val b = spark.sql(s"CALL graft.system.ivf_build('$idx', '$src', " +
      "'vec_id', 'embedding', nlist => 8)").head()
    assert(b.getString(0).startsWith("g-") && b.getInt(1) === 8)
    val a = spark.sql(s"CALL graft.system.ivf_append('$idx', '$src2', " +
      "'vec_id', 'embedding')").head()
    assert(a.getLong(0) === 20L && a.getString(1) === b.getString(0))
    val cells = spark.read.format("arrow-ipc")
      .load(graft.ops.Similarity.ivfGenerationDir(spark, idx) + "/cells")
    assert(cells.count() === 80)
    // the index answers through the manifest
    val queries = mk(0 until 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val got = graft.ops.Similarity.ivfTopKStored(spark, idx, queries,
      "vec_id", "embedding", "qid", "qe", k = 3, nprobe = 4)
    assert(got.count() === 6)

    // CALL ivf_search (round 15): the SQL face writes the SAME ranking
    // the API returns (id/vec column names resolved from the manifest)
    val qdir = tmp("graft_proc_ivf_q")
    val out = tmp("graft_proc_ivf_out")
    queries.write.format("arrow-ipc").mode("overwrite").save(qdir)
    val s1 = spark.sql(s"CALL graft.system.ivf_search('$idx', '$qdir', " +
      s"'$out', 'qid', 'qe', k => 3, nprobe => 4)").head()
    assert(s1.getLong(0) === 2L && s1.getLong(1) === 6L)
    assert(spark.read.format("arrow-ipc").load(out)
      .orderBy("qid", "rk").collect().toSeq
      === got.orderBy("qid", "rk").collect().toSeq)

    // quantized build via CALL + refined search against the source
    // corpus: bit-identical to the refined API path
    val idxQ = tmp("graft_proc_ivf_idxq")
    spark.sql(s"CALL graft.system.ivf_build('$idxQ', '$src', 'vec_id', " +
      "'embedding', nlist => 8, quantized => true)")
    val outQ = tmp("graft_proc_ivf_outq")
    val s2 = spark.sql(s"CALL graft.system.ivf_search('$idxQ', '$qdir', " +
      s"'$outQ', 'qid', 'qe', k => 3, nprobe => 4, " +
      s"refine_dir => '$src', refine_factor => 4)").head()
    assert(s2.getLong(1) === 6L)
    val apiRefined = graft.ops.Similarity.ivfTopKStoredRefined(spark, idxQ,
      queries, spark.read.format("arrow-ipc").load(src),
      "vec_id", "embedding", "qid", "qe", k = 3, nprobe = 4,
      refineFactor = 4)
    assert(spark.read.format("arrow-ipc").load(outQ)
      .orderBy("qid", "rk").collect().toSeq
      === apiRefined.orderBy("qid", "rk").collect().toSeq)
  }

  test("CALL dedup writes the kept-set of a near-dup document directory") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base + " alpha beta gamma delta epsilon"),
      (2L, base + " alpha beta gamma delta epsilon!"),   // near-dup of 1, shorter... longer?
      (3L, "completely different text about spark catalyst optimizer internals"),
      (4L, base + " alpha beta gamma delta epsilon extended even further")
    ).toDF("doc_id", "text")
    val src = tmp("graft_proc_dedup_src")
    val out = tmp("graft_proc_dedup_out")
    docs.write.format("arrow-ipc").mode("overwrite").save(src)
    val r = spark.sql(s"CALL graft.system.dedup('$src', '$out', " +
      "'doc_id', 'text', threshold => 0.5)").head()
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) < 4L, "near-dups must have collapsed")
    val kept = spark.read.format("arrow-ipc").load(out)
    assert(kept.count() === r.getLong(1))
    // the unrelated doc always survives; the cluster keeps its longest
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(3L))
    assert(ids.contains(4L), "the longest doc of the cluster is the rep")
  }
}
