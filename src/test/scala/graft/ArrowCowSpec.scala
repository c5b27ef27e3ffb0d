package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowFileStats, ArrowMaintenance}

/** Copy-on-write row-level operations: SQL UPDATE / MERGE INTO /
  * arbitrary-predicate DELETE on arrow-ipc directories through the
  * path-addressed catalog, rewriting ONLY the files that contain
  * affected rows (runtime group filtering on the `_file` metadata
  * column), with compaction's crash-safe intent/replay swap. */
class ArrowCowSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.ArrowCatalog].getName)
    s
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def files(dir: String): Set[String] = {
    val fs = fsOf(dir)
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(dir, "part-*.arrows")))
      .getOrElse(Array.empty).map(_.getPath.getName).toSet
  }

  // ── the `_file` provenance column ────────────────────────────────────

  test("SELECT _file exposes per-row provenance on flat and hive layouts") {
    val dir = tmp("graft_cow_filecol")
    spark.range(0, 100).select(col("id"))
      .repartitionByRange(4, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val withFile = spark.read.format("arrow-ipc").load(dir)
      .select(col("_file"), col("id"))
    assert(withFile.count() === 100)
    assert(withFile.select("_file").distinct().count() === files(dir).size)
    // the value is the real path: every one resolves to an existing file
    val fs = fsOf(dir)
    withFile.select("_file").distinct().collect().foreach { r =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(r.getString(0))))
    }

    val hdir = tmp("graft_cow_filecol_hive")
    import spark.implicits._
    (0 until 60).map(i => (Seq("x", "y")(i % 2), i.toLong)).toDF("part", "v")
      .write.format("arrow-ipc").option("hivePartitionKeys", "part")
      .mode("overwrite").save(hdir)
    val hv = spark.read.format("arrow-ipc").load(hdir)
      .select(col("_file"), col("part"))
    // each value directory's files serve exactly that partition's rows
    assert(hv.filter(col("part") === "x")
      .select("_file").distinct().collect()
      .forall(_.getString(0).contains("part=x")))
  }

  test("a DATA column named _file keeps ordinary filter semantics") {
    val dir = tmp("graft_cow_filedata")
    import spark.implicits._
    // the metadata column is suppressed for this schema; filters on
    // `_file` must never be read as file-identity pruning
    Seq(("abc", 1L), ("def", 2L), ("abc", 3L)).toDF("_file", "v")
      .coalesce(1).write.format("arrow-ipc").mode("overwrite").save(dir)
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.filter(col("_file") === "abc").count() === 2)
    assert(back.filter(col("_file").isin("abc", "def")).count() === 3)
    // DML needs the metadata column the shadowing suppresses — it must
    // refuse LOUDLY (a silent mis-route would corrupt the rewrite)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$dir` SET v = -1 WHERE _file = 'abc'")
    }
    assert(e.getMessage.contains("rename the data column"))
    assert(spark.read.format("arrow-ipc").load(dir).count() === 3)
  }

  // ── UPDATE ───────────────────────────────────────────────────────────

  test("UPDATE rewrites only the files that contain affected rows") {
    val dir = tmp("graft_cow_update")
    spark.range(0, 1000).select(col("id"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val before = files(dir)
    assert(before.size === 4)
    // affected rows live in exactly one range file
    val stats = ArrowFileStats.read(fsOf(dir), new org.apache.hadoop.fs.Path(dir))
    val firstMax = stats.values.map(_.cols("id").max.get.toLong).min

    val res = spark.sql(
      s"UPDATE graft.`$dir` SET v = -1 WHERE id <= $firstMax")
    assert(res.queryExecution.optimizedPlan.toString.contains("ReplaceData"))

    val after = files(dir)
    // untouched files carried over verbatim; exactly one file replaced
    assert((before -- after).size === 1, s"replaced ${before -- after}")
    assert((after -- before).nonEmpty)
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.count() === 1000)
    assert(back.filter(col("v") === -1).count() === firstMax + 1)
    assert(back.filter(col("id") <= firstMax && col("v") =!= -1).count() === 0)
    // manifest rebuilt: every live file has stats, no dead entries
    val statsAfter = ArrowFileStats.read(fsOf(dir), new org.apache.hadoop.fs.Path(dir))
    assert(statsAfter.keySet === after)
    // no staging leftovers, latch restored
    val fs = fsOf(dir)
    assert(Option(fs.globStatus(new org.apache.hadoop.fs.Path(dir, ".cow-*")))
      .getOrElse(Array.empty).isEmpty)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS")))
  }

  test("UPDATE preserves a key-grouped layout claim and its file clustering") {
    val dir = tmp("graft_cow_update_keyed")
    import spark.implicits._
    val df = (0 until 900).map(i => (Seq("A", "B", "C")(i % 3), i.toLong))
      .toDF("k", "v")
    graft.sources.Sinks.writeKeyGrouped(df, dir, Seq("k"))
    val fs = fsOf(dir)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    assert(graft.sources.ArrowLayout.read(fs, dirPath) === Seq("k"))

    spark.sql(s"UPDATE graft.`$dir` SET v = v + 10000 WHERE k = 'B'")

    // claim survives (the rewrite clustered on k), and every live file is
    // still provably single-valued on k
    assert(graft.sources.ArrowLayout.read(fs, dirPath) === Seq("k"))
    val stats = ArrowFileStats.read(fs, dirPath)
    assert(files(dir).forall { n =>
      val c = stats(n).cols("k")
      c.min.isDefined && c.min == c.max
    })
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.filter(col("k") === "B" && col("v") < 10000).count() === 0)
    assert(back.filter(col("k") === "B").count() === 300)
    assert(back.count() === 900)
  }

  test("UPDATE on a hive layout can move rows across value directories") {
    val dir = tmp("graft_cow_update_hive")
    import spark.implicits._
    (0 until 600).map(i => (Seq("x", "y")(i % 2), i.toLong)).toDF("part", "v")
      .write.format("arrow-ipc").option("hivePartitionKeys", "part")
      .mode("overwrite").save(dir)
    val fs = fsOf(dir)
    // move half of y's rows (y holds the odd v; v%4==1 is half of them)
    // into a BRAND-NEW partition value "z"
    spark.sql(s"UPDATE graft.`$dir` SET part = 'z' WHERE part = 'y' AND v % 4 = 1")
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "part=z")))
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.count() === 600)
    assert(back.filter(col("part") === "z").count() === 150)
    assert(back.filter(col("part") === "y").count() === 150)
    assert(back.filter(col("part") === "x").count() === 300)
    // x files were never touched (no affected rows live there)
    // and pruning still works through the rebuilt layout
    val pruned = spark.read.format("arrow-ipc").load(dir)
      .filter(col("part") === "z")
    assert(pruned.count() === 150)
  }

  // ── MERGE ────────────────────────────────────────────────────────────

  test("MERGE INTO: matched update + not-matched insert") {
    val dir = tmp("graft_cow_merge")
    import spark.implicits._
    (0L until 100L).map(i => (i, i * 10)).toDF("id", "amount")
      .repartitionByRange(3, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    (50L until 150L).map(i => (i, -i)).toDF("id", "amount")
      .createOrReplaceTempView("cow_merge_src")

    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING cow_merge_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET amount = s.amount
         |WHEN NOT MATCHED THEN INSERT (id, amount) VALUES (s.id, s.amount)
         |""".stripMargin)

    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.count() === 150)
    assert(back.filter(col("id") < 50 && col("amount") =!= col("id") * 10)
      .count() === 0)
    assert(back.filter(col("id") >= 50 && col("amount") =!= -col("id"))
      .count() === 0)
  }

  test("MERGE with DELETE clause and insert-only source") {
    val dir = tmp("graft_cow_merge_del")
    import spark.implicits._
    (0L until 60L).map(i => (i, s"doc$i")).toDF("id", "text")
      .repartitionByRange(2, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    (40L until 80L).map(i => (i, s"new$i")).toDF("id", "text")
      .createOrReplaceTempView("cow_merge_del_src")

    spark.sql(
      s"""MERGE INTO graft.`$dir` t USING cow_merge_del_src s ON t.id = s.id
         |WHEN MATCHED AND t.id < 50 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET text = s.text
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)

    val back = spark.read.format("arrow-ipc").load(dir).orderBy("id")
    // 0-39 untouched, 40-49 deleted, 50-59 updated, 60-79 inserted
    assert(back.count() === 40 + 10 + 20)
    assert(back.filter(col("id").between(40, 49)).count() === 0)
    assert(back.filter(col("id").between(50, 59))
      .collect().forall(r => r.getString(1) == s"new${r.getLong(0)}"))
    assert(back.filter(col("id") >= 60).count() === 20)
  }

  // ── DELETE beyond the metadata path ──────────────────────────────────

  test("a straddling DELETE falls back to copy-on-write (and prunes clean files)") {
    val dir = tmp("graft_cow_delete")
    spark.range(0, 1000).select(col("id"), (col("id") % 5).as("v"))
      .repartitionByRange(4, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val before = files(dir)
    val stats = ArrowFileStats.read(fsOf(dir), new org.apache.hadoop.fs.Path(dir))
    val firstMax = stats.values.map(_.cols("id").max.get.toLong).min

    // straddles the first file (id <= firstMax - 1 cuts inside it): the
    // metadata path refuses, COW rewrites that file's survivors only
    val res = spark.sql(s"DELETE FROM graft.`$dir` WHERE id < $firstMax")
    assert(res.queryExecution.executedPlan.toString.contains("ReplaceData"))

    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.count() === 1000 - firstMax)
    assert(back.agg(min(col("id"))).head.getLong(0) === firstMax)
    // only the straddling file was replaced
    assert((before -- files(dir)).size === 1)
  }

  test("a provable DELETE still takes the metadata-only path") {
    val dir = tmp("graft_cow_delete_meta")
    import spark.implicits._
    val df = (0 until 300).map(i => (Seq("A", "B", "C")(i % 3), i.toLong))
      .toDF("k", "v")
    graft.sources.Sinks.writeKeyGrouped(df, dir, Seq("k"))
    val res = spark.sql(s"DELETE FROM graft.`$dir` WHERE k = 'B'")
    // the EXECUTED plan is the metadata exec, not the COW rewrite (the
    // optimized plan keeps the rewrite as DeleteFromTable's fallback child)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("ReplaceData"), s"expected metadata delete, got:\n$plan")
    assert(spark.read.format("arrow-ipc").load(dir).count() === 200)
  }

  test("runtime group filtering: a zero-match UPDATE rewrites nothing") {
    val dir = tmp("graft_cow_groupfilter")
    spark.range(0, 1000).select(col("id"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val before = files(dir)
    // statically unprunable (id=5 keeps one file, v spans 0..6 in every
    // file) but id=5 has v=5, so the GROUP-FILTER subquery finds no
    // matching file and the runtime `_file IN ()` empties the rewrite
    spark.sql(s"UPDATE graft.`$dir` SET v = -1 WHERE id = 5 AND v = 3")
    assert(files(dir) === before, "no file may be rewritten when nothing matches")
    assert(spark.read.format("arrow-ipc").load(dir)
      .filter(col("v") === -1).count() === 0)
  }

  // ── crash safety ─────────────────────────────────────────────────────

  test("a crashed COW swap leaves the latch down; recover() completes it") {
    val dir = tmp("graft_cow_crash")
    spark.range(0, 400).select(col("id"), lit(0L).as("v"))
      .repartitionByRange(2, col("id"))
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    val fs = fsOf(dir)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val victim = files(dir).head

    // manufacture the mid-swap state a dead driver would leave: a fully
    // staged replacement for one file, intent recorded, latch down,
    // nothing moved yet
    val staging = ".cow-test0001"
    val replacement = spark.read.format("arrow-ipc").load(dir)
      .filter(col("_file").endsWith(victim)).filter(col("id") % 2 === 0)
      .select(col("id"), lit(-1L).as("v")).coalesce(1)
    graft.sources.ArrowInterchange.writeStream(replacement,
      new org.apache.hadoop.fs.Path(dirPath, staging).toString)
    val staged = Option(fs.globStatus(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dirPath, staging), "part-*.arrows")))
      .getOrElse(Array.empty).map(_.getPath.getName)
    assert(staged.length === 1)
    ArrowMaintenance.writeIntent(fs, dirPath, ArrowMaintenance.Intent(
      Seq(victim), staging, staged.map(s => s -> s).toMap, "cow", Nil))
    fs.delete(new org.apache.hadoop.fs.Path(dirPath, "_SUCCESS"), false)

    // mid-swap state refuses reads
    intercept[Exception] { spark.read.format("arrow-ipc").load(dir).count() }

    assert(ArrowMaintenance.recover(spark, dir))
    val back = spark.read.format("arrow-ipc").load(dir)
    assert(back.count() === 300) // 200 kept whole + 100 surviving evens
    assert(back.filter(col("v") === -1).count() === 100)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dirPath, staging)))
    // replaying the SAME recover again is a no-op (idempotent tail)
    assert(!ArrowMaintenance.recover(spark, dir))
    assert(spark.read.format("arrow-ipc").load(dir).count() === 300)
    // a COW swap never records lineage (rows changed)
    assert(ArrowMaintenance.readLineage(fs, dirPath).isEmpty)
  }

  test("UPDATE leaves sharded stats consistent and prunable") {
    val dir = tmp("graft_cow_shard")
    val key = "spark.graft.arrow.statsShardFiles"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, "2")
    try {
      spark.range(0, 600).select(col("id"), (col("id") % 3).as("v"))
        .repartitionByRange(3, col("id"))
        .write.format("arrow-ipc").mode("overwrite").save(dir)
      spark.sql(s"UPDATE graft.`$dir` SET v = 99 WHERE id < 10")
      val back = spark.read.format("arrow-ipc").load(dir)
      assert(back.count() === 600)
      assert(back.filter(col("v") === 99).count() === 10)
      // stats-based pruning still sound after the shard rebuild
      val pruned = back.filter(col("id") >= 590)
      assert(pruned.count() === 10)
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
