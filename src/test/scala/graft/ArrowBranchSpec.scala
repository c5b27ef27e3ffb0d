package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowBranch, ArrowEqualityDeletes, ArrowFileStats,
  ArrowMaintenance, ArrowSnapshots}

/** Write-audit-publish branches: stage writes invisibly under
  * `.branch/<name>/` (a complete arrow-ipc dataset of its own),
  * validate via the union view, publish atomically through the generic
  * intent/replay. The Iceberg WAP workflow over this source's own
  * machinery. */
class ArrowBranchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def seed(dir: String): Unit = {
    spark.range(0, 100)
      .select(col("id").as("key"), (col("id") * 10).as("v"))
      .repartition(3)
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")
  }

  private def batch(from: Long, n: Long) =
    spark.range(from, from + n).select(col("id").as("key"), lit(-1L).as("v"))

  test("staged writes are invisible to main; the union view audits; publish lands atomically with stats folded") {
    val dir = tmp("graft_wap")
    seed(dir)
    val fs = fsOf(dir)

    ArrowBranch.write(spark, dir, "audit", batch(1000, 20))
    ArrowBranch.write(spark, dir, "audit", batch(2000, 5)) // append
    assert(ArrowBranch.list(fs, new Path(dir)) === Seq("audit"))
    // ISOLATION: main readers see nothing
    assert(spark.read.format("arrow-ipc").load(dir).count() === 100L)
    // the audit view is main ∪ branch — what publish will produce
    val audit = ArrowBranch.read(spark, dir, "audit")
    assert(audit.count() === 125L)
    assert(audit.filter(col("key") >= 1000).count() === 25L)

    val p = ArrowBranch.publish(spark, dir, "audit")
    assert(p.rows === 25L && p.files >= 2)
    val main = spark.read.format("arrow-ipc").load(dir)
    assert(main.count() === 125L)
    assert(main.filter(col("v") === -1L).count() === 25L)
    // branch is gone; its stats folded into the root manifest (pruning
    // capability survives the publish)
    assert(ArrowBranch.list(fs, new Path(dir)).isEmpty)
    val manifest = ArrowFileStats.read(fs, new Path(dir))
    val files = Option(fs.globStatus(new Path(dir, "part-*.arrows")))
      .getOrElse(Array.empty).map(_.getPath.getName)
    assert(files.forall(manifest.contains),
      "published files missing from the root stats manifest")
    // one snapshot entry, op = publish
    val snaps = ArrowSnapshots.read(fs, new Path(dir))
    assert(snaps.last.op === "publish")
    assert(snaps.last.adds.size === p.files)
  }

  test("the branch write option is the SQL-facing face; publish/drop ride CALL procedures") {
    val dir = tmp("graft_wap_call")
    seed(dir)
    batch(5000, 7).write.format("arrow-ipc")
      .option("branch", "nightly").mode("append").save(dir)
    assert(spark.read.format("arrow-ipc").load(dir).count() === 100L)
    val r = spark.sql(
      s"CALL graft.system.publish_branch('$dir', 'nightly')").head()
    assert(r.getAs[Int]("files") >= 1 && r.getAs[Long]("rows") === 7L)
    assert(spark.read.format("arrow-ipc").load(dir).count() === 107L)

    batch(6000, 3).write.format("arrow-ipc")
      .option("branch", "bad").mode("append").save(dir)
    assert(spark.sql(s"CALL graft.system.drop_branch('$dir', 'bad')")
      .head().getBoolean(0))
    assert(spark.read.format("arrow-ipc").load(dir).count() === 107L)
    assert(ArrowBranch.list(fsOf(dir), new Path(dir)).isEmpty)
  }

  test("round 14: CALL list_branches reports the staged footprint; vacuum's branch TTL drops idle branches, fresh ones survive") {
    val dir = tmp("graft_wap_ttl")
    seed(dir)
    ArrowBranch.write(spark, dir, "stale", batch(1000, 10))
    ArrowBranch.write(spark, dir, "fresh", batch(2000, 5))
    val rows = spark.sql(s"CALL graft.system.list_branches('$dir')")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Int]("files"), r.getAs[Long]("rows"))).toMap
    assert(rows.keySet === Set("fresh", "stale"))
    assert(rows("stale")._2 === 10L && rows("fresh")._2 === 5L)
    assert(rows("stale")._1 >= 1)
    // age the 'stale' branch: push every mtime under it past the TTL
    val fs = fsOf(dir)
    val bp = new Path(dir, ".branch/stale")
    val old = System.currentTimeMillis() - 10000000L
    fs.listStatus(bp).foreach(st => fs.setTimes(st.getPath, old, old))
    fs.setTimes(bp, old, old)
    spark.conf.set("spark.graft.arrow.vacuumBranchTtlMs", "5000000")
    try {
      val v = ArrowMaintenance.vacuum(spark, dir)
      assert(v.branchesExpired === Some(Seq("stale")),
        s"branch TTL expired ${v.branchesExpired}")
    } finally spark.conf.unset("spark.graft.arrow.vacuumBranchTtlMs")
    assert(ArrowBranch.list(fs, new Path(dir)) === Seq("fresh"))
    // the CALL face reports the expiry count (appended column, -1 = none)
    val vr = spark.sql(s"CALL graft.system.vacuum('$dir')").head()
    assert(vr.getAs[Int]("branches_expired") === -1)
    // and the surviving branch still publishes
    val p = ArrowBranch.publish(spark, dir, "fresh")
    assert(p.rows === 5L)
  }

  test("round 14: publish refuses on a hive-partitioned table (rows would be invisible to a hive read)") {
    val dir = tmp("graft_wap_hive")
    spark.range(0, 20)
      .select((col("id") % 2).as("p"), col("id").as("key"), col("id").as("v"))
      .write.format("arrow-ipc").option("hivePartitionKeys", "p")
      .mode("overwrite").save(dir)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")
    // the DSv2 branch write option refuses up front
    val e1 = intercept[Exception] {
      spark.range(0, 3)
        .select(lit(0L).as("p"), col("id").as("key"), col("id").as("v"))
        .write.format("arrow-ipc").option("branch", "b1")
        .mode("append").save(dir)
    }
    assert(e1.getMessage.contains("flat-layout only"))
    // and publish itself guards (a branch dir planted out-of-band)
    val fs = fsOf(dir)
    fs.mkdirs(new Path(dir, ".branch/planted"))
    val e2 = intercept[IllegalArgumentException] {
      ArrowBranch.publish(spark, dir, "planted")
    }
    assert(e2.getMessage.contains("flat-layout only"))
  }

  test("refusals: schema mismatch, invalid name, publish of a missing branch") {
    val dir = tmp("graft_wap_refuse")
    seed(dir)
    val bad = intercept[IllegalArgumentException] {
      ArrowBranch.write(spark, dir, "x",
        spark.range(3).select(col("id").as("other")))
    }
    assert(bad.getMessage.contains("do not match"))
    intercept[IllegalArgumentException] {
      ArrowBranch.write(spark, dir, "no/slashes", batch(0, 1))
    }
    intercept[IllegalArgumentException] {
      ArrowBranch.publish(spark, dir, "ghost")
    }
  }

  test("crash window: a publish intent replays to completion via recover()") {
    val dir = tmp("graft_wap_crash")
    seed(dir)
    val fs = fsOf(dir)
    val dirPath = new Path(dir)
    ArrowBranch.write(spark, dir, "crashy", batch(9000, 4))
    val rels = ArrowSnapshots.listDataFiles(fs,
      new Path(dirPath, ".branch/crashy"))
    assert(rels.nonEmpty)
    // the on-disk state of a crash right after the intent landed
    ArrowMaintenance.writeIntent(fs, dirPath, ArrowMaintenance.Intent(
      Nil, ".branch/crashy", rels.map(r => r -> r).toMap, "publish", Nil))
    fs.delete(new Path(dirPath, "_SUCCESS"), false)
    assert(ArrowMaintenance.recover(spark, dir))
    val main = spark.read.format("arrow-ipc").load(dir)
    assert(main.count() === 104L)
    assert(!fs.exists(new Path(dirPath, ".branch/crashy")))
  }

  test("equality-delete interplay: published rows are stamped with the current sequence — standing tombstones do not mask them") {
    val dir = tmp("graft_wap_eq")
    seed(dir)
    // tombstone seq 1 replaces key 5
    ArrowEqualityDeletes.upsertBatch(spark, dir, "key",
      spark.sql("SELECT 5L AS key, 555L AS v"))
    // a branch re-introduces key 5 and publishes AFTER the tombstone
    ArrowBranch.write(spark, dir, "late", batch(5, 1))
    ArrowBranch.publish(spark, dir, "late")
    val images = spark.read.format("arrow-ipc").load(dir)
      .filter(col("key") === 5).select("v")
      .collect().map(_.getLong(0)).toSet
    assert(images === Set(555L, -1L),
      s"published row wrongly masked (or old image resurrected): $images")
  }
}
