package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ArrowMaintenance, ArrowTags}

/** Tags: named, immutable snapshot refs (Iceberg's named-ref surface) —
  * created at a snapshot, resolved through VERSION AS OF / option("tag"),
  * protected from expire_snapshots until dropped. */
class ArrowTagsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** snapshot 1 = 100 rows (v = 10·key); snapshot 2 deletes evens. */
  private def seed(dir: String): Unit = {
    spark.range(0, 100)
      .select(col("id").as("key"), (col("id") * 10).as("v"))
      .repartition(3)
      .write.format("arrow-ipc").mode("overwrite").save(dir)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")
    spark.sql(s"DELETE FROM graft.`$dir` WHERE key % 2 = 0")
  }

  test("create / resolve / list / drop; VERSION AS OF and option(tag) read the pinned set") {
    val dir = tmp("graft_tag")
    seed(dir)
    val fs = fsOf(dir)
    val p = new Path(dir)

    val t1 = ArrowTags.create(fs, p, "v1.0", Some(1L))
    assert(t1.snapshot === 1L)
    val tip = ArrowTags.create(fs, p, "release-tip") // default = tip
    assert(tip.snapshot === 2L)
    assert(ArrowTags.list(fs, p).map(_.name) === Seq("release-tip", "v1.0"))
    assert(ArrowTags.resolve(fs, p, "v1.0") === Some(1L))
    assert(ArrowTags.resolve(fs, p, "nope") === None)

    // SQL face: VERSION AS OF '<tag>' pins exactly like the numeric id
    val byTag = spark.sql(s"SELECT count(*) c FROM graft.`$dir` VERSION AS OF 'v1.0'")
    assert(byTag.head().getLong(0) === 100L)
    assert(spark.sql(s"SELECT count(*) c FROM graft.`$dir` VERSION AS OF 'release-tip'")
      .head().getLong(0) === 50L)
    // path-read face: option("tag", …)
    assert(spark.read.format("arrow-ipc").option("tag", "v1.0").load(dir)
      .count() === 100L)
    // numeric VERSION AS OF still works
    assert(spark.sql(s"SELECT count(*) c FROM graft.`$dir` VERSION AS OF 1")
      .head().getLong(0) === 100L)
    // unknown tag refuses loudly, naming the live tags
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 'ghost'").collect()
    }
    assert(e.getMessage.contains("ghost") && e.getMessage.contains("v1.0"))

    assert(ArrowTags.drop(fs, p, "v1.0"))
    assert(!ArrowTags.drop(fs, p, "v1.0")) // idempotent-false
    assert(ArrowTags.resolve(fs, p, "v1.0") === None)
  }

  test("tags are immutable; all-digit and malformed names refuse; unknown snapshot refuses") {
    val dir = tmp("graft_tag_imm")
    seed(dir)
    val fs = fsOf(dir)
    val p = new Path(dir)

    ArrowTags.create(fs, p, "pin", Some(1L))
    val dup = intercept[IllegalStateException] {
      ArrowTags.create(fs, p, "pin", Some(2L))
    }
    assert(dup.getMessage.contains("immutable"))
    assert(ArrowTags.resolve(fs, p, "pin") === Some(1L)) // unchanged

    intercept[IllegalArgumentException] { ArrowTags.create(fs, p, "123") }
    intercept[IllegalArgumentException] { ArrowTags.create(fs, p, "a/b") }
    intercept[IllegalArgumentException] {
      ArrowTags.create(fs, p, "later", Some(99L)) // no such snapshot
    }
  }

  test("expire_snapshots refuses while a tag pins expired history; drop unblocks; tag AT keepFrom survives") {
    val dir = tmp("graft_tag_exp")
    seed(dir)
    val fs = fsOf(dir)
    val p = new Path(dir)

    ArrowTags.create(fs, p, "audit-v1", Some(1L))
    val e = intercept[IllegalArgumentException] {
      ArrowMaintenance.expireSnapshots(spark, dir, keepFrom = 2L)
    }
    assert(e.getMessage.contains("audit-v1"))
    // still readable — the refusal protected the pin
    assert(spark.read.format("arrow-ipc").option("tag", "audit-v1").load(dir)
      .count() === 100L)

    // a tag AT keepFrom survives the expiry (it becomes the base)
    ArrowTags.create(fs, p, "audit-v2", Some(2L))
    ArrowTags.drop(fs, p, "audit-v1")
    val ex = ArrowMaintenance.expireSnapshots(spark, dir, keepFrom = 2L)
    assert(ex.dropped === 1)
    assert(spark.read.format("arrow-ipc").option("tag", "audit-v2").load(dir)
      .count() === 50L)
    // and the dropped tag's snapshot is really gone
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1").collect()
    }
  }

  test("CALL create_tag / list_tags / drop_tag; detail reports tags") {
    val dir = tmp("graft_tag_call")
    seed(dir)

    val created = spark.sql(
      s"CALL graft.system.create_tag('$dir', 'rel-a', 1)").collect()
    assert(created.head.getString(0) === "rel-a" &&
      created.head.getLong(1) === 1L)
    spark.sql(s"CALL graft.system.create_tag('$dir', 'rel-b')") // tip
    val listed = spark.sql(s"CALL graft.system.list_tags('$dir')").collect()
    assert(listed.map(_.getString(0)).toSeq === Seq("rel-a", "rel-b"))
    assert(listed.map(_.getLong(1)).toSeq === Seq(1L, 2L))

    val det = spark.sql(s"CALL graft.system.detail('$dir')").collect().head
    assert(det.getAs[String]("tags") === "rel-a=1,rel-b=2")

    assert(spark.sql(s"CALL graft.system.drop_tag('$dir', 'rel-a')")
      .head().getBoolean(0))
    assert(spark.sql(s"CALL graft.system.list_tags('$dir')").collect()
      .map(_.getString(0)).toSeq === Seq("rel-b"))
  }

  test("tag compositions: restore to_tag, change feed between tags, streaming startingTag") {
    val base = java.nio.file.Files.createTempDirectory("graft_tag_comp").toString
    val dir = s"$base/t"
    spark.range(0, 100)
      .select(col("id").as("key"), (col("id") * 10).as("v"))
      .repartition(3)
      .write.format("arrow-ipc").mode("overwrite").save(dir)      // snap 1
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")
    val fs = fsOf(dir)
    val p = new Path(dir)
    ArrowTags.create(fs, p, "rel-1")                               // -> 1
    spark.range(100, 120)
      .select(col("id").as("key"), (col("id") * 10).as("v"))
      .write.format("arrow-ipc").mode("append").save(dir)          // snap 2
    ArrowTags.create(fs, p, "rel-2")                               // -> 2
    spark.sql(s"DELETE FROM graft.`$dir` WHERE key < 50")          // snap 3

    // change feed between the two releases: exactly the appended rows
    val feed = graft.sources.ArrowChanges.changeFeedTags(spark, dir, "rel-1", "rel-2")
    assert(feed.count() === 20L)
    assert(feed.filter(col("_change_type") === "insert").count() === 20L)

    // streaming startingTag: everything after rel-2 = the delete's effect
    import spark.implicits._
    val q = spark.readStream.format("arrow-ipc")
      .option("changeFeed", true).option("startingTag", "rel-2").load(dir)
      .writeStream.format("memory").queryName("tag_feed")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    // the COW delete rewrote its files: the feed emits the removed
    // files' rows as deletes and the survivors as re-inserts; the
    // RECONCILED effect (deleted keys minus re-inserted keys) is
    // exactly the predicate's rows — and nothing from before the tag
    val got = spark.table("tag_feed")
    val deleted = got.filter($"_change_type" === "delete")
      .select("key").as[Long].collect().toSet
    val reinserted = got.filter($"_change_type" === "insert")
      .select("key").as[Long].collect().toSet
    assert((deleted -- reinserted) === (0L until 50L).toSet)

    // restore to the tagged release by NAME (dry run first, then real)
    val dry = spark.sql(
      s"CALL graft.system.restore('$dir', to_tag => 'rel-1', dry_run => true)")
      .collect().head
    assert(dry.getInt(1) > 0) // would remove the appended files
    spark.sql(s"CALL graft.system.restore('$dir', to_tag => 'rel-1')")
    val t = spark.read.format("arrow-ipc").load(dir)
    assert(t.count() === 100L && t.agg(max(col("key"))).head().getLong(0) === 99L)
    // exactly-one-of refusal
    intercept[Exception] {
      spark.sql(s"CALL graft.system.restore('$dir', to_snapshot => 1, to_tag => 'rel-1')")
    }
  }

  test("vacuum clamps keepFrom to the oldest tag (the nightly loop degrades, never throws); direct expire still refuses") {
    val dir = tmp("graft_tag_vac")
    seed(dir) // snapshots 1 (write), 2 (delete)
    spark.range(200, 210)
      .select(col("id").as("key"), (col("id") * 10).as("v"))
      .write.format("arrow-ipc").mode("append").save(dir) // snapshot 3
    val fs = fsOf(dir)
    val p = new Path(dir)
    ArrowTags.create(fs, p, "pin-2", Some(2L))

    // vacuum asked to keep from 3 — the tag at 2 clamps it: snapshot 1
    // expires, snapshot 2 (tagged) survives, no exception
    val res = ArrowMaintenance.vacuum(spark, dir, keepFrom = Some(3L))
    assert(res.expired.exists(_.dropped === 1))
    assert(spark.read.format("arrow-ipc").option("tag", "pin-2").load(dir)
      .count() === 50L)
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft.`$dir` VERSION AS OF 1").collect()
    }
    // the explicit CALL keeps the loud refusal
    val e = intercept[Exception] {
      ArrowMaintenance.expireSnapshots(spark, dir, keepFrom = 3L)
    }
    assert(e.getMessage.contains("pin-2"))
  }

  test("tag creates leave no temp orphans; a torn FOREIGN tag file still refuses loudly; drop repairs") {
    val dir = tmp("graft_tag_atomic")
    seed(dir)
    val fs = fsOf(dir)
    val p = new Path(dir)
    ArrowTags.create(fs, p, "whole-a", Some(1L))
    ArrowTags.create(fs, p, "whole-b", Some(2L))
    // the temp+rename path leaves exactly the visible .json files behind
    val names = fs.listStatus(new Path(p, ArrowTags.TagsDir))
      .map(_.getPath.getName).sorted.toSeq
    assert(names === Seq("whole-a.json", "whole-b.json"))
    // a torn tag (foreign writer / pre-round-15 crash artifact) refuses
    // loudly on list AND resolve, naming drop_tag as the repair...
    val out = fs.create(new Path(p, s"${ArrowTags.TagsDir}/torn.json"), false)
    out.write("{\"snapsh".getBytes("UTF-8")); out.close()
    val el = intercept[IllegalStateException] { ArrowTags.list(fs, p) }
    assert(el.getMessage.contains("drop_tag"))
    intercept[IllegalStateException] { ArrowTags.resolve(fs, p, "torn") }
    // ...and drop_tag really is the repair: retention works again after
    assert(ArrowTags.drop(fs, p, "torn"))
    assert(ArrowTags.list(fs, p).map(_.name) === Seq("whole-a", "whole-b"))
  }

  test("a crashed create's tmp orphan is swept by vacuum's stale-tmp leg") {
    val dir = tmp("graft_tag_orphan")
    seed(dir)
    val fs = fsOf(dir)
    val p = new Path(dir)
    ArrowTags.create(fs, p, "keepme", Some(1L))
    // simulate the crash artifact: an AGED hidden tmp in _tags
    val orphan = new Path(p, s"${ArrowTags.TagsDir}/.dead-cafe0123.tmp")
    fs.create(orphan, false).close()
    fs.setTimes(orphan, System.currentTimeMillis() - 24L * 3600 * 1000, -1)
    ArrowMaintenance.vacuum(spark, dir)
    assert(!fs.exists(orphan), "the aged tag tmp orphan survived vacuum")
    assert(ArrowTags.resolve(fs, p, "keepme") === Some(1L)) // pin intact
    // a FRESH tmp (a create possibly in flight) is left alone
    val young = new Path(p, s"${ArrowTags.TagsDir}/.live-beef4567.tmp")
    fs.create(young, false).close()
    ArrowMaintenance.vacuum(spark, dir)
    assert(fs.exists(young), "vacuum swept a young (possibly live) tmp")
  }

  test("ambiguous time travel refuses loudly: asOfSnapshot+tag, startingSnapshot+startingTag") {
    val dir = tmp("graft_tag_ambig")
    seed(dir)
    ArrowTags.create(fsOf(dir), new Path(dir), "rel", Some(1L))
    val e1 = intercept[Exception] {
      spark.read.format("arrow-ipc")
        .option("asOfSnapshot", 2L).option("tag", "rel").load(dir).count()
    }
    assert(e1.getMessage.contains("exactly one"))
    val e2 = intercept[Exception] {
      spark.read.format("arrow-ipc").option("changeFeed", true)
        .option("startingSnapshot", 1L).option("startingTag", "rel")
        .load(dir).count()
    }
    assert(e2.getMessage.contains("exactly one"))
    // agreement is not checked — ONE pin is, by either name
    assert(spark.read.format("arrow-ipc").option("tag", "rel").load(dir)
      .count() === 100L)
  }

  test("a pinned-by-tag relation refuses mutation like any time travel") {
    val dir = tmp("graft_tag_pin")
    seed(dir)
    val fs = fsOf(dir)
    ArrowTags.create(fs, new Path(dir), "frozen", Some(1L))
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM graft.`$dir` VERSION AS OF 'frozen' WHERE key = 1")
    }
    assert(e.getMessage.toLowerCase.contains("time travel") ||
      e.getMessage.toLowerCase.contains("not supported") ||
      e.getMessage.toLowerCase.contains("delete"))
  }
}
