package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CREATE TABLE / CTAS through the path catalog (round 12): the SQL-only
  * bootstrap. CTAS routes the ordinary batch write at the final
  * directory (one commit: sentinel + stats + snapshot + latch — readers
  * refuse the path until it lands, which is the staged atomicity);
  * plain CREATE TABLE mints the same metadata with zero files. After
  * either, the full SELECT/DML/CALL surface works with no DataFrame
  * step anywhere. */
class ArrowCtasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def cat(): Unit =
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.ArrowCatalog")

  test("CTAS lands as ONE ordinary batch-write commit; SELECT/DML/CALL follow SQL-only") {
    cat()
    val dir = tmp("graft_ctas")
    spark.sql(s"CREATE TABLE graft.`$dir` AS " +
      "SELECT id, id % 7 AS k, CAST(id * 3 AS STRING) AS s " +
      "FROM range(0, 1000)")
    val fs = fsOf(dir)
    // the write's own commit artifacts — not a bare directory of files
    assert(fs.exists(new Path(dir, "_schema.arrows")))
    assert(fs.exists(new Path(dir, "_SUCCESS")))
    assert(fs.exists(new Path(dir, "_stats.json")))
    assert(graft.sources.ArrowSnapshots.currentTip(fs, new Path(dir)) >= 1L)
    assert(spark.sql(s"SELECT COUNT(*) c FROM graft.`$dir`")
      .head().getLong(0) === 1000L)
    // DML + CALL, still SQL-only
    spark.sql(s"DELETE FROM graft.`$dir` WHERE k = 6")
    assert(spark.sql(s"SELECT COUNT(*) c FROM graft.`$dir`")
      .head().getLong(0) === 1000L - (0 until 1000).count(_ % 7 == 6))
    spark.sql(s"CALL graft.system.compact('$dir')").collect()
    assert(spark.sql(s"SELECT SUM(id) s FROM graft.`$dir`").head().getLong(0)
      === (0 until 1000).filter(_ % 7 != 6).map(_.toLong).sum)
    // CREATE over an existing table refuses
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      spark.sql(s"CREATE TABLE graft.`$dir` AS SELECT 1 AS x")
    }
  }

  test("CTAS PARTITIONED BY maps to the hive layout; pruning and appends keep working") {
    cat()
    val dir = tmp("graft_ctas_hive")
    spark.sql(s"CREATE TABLE graft.`$dir` PARTITIONED BY (k) AS " +
      "SELECT id, CAST(id % 3 AS STRING) AS k FROM range(0, 300)")
    val fs = fsOf(dir)
    assert(graft.sources.ArrowHiveLayout.read(fs, new Path(dir)) === Seq("k"))
    assert(Option(fs.globStatus(new Path(dir, "k=*"))).get.length === 3)
    assert(spark.sql(s"SELECT COUNT(*) c FROM graft.`$dir` WHERE k = '1'")
      .head().getLong(0) === 100L)
    // a following SQL INSERT routes through the standing layout
    spark.sql(s"INSERT INTO graft.`$dir` " +
      "SELECT id, CAST(id % 3 AS STRING) AS k FROM range(300, 330)")
    assert(spark.sql(s"SELECT COUNT(*) c FROM graft.`$dir`")
      .head().getLong(0) === 330L)
  }

  test("plain CREATE TABLE mints an empty dataset; INSERT INTO bootstraps it") {
    cat()
    val dir = tmp("graft_create_empty")
    spark.sql(s"CREATE TABLE graft.`$dir` (id BIGINT, k STRING)")
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() === 0L)
    // schema came from the sentinel, with field ids minted
    assert(spark.table(s"graft.`$dir`").schema.fieldNames.toSeq
      === Seq("id", "k"))
    spark.sql(s"INSERT INTO graft.`$dir` " +
      "SELECT id, CAST(id AS STRING) FROM range(0, 50)")
    assert(spark.sql(s"SELECT COUNT(*) c FROM graft.`$dir`")
      .head().getLong(0) === 50L)
    // empty partitioned create declares the layout for future inserts
    val dir2 = tmp("graft_create_empty_hive")
    spark.sql(s"CREATE TABLE graft.`$dir2` (id BIGINT, k STRING) " +
      "PARTITIONED BY (k)")
    spark.sql(s"INSERT INTO graft.`$dir2` " +
      "SELECT id, CAST(id % 2 AS STRING) FROM range(0, 40)")
    assert(Option(fsOf(dir2).globStatus(new Path(dir2, "k=*"))).get.length === 2)
    assert(spark.sql(s"SELECT COUNT(*) c FROM graft.`$dir2` WHERE k = '0'")
      .head().getLong(0) === 20L)
  }

  test("a failed CTAS leaves no table behind; REPLACE TABLE refuses") {
    cat()
    val dir = tmp("graft_ctas_abort")
    intercept[Throwable] {
      spark.sql(s"CREATE TABLE graft.`$dir` AS " +
        "SELECT assert_true(id < 10, 'boom') AS a, id FROM range(0, 100000)")
    }
    assert(!fsOf(dir).exists(new Path(dir, "_schema.arrows")),
      "an aborted CTAS left a (possibly torn) table")
    intercept[Throwable] {
      spark.sql(s"REPLACE TABLE graft.`${tmp("graft_replace")}` AS SELECT 1 AS x")
    }
  }
}
