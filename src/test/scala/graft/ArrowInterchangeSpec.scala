package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ArrowInterchange

/** Arrow IPC interchange: exact write→read roundtrips across the whole
  * supported type surface (incl. µs timestamps and nulls), schema
  * derivation from the stream, batch chunking, empty frames, and the
  * loud-failure contract for unsupported types. The full-table roundtrip
  * is oracle-checked as `arrow_roundtrip`. */
class ArrowInterchangeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/out"

  private val fullSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("i", IntegerType),
    StructField("b", BooleanType),
    StructField("f", FloatType),
    StructField("d", DoubleType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("ts", TimestampType),
    StructField("dt", DateType)))

  private def fullRows = Seq(
    Row(1L, 42, true, 1.5f, math.Pi, "héllo — ünïcode",
      Array[Byte](0, 1, -1, 127), Timestamp.valueOf("2024-03-01 12:34:56.123456"),
      Date.valueOf("2024-03-01")),
    Row(2L, null, null, null, null, null, null, null, null),
    Row(3L, -7, false, -0.25f, -1e300, "", Array.empty[Byte],
      new Timestamp(-1000L), Date.valueOf("1969-12-31")))

  test("roundtrip preserves every supported type exactly, including nulls") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fullRows, 2), fullSchema)
    val dir = tmp("graft_arrow_full")
    ArrowInterchange.writeStream(df, dir)
    val back = ArrowInterchange.readStream(spark, dir)
    // Arrow fields carry nullability, so even non-null flags round-trip
    assert(back.schema === fullSchema)
    val (a, b) = (df.orderBy("id").collect(), back.orderBy("id").collect())
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      (0 until x.length).foreach { c =>
        (x.get(c), y.get(c)) match {
          case (p: Array[Byte], q: Array[Byte]) => assert(p.sameElements(q), s"col $c")
          case (p, q) => assert(p === q, s"col $c")
        }
      }
    }
  }

  test("µs timestamp precision survives (not truncated to ms)") {
    val ts = Timestamp.valueOf("2024-01-02 03:04:05.000007") // 7 µs past the ms
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, ts)), 1),
      StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType))))
    val dir = tmp("graft_arrow_us")
    ArrowInterchange.writeStream(df, dir)
    val got = ArrowInterchange.readStream(spark, dir)
      .select(unix_micros(col("ts"))).as[Long].head()
    assert(got === df.select(unix_micros(col("ts"))).as[Long].head())
    assert(got % 1000 === 7) // the sub-ms digits are really there
  }

  test("batch chunking: maxRecordsPerBatch=3 over 10 rows stays exact") {
    val df = spark.range(10).select(col("id"), concat(lit("v"), col("id")).as("v"))
    val dir = tmp("graft_arrow_chunk")
    ArrowInterchange.writeStream(df.repartition(2), dir, maxRecordsPerBatch = 3)
    val back = ArrowInterchange.readStream(spark, dir)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq === (0L until 10L).map(i => (i, s"v$i")))
  }

  test("empty frame roundtrips via the schema sentinel") {
    val df = spark.range(0).select(col("id"), lit("x").as("s")).filter(lit(false))
    val dir = tmp("graft_arrow_empty")
    ArrowInterchange.writeStream(df, dir)
    val back = ArrowInterchange.readStream(spark, dir)
    assert(back.count() === 0)
    assert(back.schema.fieldNames.toSeq === Seq("id", "s"))
  }

  test("schema derives from data files when no sentinel exists (external writer)") {
    val df = spark.range(5).select(col("id"), (col("id") * 2).as("twice"))
    val dir = tmp("graft_arrow_ext")
    ArrowInterchange.writeStream(df.coalesce(1), dir)
    // simulate a foreign-written directory: delete our sentinel
    val p = new org.apache.hadoop.fs.Path(dir, "_schema.arrows")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    val back = ArrowInterchange.readStream(spark, dir)
    assert(back.schema.fieldNames.toSeq === Seq("id", "twice"))
    assert(back.as[(Long, Long)].collect().sortBy(_._1).toSeq ===
      (0L until 5L).map(i => (i, i * 2)))
  }

  test("array<scalar> columns roundtrip, including null / empty lists and null elements") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = true)),
      StructField("tags", ArrayType(StringType, containsNull = false))))
    val rows = Seq(
      Row(1L, Seq(1.5f, -2.25f, 0f), Seq("a", "b")),
      Row(2L, null, Seq.empty[String]),              // null list + empty list
      Row(3L, Seq(null, 7.75f), Seq("céç")),         // null ELEMENT survives
      Row(4L, Seq.empty[Float], Seq("x")))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp("graft_arrow_list")
    ArrowInterchange.writeStream(df, dir)
    val back = ArrowInterchange.readStream(spark, dir)
    assert(back.schema === schema)
    val got = back.orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getSeq[Any](1),
        r.getSeq[String](2))).toSeq
    assert(got === Seq(
      (1L, Seq(1.5f, -2.25f, 0f), Seq("a", "b")),
      (2L, null, Seq.empty[String]),
      (3L, Seq(null, 7.75f), Seq("céç")),
      (4L, Seq.empty[Float], Seq("x"))))
  }

  test("lz4 and zstd compressed streams roundtrip exactly and actually shrink") {
    // highly repetitive payload so compression has something to do
    val df = spark.range(2000).select(col("id"),
      concat(lit("the quick brown fox jumps over the lazy dog "), col("id")).as("s"))
    def dirSize(d: String): Long = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).map(_.getLen).sum
    }
    val plain = tmp("graft_arrow_plain")
    ArrowInterchange.writeStream(df.coalesce(1), plain)
    val expected = df.as[(Long, String)].collect().sortBy(_._1).toSeq
    for (codec <- Seq("lz4", "zstd")) {
      val dir = tmp(s"graft_arrow_$codec")
      ArrowInterchange.writeStream(df.coalesce(1), dir, codec = Some(codec))
      val back = ArrowInterchange.readStream(spark, dir)
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(back === expected, s"codec=$codec")
      assert(dirSize(dir) < dirSize(plain), s"$codec produced no size win")
    }
    intercept[IllegalArgumentException] {
      ArrowInterchange.writeStream(df, tmp("graft_arrow_badcodec"), codec = Some("snappy"))
    }
  }

  test("a partial write (sentinel without _SUCCESS) is refused, not silently read") {
    val df = spark.range(5).toDF("id")
    val dir = tmp("graft_arrow_partial")
    ArrowInterchange.writeStream(df, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a job that died mid-write: schema sentinel present, no marker
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), false)
    val e = intercept[IllegalArgumentException] {
      ArrowInterchange.readStream(spark, dir)
    }
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("unsupported column type fails loudly at write time") {
    val df = spark.range(3).select(map(col("id"), col("id")).as("m"))
    val e = intercept[IllegalArgumentException] {
      ArrowInterchange.writeStream(df, tmp("graft_arrow_bad"))
    }
    assert(e.getMessage.contains("unsupported type"))
    assert(e.getMessage.contains("'m'"))
  }
}
