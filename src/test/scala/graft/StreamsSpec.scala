package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference DataStreams smoke tests
  * (/root/reference/DataStreams/tests/gtest_streams_smoke.cpp, fixture F6):
  * null source, union of many sources, sequential concat, column filter,
  * expression stream — as DataFrame shape/identity assertions. */
class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(StructField("int64", LongType)))

  test("null source: empty frame with declared schema") {
    val df = Engine.nullSource(spark, schema)
    assert(df.count() === 0)
    assert(df.schema === schema)
  }

  test("union of 128 sources preserves multiset (gtest union smoke)") {
    // F6: N rows of constant 42 per source.
    val one = Seq.fill(16)(42L).toDF("int64")
    val union = Seq.fill(128)(one).reduce(_ unionAll _)
    assert(union.count() === 128 * 16)
    assert(union.distinct().count() === 1)
  }

  test("sequential concat preserves order under single partition") {
    val a = Seq(1L, 2L).toDF("int64").coalesce(1)
    val b = Seq(3L, 4L).toDF("int64").coalesce(1)
    val out = a.unionAll(b).coalesce(1).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("filter-columns stream: projection by names, missing column throws") {
    val df = Seq((1L, "x")).toDF("int64", "s")
    assert(df.select("int64").columns.toSeq === Seq("int64"))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select("missing").collect()
    }
  }

  test("expression stream: res1 = x+x, res2 = x-x (gtest expression smoke)") {
    val df = Seq(42L, 7L).toDF("x")
      .select(col("x"), (col("x") + col("x")).as("res1"), (col("x") - col("x")).as("res2"))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((42L, 84L, 0L), (7L, 14L, 0L)))
  }

  test("discarding sink: noop write materializes the plan") {
    val df = Seq(1L, 2L, 3L).toDF("int64")
    df.write.format("noop").mode("overwrite").save()
  }
}
