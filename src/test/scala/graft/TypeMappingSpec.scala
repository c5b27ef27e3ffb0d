package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** F5 (ut_modes.cpp:66-93): the reference's full logical-type surface mapped
  * to Spark types (SURVEY §1.3), round-tripped through parquet. */
class TypeMappingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Arrow type → Spark mapping under test (unsigned types widened).
  private val schema = StructType(Seq(
    StructField("bool", BooleanType),
    StructField("i8", ByteType), StructField("i16", ShortType),
    StructField("i32", IntegerType), StructField("i64", LongType),
    StructField("ui8", ShortType), StructField("ui16", IntegerType),
    StructField("ui32", LongType), StructField("ui64", DecimalType(20, 0)),
    StructField("f32", FloatType), StructField("f64", DoubleType),
    StructField("string", BinaryType), StructField("utf8", StringType),
    StructField("json", StringType), StructField("yson", BinaryType),
    StructField("date", DateType), StructField("datetime", TimestampType),
    StructField("ts", TimestampType),
    StructField("dec", DecimalType(12, 3))))

  private val row = Row(
    true,
    1.toByte, 2.toShort, 3, 4L,
    255.toShort, 65535, 4294967295L, new java.math.BigDecimal("18446744073709551615"),
    1.5f, 2.5,
    Array[Byte](1, 2, 3), "héllo", """{"k":1}""", Array[Byte](9),
    java.sql.Date.valueOf("2024-02-29"),
    java.sql.Timestamp.valueOf("2024-01-01 12:34:56"),
    java.sql.Timestamp.valueOf("2024-01-01 12:34:56.123456"),
    new java.math.BigDecimal("123456789.123"))

  test("full type surface round-trips through parquet with values intact") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row)), schema)
    val path = Files.createTempDirectory("graft-types").toString
    df.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    assert(back.schema === schema)
    val r = back.head()
    assert(r.getBoolean(0))
    assert(r.getByte(1) === 1 && r.getShort(2) === 2 && r.getInt(3) === 3 && r.getLong(4) === 4L)
    // unsigned widenings hold their full ranges
    assert(r.getShort(5) === 255 && r.getInt(6) === 65535 && r.getLong(7) === 4294967295L)
    assert(r.getDecimal(8) === new java.math.BigDecimal("18446744073709551615"))
    assert(r.getFloat(9) === 1.5f && r.getDouble(10) === 2.5)
    assert(r.getAs[Array[Byte]](11).toSeq === Seq[Byte](1, 2, 3))
    assert(r.getString(12) === "héllo")
    assert(r.getDate(15) === java.sql.Date.valueOf("2024-02-29"))
    assert(r.getTimestamp(17) === java.sql.Timestamp.valueOf("2024-01-01 12:34:56.123456"))
    assert(r.getDecimal(18) === new java.math.BigDecimal("123456789.123"))
  }

  test("duration maps to DayTimeIntervalType in memory") {
    // Parquet has no interval logical type; the reference's duration(us)
    // maps to DayTimeIntervalType for in-memory processing (SURVEY §1.3).
    import spark.implicits._
    val d = Seq(java.time.Duration.ofSeconds(90)).toDF("ival")
    assert(d.schema("ival").dataType.isInstanceOf[DayTimeIntervalType])
    assert(d.head().getAs[java.time.Duration](0) === java.time.Duration.ofSeconds(90))
  }

  test("month interval maps to YearMonthIntervalType in memory") {
    // switch_type.h:63-66 dispatches arrow MONTH_INTERVAL; the Spark twin
    // is YearMonthIntervalType (java.time.Period, month resolution).
    import spark.implicits._
    val d = Seq(java.time.Period.ofMonths(14)).toDF("mival")
    assert(d.schema("mival").dataType.isInstanceOf[YearMonthIntervalType])
    // Survives arithmetic and round-trips the value (14 months = 1y 2m).
    val r = d.select($"mival" + org.apache.spark.sql.functions.expr("INTERVAL '1' MONTH"))
      .as[java.time.Period].head()
    assert(r === java.time.Period.of(1, 3, 0).normalized())
  }

  test("nulls survive in every column (validity bitmap semantics)") {
    val nullRow = Row(schema.fields.map(_ => null): _*)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(nullRow)), schema)
    val path = Files.createTempDirectory("graft-types-null").toString
    df.write.mode("overwrite").parquet(path)
    val r = spark.read.parquet(path).head()
    (0 until schema.length).foreach(i => assert(r.isNullAt(i), s"col $i"))
  }
}
