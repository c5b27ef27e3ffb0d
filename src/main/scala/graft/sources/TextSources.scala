package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-format sources and sinks (JSONL, CSV) — the ingestion half of a
  * training-data pipeline: raw corpora arrive as JSONL/CSV long before
  * anyone converts them to parquet. The production discipline encoded
  * here:
  *
  *  - ALWAYS an explicit schema on read. `inferSchema` is a full extra
  *    pass over the data (a non-starter at 100 TB) and type-guesses
  *    differently batch to batch — schema drift as silent corruption.
  *  - Microsecond-explicit timestamp format on BOTH sides: Spark's
  *    default JSON/CSV timestamp pattern carries milliseconds, so a
  *    write→read roundtrip would silently truncate µs precision.
  *  - PERMISSIVE corrupt-record capture on read: a bad line lands in
  *    `_corrupt_record` instead of killing the 10-hour job; the caller
  *    splits good from bad and quarantines the latter.
  *
  * Both formats are splittable as written here (uncompressed, one record
  * per line), so reads parallelize by byte range like any other scan.
  */
object TextSources {

  /** µs-precision, zone-explicit — survives the roundtrip exactly. */
  val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TsFormat)
      .json(path)

  /** Schema-enforced JSONL read; malformed lines are captured, not fatal.
    * The passed schema is augmented with `_corrupt_record` so callers can
    * `filter($"_corrupt_record".isNotNull)` into a quarantine sink. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("timestampFormat", TsFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      // explicit quote/escape: embedded JSON payload columns contain
      // commas, quotes and newline-free braces — default RFC-4180-style
      // double-quoting with backslash escape keeps them intact
      .option("quote", "\"").option("escape", "\"")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .option("quote", "\"").option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
}
