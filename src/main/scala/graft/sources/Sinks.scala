package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-side surface (reference §2.1: IBlockOutputStream and the
  * ParallelInputsSink N:1/N:N fan-outs — in Spark, partition-local writers
  * are the N:N case and coalesce(1) the N:1 case; the interesting
  * additions are the LAYOUTS that make 100 TB reads cheap).
  */
object Sinks {

  /** Plain parquet write; N:N partition-local (the default) or N:1 via
    * coalesce. */
  def writeParquet(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned layout: one directory per `partitionCols` value.
    * Reads filtered on those columns prune whole directories (PartitionFilters
    * in the scan) — the first-line defense at 100 TB. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed table: rows hash-distributed into `numBuckets` files per the
    * bucket key, recorded in the catalog. Two tables bucketed the same way
    * join WITHOUT a shuffle — pre-paid exchange, the classic co-location
    * trick for repeated large joins. Requires saveAsTable (bucket metadata
    * lives in the catalog, not the files). */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Range-partitioned, sorted-within-partition layout: clusters rows by
    * `sortCols` so parquet row-group min/max stats become selective —
    * data skipping for range predicates without a partition column. */
  def writeClustered(
      df: DataFrame, path: String, sortCols: Seq[String], partitions: Int): Unit =
    df.repartitionByRange(partitions,
        sortCols.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** ORC interchange (the other mainstream columnar format — lossless for
    * every type this engine uses, incl. µs timestamps; same pushdown/
    * pruning machinery as parquet in Spark's reader). Kept schema-explicit
    * on read like the text sources: at 100 TB a schema is a contract, not
    * an inference. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
