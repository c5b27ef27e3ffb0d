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

  /** Key-grouped arrow-ipc layout — the FILE-level twin of [[writeBucketed]]
    * with no catalog required: rows hash-cluster by `keys`, sort within
    * partitions so the rolling writer cuts one single-valued file per key
    * run, and the job commit declares the layout (`_layout.json`). Two
    * directories written this way join with ZERO shuffle and zero sort
    * (`KeyGroupedPartitioning` via the stats manifest — see
    * [[ArrowLayout]]); at 100 TB that converts the dominant join cost into
    * a pre-paid write-side cluster, and unlike catalog bucketing the claim
    * is re-proven from per-file stats on every read. `partitions` bounds
    * write parallelism; file count ≈ distinct keys (one per key per
    * partition that holds it). */
  def writeKeyGrouped(df: DataFrame, path: String, keys: Seq[String],
      partitions: Int = 32, codec: Option[String] = None): Unit = {
    val cols = keys.map(org.apache.spark.sql.functions.col)
    val w = df.repartition(partitions, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.format("arrow-ipc").mode(SaveMode.Overwrite)
      .option("partitionKeys", keys.mkString(","))
    codec.fold(w)(c => w.option("codec", c)).save(path)
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

  /** Z-order (Morton) value of two integer dimensions, each min/max-scaled
    * to `bits` bits and bit-interleaved — rows close in z-value are close
    * in BOTH dimensions, so a z-sorted layout gives parquet min/max
    * row-group skipping on either column (a single-column sort clusters
    * only its own column; the other's per-file range stays global). The
    * construction is pure integer arithmetic over broadcast global
    * min/max — deterministic, engine-reproducible, oracle-checkable.
    *
    * @param a,b    integer bucket inputs (already scaled to [0, 2^bits));
    *               use [[zValueScaled]] for raw columns
    * @param bits   bits per dimension (z-value uses 2·bits total) */
  def zValue2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, "bits in 1..31")
    (0 until bits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i + 1))) +
        (shiftright(b, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i)))
    }.reduce(_ + _)
  }

  /** Z-order (Morton) value of N integer dimensions, each already scaled
    * to [0, 2^bits): bit `i` of dimension `j` lands at interleaved
    * position `i*N + (N-1-j)`, so consecutive z-values stay close in ALL
    * N dimensions at once — the N-ary generalization of [[zValue2]]
    * (which it reproduces bit-for-bit at N=2). Total interleaved width
    * `N*bits` must fit a positive long. */
  def zValueN(dims: Seq[org.apache.spark.sql.Column], bits: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val k = dims.length
    require(k >= 2, "zValueN: at least two dimensions")
    require(bits >= 1 && k * bits <= 63,
      s"zValueN: $k dims × $bits bits = ${k * bits} interleaved bits — " +
        "must stay within a positive long (≤ 63)")
    (for { i <- 0 until bits; j <- 0 until k } yield {
      val pos = i * k + (k - 1 - j)
      shiftright(dims(j), i).bitwiseAND(lit(1)).cast("long") * lit(1L << pos)
    }).reduce(_ + _)
  }

  /** Min/max-scale a raw numeric column into [0, 2^bits) given broadcast
    * global bounds (`lo`/`hi` columns from a 1-row stats frame). */
  def scaleToBits(v: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val span = (hi - lo + 1).cast("double")
    // Clamped on BOTH sides: with stored/stale bounds a value outside
    // [lo, hi] must saturate — a negative bucket would sign-extend through
    // the Morton shift and land the row in the wrong quadrant silently.
    greatest(
      least(floor((v - lo).cast("double") / span * (1L << bits)).cast("int"),
        lit((1 << bits) - 1)),
      lit(0))
  }

  /** Z-ordered clustered write: range-partition + sort by the z-value of
    * two dimensions, so parquet min/max stats are selective on BOTH
    * columns. The only pre-pass is one global min/max aggregation (1 row,
    * broadcast); the sort is the standard range-partitioned global sort. */
  def writeZOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      bits: Int, partitions: Int): Unit = {
    import org.apache.spark.sql.functions._
    val reserved = Seq("la", "ha", "lb", "hb", "__z")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"writeZOrdered: input columns ${clash.mkString(", ")} collide with " +
        s"internal names ($reserved)")
    val stats = df.agg(
      min(col(colA)).as("la"), max(col(colA)).as("ha"),
      min(col(colB)).as("lb"), max(col(colB)).as("hb"))
    val z = df.crossJoin(broadcast(stats))
      .withColumn("__z", zValue2(
        scaleToBits(col(colA), col("la"), col("ha"), bits),
        scaleToBits(col(colB), col("lb"), col("hb"), bits), bits))
      .drop("la", "ha", "lb", "hb")
    z.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Sharded training-data write: a deterministic global order (the
    * caller's sort columns — typically [[graft.ops.Sampling.epochShuffle]]'s
    * `pos_hash`) range-partitioned into `shards` roughly equal files, each
    * capped at `maxRecordsPerFile` so no shard exceeds a loader's memory
    * budget. The CONTENT and its global order are deterministic (what makes
    * a training run resumable mid-epoch); the shard BOUNDARIES come from
    * Spark's range sampling and may shift a few rows between runs — cut
    * points, not data, so re-writes are manifest-equal in total content.
    * For byte-stable per-shard manifests use [[writeShardedByHash]]. */
  def writeSharded(
      df: DataFrame, path: String, orderCols: Seq[String],
      shards: Int, maxRecordsPerFile: Long = 0L): Unit = {
    import org.apache.spark.sql.functions.col
    val w = df.repartitionByRange(shards, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }

  /** Deterministic-boundary sharded write: shard membership is a PURE
    * function of `hashCol` — a uniform 32-bit content hash such as
    * [[graft.ops.Sampling.epochShuffle]]'s `pos_hash` — with shard i
    * owning the fixed hash range [i·2³²/shards, (i+1)·2³²/shards). Unlike
    * [[writeSharded]], whose cut points come from Spark's range sampling
    * and shift a few rows between runs, two writes of the same frame
    * place every row in the SAME shard — per-shard manifests are
    * byte-stable, which is what lets an audit pipeline diff re-writes and
    * a training run resume against a re-materialized epoch.
    *
    * Layout: a `shard=N/` directory per shard (the `shard` column is
    * Hive-partition metadata, not file payload). All rows of a shard
    * hash-route to one task, so each shard is one deterministically-sorted
    * file — multiple files only if `maxRecordsPerFile` splits it, with the
    * per-DIRECTORY content still deterministic. No sampling pass, no range
    * exchange: one hash shuffle + partition-local sort, same cost shape at
    * any scale. */
  def writeShardedByHash(
      df: DataFrame, path: String, hashCol: String, tieCols: Seq[String],
      shards: Int, maxRecordsPerFile: Long = 0L): Unit = {
    import org.apache.spark.sql.functions._
    require(shards >= 1, s"shards=$shards must be >= 1")
    require(df.columns.contains(hashCol), s"hash column '$hashCol' not in frame")
    require(!df.columns.contains("shard"), "'shard' column name collision")
    // pmod into the 32-bit hash space FIRST: for the documented inputs
    // (sampleHash/pos_hash, already in [0, 2^32)) it is the identity, and
    // for a caller who passes a signed 64-bit hash (xxhash64) it spreads
    // values uniformly instead of clamping the whole corpus into the two
    // edge shards — the silent-skew failure a clamp would hide. The
    // least/greatest clamp that remains only guards float rounding at the
    // top edge.
    val pow32 = 4294967296L // 2^32 — sampleHash/pos_hash range
    val h32 = pmod(col(hashCol).cast("long"), lit(pow32))
    val shard = greatest(least(
      floor(h32.cast("double") / pow32.toDouble * shards).cast("int"),
      lit(shards - 1)), lit(0))
    val w = df.withColumn("shard", shard)
      .repartition(shards, col("shard"))
      .sortWithinPartitions(
        (col("shard") +: col(hashCol) +: tieCols.map(col)): _*)
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }

  /** Read-back manifest of a written dataset: one row per physical file
    * with row count and an order-independent content checksum (exact
    * DECIMAL SUM of per-row xxhash64 over all columns — commutative, so
    * partition order is irrelevant, and MULTIPLICITY-SENSITIVE, unlike a
    * XOR fold, where a duplicated row pair self-cancels and corruption
    * swapping {x,x} for {w,w} passes undetected; decimal addition cannot
    * overflow or wrap under ANSI) — the audit artifact an ingest pipeline
    * stores next to the data so a later re-read can prove integrity
    * without trusting file sizes. One scan, map-side combined. */
  def manifest(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(path)
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        sum(xxhash64(df.columns.map(col): _*).cast("decimal(20,0)"))
          .as("content_sum"))
      .orderBy("file")
  }

  /** Sharded write + per-shard SKETCH manifest — the executed form of the
    * build-once/merge-later story the sketch columns exist for: next to
    * each shard the manifest stores, besides row count and content
    * checksum, a KLL quantile sketch per `kllCols` column and a theta
    * distinct sketch per `thetaCols` column. A later corpus question
    * ("p90 doc length across THESE 400 shards", "distinct doc_ids across
    * two crawls") is answered by merging manifest rows — cost
    * O(shards), never a rescan of the data files. At 100 TB that is the
    * difference between reading kilobytes of manifest and re-reading the
    * corpus.
    *
    * The manifest pass is a read-back of the WRITTEN files (one extra
    * scan, map-side combined): like [[manifest]], it attests what landed
    * on disk, not what the writer intended to land. Manifest lives at
    * `path/_manifest` — an underscore directory, invisible to a plain
    * parquet read of `path`.
    *
    * Exactness contract (what makes the declared query oracle-checkable):
    * below `kllK` total values / 2^`thetaLgK` distinct values the merged
    * sketches are EXACT; beyond, the documented error bounds apply. */
  def writeShardedWithManifest(
      df: DataFrame, path: String, hashCol: String, tieCols: Seq[String],
      shards: Int, kllCols: Seq[String], thetaCols: Seq[String],
      kllK: Int = 8192, thetaLgK: Int = 14): Unit = {
    writeShardedByHash(df, path, hashCol, tieCols, shards)
    import org.apache.spark.sql.functions._
    val back = df.sparkSession.read.parquet(path) // carries the shard column
    val dataCols = back.columns.filterNot(_ == "shard")
    val aggs =
      count(lit(1)).as("rows") +:
      sum(xxhash64(dataCols.map(col): _*).cast("decimal(20,0)")).as("content_sum") +:
      (kllCols.map(c => graft.functions.QuantileSketches
         .kllSketch(col(c).cast("double"), kllK).as(s"kll_$c")) ++
       thetaCols.map(c => graft.functions.ThetaSketches
         .thetaSketch(col(c), thetaLgK).as(s"theta_$c")))
    back.groupBy(col("shard"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode(SaveMode.Overwrite).parquet(path + "/_manifest")
  }

  /** The stored per-shard manifest of [[writeShardedWithManifest]]. */
  def readShardManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path + "/_manifest")

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
