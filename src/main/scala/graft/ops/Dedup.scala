package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus cleaning (beyond-reference
  * surface — the reference's only dedup is the replace-key merge, which
  * [[Sorts.replaceDedup]] covers).
  *
  * Scale design: every operator here is a pure DataFrame pipeline — shingle
  * explode, hash-shuffle on content keys, band-bucket joins — no driver-side
  * loops, no collect. Pairwise work is always bounded by bucketing (LSH
  * bands / shingle joins), never by a cross join, so the cost at 100 TB is
  * O(candidate pairs), not O(n²).
  */
object Dedup {

  /** Exact dedup: keep one representative (min of `idCol`) per distinct
    * value of `textCol`, plus the duplicate count. Grouping on md5(text)
    * instead of the full text keeps shuffle rows small for large docs;
    * a single hash-shuffle. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Character n-gram shingles: one (id, shingle) row per distinct shingle
    * per doc. The explode distributes; no driver state. Texts shorter than
    * `width` contribute the whole text as their single shingle. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, width: Int): DataFrame =
    df.select(
        col(idCol),
        explode(
          transform(
            sequence(lit(1), greatest(octet_length(col(textCol)) - (width - 1), lit(1))),
            i => col(textCol).substr(i, lit(width)))
        ).as("shingle"))
      .distinct()

  /** MinHash signature: for each of `k` seeded hash functions, the minimum
    * hash over the document's shingle set. Hash = md5("<seed>|" ++ shingle),
    * compared lexicographically on the hex string — deterministic and
    * reproducible by any engine with md5 (the SQL oracle uses the same
    * construction). Output: one row per doc, columns mh_0 … mh_{k-1}.
    *
    * One explode + one groupBy(doc); partial (map-side) min aggregation
    * means the shuffle carries O(docs·k) rows, not O(shingles). */
  def minhashSignature(
      df: DataFrame, idCol: String, textCol: String, width: Int, k: Int): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, width)
    val aggs = (0 until k).map(s =>
      min(md5(concat(lit(s.toString + "|"), col("shingle")))).as(s"mh_$s"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH candidate pairs: signatures are cut into `bands` bands of
    * k/bands values; docs sharing any band hash become a candidate pair.
    * The band-bucket self-join shuffles on the band hash — the classic LSH
    * trick that keeps the join linear in bucket sizes instead of n².
    * Output: (id_a, id_b) with id_a < id_b, distinct. */
  def minhashCandidatePairs(
      df: DataFrame, idCol: String, textCol: String,
      width: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val r = k / bands
    val sig = minhashSignature(df, idCol, textCol, width, k)
    val bandCols = (0 until bands).map { bnd =>
      val parts = (0 until r).map(i => col(s"mh_${bnd * r + i}"))
      struct(lit(bnd).as("band"), md5(concat_ws("|", parts: _*)).as("bh"))
    }
    val buckets = sig.select(col(idCol), explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = buckets.as("a")
    val b = buckets.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similar pairs: |A∩B| / |A∪B| ≥ threshold.
    * Shuffle on shingle for intersection counts; docs sharing no shingle
    * never meet (no cross join). At 100 TB, cap hot shingles by document
    * frequency (`maxShingleDf`) so stop-shingles don't quadratically blow
    * up the self-join. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      width: Int, threshold: Double, maxShingleDf: Long = Long.MaxValue): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, width)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val filtered =
      if (maxShingleDf == Long.MaxValue) sh
      else {
        val keep = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df_cnt"))
          .filter(col("df_cnt") <= maxShingleDf).select("shingle")
        sh.join(keep, "shingle")
      }
    val a = filtered.as("a")
    val b = filtered.as("b")
    val common = a.join(b, col("a.shingle") === col("b.shingle") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed(idCol, "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed(idCol, "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard", col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash fingerprint: 64-bit signature from token hashes. Each token
    * hashes to 64 bits (the first 16 hex chars of its md5); fingerprint bit
    * k is the sign of Σ_tokens (2·bit_k − 1). Near-dups differ in few bits
    * (compare via hamming distance on the returned long).
    *
    * Pure column expressions: token explode → per-token 64-int bit array →
    * elementwise sum per doc → sign → pack to one long. One shuffle. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = df
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    // bit k of the token hash = bit (3 - k%4) of hex digit floor(k/4) of the
    // token's md5; weight ±1. posexplode → (id, pos, ±1) rows: 64× the token
    // count, but map-side partial aggregation collapses each partition to
    // ≤ 64 rows per doc before the shuffle.
    val bits = transform(sequence(lit(0), lit(63)), k => {
      val hexDigit = conv(md5(col("tok")).substr(
        floor(k / 4).cast("int") + 1, lit(1)), 16, 10).cast("int")
      floor(hexDigit / pow(lit(2.0), lit(3) - (k % 4))).cast("int").bitwiseAND(lit(1))
    })
    val weighted = tokens
      .select(col(idCol), posexplode(transform(bits, b => b * 2 - 1)))
      .toDF(idCol, "pos", "wt")
    val bitSums = weighted.groupBy(col(idCol), col("pos")).agg(sum(col("wt")).as("s"))
    // Reassemble 64 ordered sign bits per doc and pack to a 16-hex-char
    // fingerprint (deterministic; hamming = popcount over unhexed bytes).
    val packed = bitSums.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
    val hexChars = (0 until 16).map { j =>
      def bit(i: Int): Column =
        when(col("ps").getItem(j * 4 + i).getField("s") > 0, 1).otherwise(0)
      lower(conv((bit(0) * 8 + bit(1) * 4 + bit(2) * 2 + bit(3)).cast("string"), 10, 16))
    }
    packed.select(col(idCol), concat(hexChars: _*).as("simhash"))
  }

  /** Embedding near-duplicate pairs by cosine ≥ threshold. nPlanes>0
    * buckets vectors by random-hyperplane signs first so only same-bucket
    * pairs are compared (the scale path); nPlanes=0 is exact brute force
    * for test scale. */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 0): DataFrame = {
    val withBucket =
      if (nPlanes <= 0) df.withColumn("bucket", lit(0))
      else df.withColumn("bucket", Similarity.hyperplaneBucket(col(vecCol), nPlanes))
    val a = withBucket.as("a")
    val b = withBucket.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        Similarity.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
