package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus cleaning (beyond-reference
  * surface — the reference's only dedup is the replace-key merge, which
  * [[Sorts.replaceDedup]] covers).
  *
  * Algorithms follow the published constructions: MinHash resemblance
  * (Broder, "On the resemblance and containment of documents", 1997),
  * banded LSH (Indyk & Motwani 1998; Leskovec/Rajaraman/Ullman, MMDS ch.3),
  * SimHash (Charikar, "Similarity estimation techniques from rounding
  * algorithms", 2002; Manku et al., WWW 2007 for near-dup detection).
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
    shingleRowsRaw(df, idCol, textCol, width).distinct()

  /** Non-distinct shingles — enough for MinHash (min ignores multiplicity);
    * Jaccard sizes/sets need the distinct variant. */
  def shingleRowsRaw(df: DataFrame, idCol: String, textCol: String, width: Int): DataFrame =
    df.select(
        col(idCol),
        explode(
          transform(
            sequence(lit(1), greatest(octet_length(col(textCol)) - (width - 1), lit(1))),
            i => col(textCol).substr(i, lit(width)))
        ).as("shingle"))

  /** MinHash signature: for each of `k` seeded hash functions, the minimum
    * hash over the document's shingle set. Hash = md5("<seed>|" ++ shingle),
    * compared lexicographically on the hex string — deterministic and
    * reproducible by any engine with md5 (the SQL oracle uses the same
    * construction). Output: one row per doc, columns mh_0 … mh_{k-1}.
    *
    * One explode + one groupBy(doc); partial (map-side) min aggregation
    * means the shuffle carries O(docs·k) rows, not O(shingles). */
  def minhashSignature(
      df: DataFrame, idCol: String, textCol: String, width: Int, k: Int): DataFrame =
    // Raw (non-distinct) shingles: min over a multiset equals min over the
    // set, so the distinct's extra shuffle would be pure waste here.
    minhashSignatureFromShingles(shingleRowsRaw(df, idCol, textCol, width), idCol, k)

  /** Signature from pre-computed (id, shingle) rows — lets pipelines share
    * one shingle set between signature and verification stages. */
  def minhashSignatureFromShingles(sh: DataFrame, idCol: String, k: Int): DataFrame = {
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
      width: Int, k: Int, bands: Int): DataFrame =
    minhashCandidatePairsFromSig(
      minhashSignature(df, idCol, textCol, width, k), idCol, k, bands)

  /** LSH band-bucket candidate pairs from a signature frame. */
  def minhashCandidatePairsFromSig(
      sig: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must divide into bands=$bands")
    val r = k / bands
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

  /** Scalable n-gram Jaccard: MinHash-LSH candidate generation, then exact
    * Jaccard verification ON THE CANDIDATES ONLY — the canonical two-stage
    * dedup pipeline. Cost is O(shingles) for signatures + O(candidates ·
    * shingles/doc) for verification, never the all-pairs shingle self-join
    * (which blows up quadratically on hot shingles from a small vocab —
    * measured 263 s vs <10 s at sf0.1). */
  def jaccardPairsLsh(
      df: DataFrame, idCol: String, textCol: String,
      width: Int, threshold: Double, k: Int, bands: Int): DataFrame = {
    // ONE explode + ONE groupBy(collect_set) builds the per-doc sorted
    // shingle set; signatures are then array_min over a transform of that
    // set (pure expressions, no further shuffle) instead of a second
    // explode+distinct+groupBy pass. Bit-identical to the exploded
    // min(md5(seed|shingle)) construction the SQL oracle uses.
    // Note: collect_set is order-nondeterministic, so Catalyst recomputes
    // this subplan per reference (sig + both verify sides). A localCheckpoint
    // was tried and measured SLOWER (serializes the pipeline, ~17s vs ~12s
    // at sf0.1) — recompute wins while the explode is cheap.
    val sets = shingleRowsRaw(df, idCol, textCol, width)
      .groupBy(col(idCol))
      .agg(array_sort(collect_set(col("shingle"))).as("shset"))
      .withColumn("sz", size(col("shset")).cast("long"))
    val sigCols = (0 until k).map(s =>
      array_min(transform(col("shset"), x => md5(concat(lit(s.toString + "|"), x)))).as(s"mh_$s"))
    val sig = sets.select(col(idCol) +: sigCols: _*)
    val cand = minhashCandidatePairsFromSig(sig, idCol, k, bands)
    // Verification via the codegen linear-merge intersection kernel over the
    // sorted sets. Alternatives measured at sf0.1 (345k candidates):
    // re-joining candidates against exploded shingle rows shuffles
    // |candidates|·shingles/doc rows (73 s); array_intersect allocates a
    // hash set per row (238 s); the sorted merge is allocation-free. Sets
    // are one row per doc; broadcast so candidate pairs never shuffle with
    // array payloads. On a cluster where the set frame outgrows broadcast,
    // drop the hint — the join keys (id_a/id_b) hash-partition cleanly.
    val setsA = broadcast(sets.select(col(idCol).as("id_a"),
      col("shset").as("set_a"), col("sz").as("sz_a")))
    val setsB = broadcast(sets.select(col(idCol).as("id_b"),
      col("shset").as("set_b"), col("sz").as("sz_b")))
    cand.join(setsA, "id_a").join(setsB, "id_b")
      .withColumn("common",
        graft.functions.VectorExpressions.sortedIntersectSize(col("set_a"), col("set_b")))
      .withColumn("jaccard", col("common").cast("double") /
        (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard: |A∩B| / |A∪B| ≥ threshold.
    * Shuffle on shingle for intersection counts; docs sharing no shingle
    * never meet (no cross join). Prefer [[jaccardPairsLsh]] at scale; cap
    * hot shingles by document frequency (`maxShingleDf`) if using this so
    * stop-shingles don't quadratically blow up the self-join. */
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
    // One md5 per token; then one row per (doc, hex position 0..15, digit).
    // The ±1 bit-weight sum reduces to counting set bits: fingerprint bit =
    // 1 iff 2·count(bit set) > count(tokens). 16× explode (not 64×), and
    // map-side partial aggregation collapses to ≤16 rows per doc per
    // partition before the shuffle.
    val tokens = df
      .select(col(idCol), explode(split(col(textCol), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), md5(col("tok")).as("h"))
    val digits = tokens
      .select(col(idCol), posexplode(transform(sequence(lit(0), lit(15)),
        j => conv(col("h").substr(j + 1, lit(1)), 16, 10).cast("int"))))
      .toDF(idCol, "pos", "dig")
    val sums = digits.groupBy(col(idCol), col("pos")).agg(
      count(lit(1)).as("n"),
      sum(floor(col("dig") / 8) % 2).as("c3"),
      sum(floor(col("dig") / 4) % 2).as("c2"),
      sum(floor(col("dig") / 2) % 2).as("c1"),
      sum(col("dig") % 2).as("c0"))
    def bit(c: String): Column = when(col(c) * 2 > col("n"), 1).otherwise(0)
    val nibbles = sums.select(col(idCol), col("pos"),
      (bit("c3") * 8 + bit("c2") * 4 + bit("c1") * 2 + bit("c0")).as("nib"))
    // Reassemble the 16 ordered nibbles into a 16-hex-char fingerprint
    // (hamming distance = popcount over unhexed bytes).
    nibbles.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("nib")))).as("ps"))
      .select(col(idCol), lower(concat((0 until 16).map(j =>
        conv(col("ps").getItem(j).getField("nib").cast("string"), 10, 16)): _*))
        .as("simhash"))
  }

  /** Connected components over a similarity-pair graph — the clustering
    * step that turns pairwise near-dup hits into dedup groups (keep one
    * representative per component). Iterative min-label propagation: each
    * node takes the minimum label among itself and its neighbors until
    * fixpoint. O(diameter) joins; near-dup components are shallow in
    * practice, and the label frame stays (node, long) sized. The classic
    * large-star/small-star optimization is the upgrade path for adversarial
    * graphs.
    *
    * @param pairs (id_a, id_b) undirected edges
    * @return (idCol, component) — component = min node id reachable
    */
  def connectedComponents(
      pairs: DataFrame, idCol: String = "doc_id", maxIter: Int = 20): DataFrame = {
    // Eager localCheckpoint: materializes the (small) edge set once and
    // truncates the upstream lineage — otherwise every iteration re-plans
    // (and on cache eviction re-executes) the full pair-generation pipeline.
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct().localCheckpoint(true)
    val nodes = edges.select(col("u")).distinct()
    var labels = nodes.select(col("u"), col("u").as("label"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // neighbor minimum, then take min(own, neighbors'). Columns renamed
      // before every join — these frames share lineage (iterative self
      // joins) and qualified refs would be ambiguous.
      val lbl = labels.select(col("u").as("lu"), col("label").as("llabel"))
      val neighborMin = edges.join(lbl, col("v") === col("lu"))
        .groupBy(col("u").as("nu")).agg(min(col("llabel")).as("nmin"))
      val stepped = labels.join(neighborMin, col("u") === col("nu"), "left")
        .select(col("u"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
      // Pointer doubling: follow label → label-of-label (labels are always
      // node ids, so the lookup is total). Turns O(diameter) rounds into
      // O(log diameter) — a chain of 1000 converges in ~10 rounds.
      val byNode = stepped.select(col("u").as("ru"), col("label").as("rlabel"))
      val updated = stepped.join(byNode, col("label") === col("ru"), "left")
        .select(col("u"), coalesce(col("rlabel"), col("label")).as("label"))
        // truncate lineage — iterative plans otherwise grow per round and
        // analysis time dominates
        .localCheckpoint(true)
      val old = labels.select(col("u").as("ou"), col("label").as("old"))
      val changed = updated.join(old, col("u") === col("ou"))
        .filter(col("label") =!= col("old")).limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels.select(col("u").as(idCol), col("label").as("component"))
  }

  /** Embedding near-duplicate pairs by cosine ≥ threshold. nPlanes>0
    * buckets vectors by random-hyperplane signs first so only same-bucket
    * pairs are compared (the scale path); nPlanes=0 is exact brute force
    * for test scale. */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 0, dim: Int = 0): DataFrame = {
    // Norm is computed ONCE per vector here, not per pair — same cosine
    // formula dot/(|a|·|b|) bit-for-bit, ~3× fewer per-pair flops.
    val withNorm = df.select(col(idCol), col(vecCol),
      Similarity.norm(col(vecCol)).as("nrm"))
    val withBucket =
      if (nPlanes <= 0) withNorm.withColumn("bucket", lit(0))
      else withNorm.withColumn("bucket", Similarity.hyperplaneBucket(col(vecCol), nPlanes, dim))
    val a = withBucket.as("a")
    val b = withBucket.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(
        col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (Similarity.dot(col(s"a.$vecCol"), col(s"b.$vecCol"))
          / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
