package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The derived MinHash family shared by the DataFrame-level construction
  * ([[graft.ops.Dedup]]), the doc-local kernel below, and the SQL oracles:
  * h_i(x) = (a_i·x + b_i) mod P over a 32-bit base hash, P the smallest
  * prime > 2^32. a_i < 2^20 keeps a_i·x < 2^52 — exact in a long (and in
  * DuckDB's BIGINT), no wrapping, so oracles reproduce values bit-for-bit
  * from the same constants. */
object MinhashFamily {
  val P: Long = 4294967311L

  def coeffs(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val r = new scala.util.Random(0x5EED0000L + i)
      (1L + r.nextInt((1 << 20) - 1).toLong, math.floorMod(r.nextLong(), P))
    }
}

/** Doc-local shingle-set + MinHash kernel: for one text value, computes in a
  * single pass what the explode → groupBy construction computes with a
  * corpus-wide shuffle —
  *
  *   - `shset`: the SORTED DISTINCT array of 32-bit base hashes of the
  *     text's character `width`-grams (base hash = first 8 md5 hex chars as
  *     an unsigned int, identical to
  *     `conv(substring(md5(shingle),1,8),16,10)`),
  *   - `sz`: its size,
  *   - `mh`: the k MinHash values min_x (a_i·x + b_i) mod P over the set.
  *
  * Bit-identical to the exploded construction (same shingling bounds: texts
  * shorter than `width` contribute the whole text as their single shingle;
  * same md5 base; same derived family), so the DuckDB recursive-CTE oracles
  * verify it unchanged. NULL text mirrors the exploded pipeline's output
  * for a null row (`collect_set` drops the null shingle, `min` over nothing
  * is NULL): shset = [], sz = 0, every mh slot NULL.
  *
  * WHY an expression and not the explode: the exploded frame is
  * O(corpus-characters) rows through a hash aggregate (collect_set + k
  * min-aggs) — at 100 TB that is the dominant shuffle of the whole dedup
  * pipeline. This kernel makes signature computation scan-local (map-only,
  * embarrassingly parallel, nothing shuffled but the per-doc result), which
  * is exactly how production-scale MinHash dedup is shaped. Per-doc work is
  * O(len) md5s + O(k·distinct) long arithmetic — microseconds per document;
  * `CodegenFallback` at document granularity costs one virtual call per
  * ROW, irrelevant next to the hashing itself.
  *
  * Reference analog: the reference has no dedup surface (SURVEY §2 maps its
  * only dedup to replace-key merge, YdbModes/MergeData.h); this kernel is
  * part of the beyond-reference LLM-curation surface, shaped like the
  * reference's own per-batch compiled kernels (e.g. Aggregator.cpp's
  * per-block aggregation) rather than its stream graph.
  */
case class ShingleMinhash(child: Expression, width: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(width > 0, s"width=$width must be positive")
  require(k > 0, s"k=$k must be positive")

  override def dataType: DataType = StructType(Seq(
    StructField("shset", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sz", LongType, nullable = false),
    StructField("mh", ArrayType(LongType, containsNull = true), nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_minhash needs a string argument, got $other")
    }

  // (a_i, b_i) unzipped to primitive arrays for the hot loop.
  @transient private lazy val (coefA, coefB) = {
    val cs = MinhashFamily.coeffs(k)
    (cs.map(_._1).toArray, cs.map(_._2).toArray)
  }

  @transient private lazy val nullResult: InternalRow = {
    val mh = new Array[Any](k) // all null slots
    InternalRow(new GenericArrayData(Array.empty[Long]), 0L, new GenericArrayData(mh))
  }

  // Reusable per-thread digest + output buffer: the hot loop below runs
  // one md5 per shingle — per-call MessageDigest.getInstance / substring /
  // getBytes / digest-array allocations dominated the kernel (measured in
  // the round-17 optimization pass: the dedup family is CPU-bound here).
  // Shared via the companion (round-18, advisor note): per-INSTANCE
  // ThreadLocals accumulate one stale slot per (thread, plan) on
  // long-lived executors running many distinct plans.
  private def tlMd = ShingleExpressions.tlMd
  private def tlBuf = ShingleExpressions.tlBuf

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) return nullResult
    // Work directly on the value's UTF-8 bytes: ONE copy per document
    // (getBytes), then every shingle is digested as a (offset, len) slice —
    // no per-shingle String/byte[]/digest-array allocations. Code-point
    // boundaries in UTF-8 are exactly the non-continuation bytes
    // ((b & 0xC0) != 0x80), so shingling still counts CHARACTERS exactly
    // like Substring/substringSQL, and the digested bytes are identical to
    // s.substring(cp_i, cp_{i+width}).getBytes(UTF_8) — same md5 input,
    // bit-identical output to the previous per-substring form.
    val u8 = t.asInstanceOf[UTF8String]
    val bytesAll = u8.getBytes
    val bLen = bytesAll.length
    var nCp = 0
    var off = 0
    val offsets = new Array[Int](bLen + 1)
    while (off < bLen) {
      if ((bytesAll(off) & 0xc0) != 0x80) { offsets(nCp) = off; nCp += 1 }
      off += 1
    }
    offsets(nCp) = bLen

    val n = math.max(nCp - width + 1, 1)
    val bases = new Array[Long](n)
    val md = tlMd.get()
    md.reset()
    val d = tlBuf.get()
    var i = 0
    while (i < n) {
      val start = offsets(math.min(i, nCp))
      val end = offsets(math.min(i + width, nCp))
      md.update(bytesAll, start, end - start)
      md.digest(d, 0, 16) // writes in place and resets for the next round
      bases(i) =
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }

    // Sorted distinct set (what array_sort(collect_set(..)) produced).
    java.util.Arrays.sort(bases)
    var m = 0
    i = 0
    while (i < n) {
      if (m == 0 || bases(i) != bases(m - 1)) { bases(m) = bases(i); m += 1 }
      i += 1
    }
    val shset = java.util.Arrays.copyOf(bases, m)

    // MinHash over the distinct set (min over a multiset equals min over
    // the set, so distinct-first also matches the exploded construction).
    val mh = new Array[Long](k)
    java.util.Arrays.fill(mh, Long.MaxValue)
    var j = 0
    while (j < m) {
      val x = shset(j)
      var f = 0
      while (f < k) {
        val v = (coefA(f) * x + coefB(f)) % MinhashFamily.P
        if (v < mh(f)) mh(f) = v
        f += 1
      }
      j += 1
    }
    InternalRow(new GenericArrayData(shset), m.toLong, new GenericArrayData(mh))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinhash =
    copy(child = newChild)
}

/** Doc-local SimHash kernel: the 64-bit near-dup fingerprint (Charikar
  * 2002; Manku et al. WWW 2007) of a text, as 16 lowercase hex chars —
  * bit-identical to the exploded construction it replaces (one md5 per
  * whitespace token, fingerprint bit b = majority of token-hash bit b over
  * the token MULTISET), so the from-first-principles DuckDB oracle verifies
  * it unchanged.
  *
  * NULL text, empty text, or all-whitespace text (no tokens) returns NULL —
  * mirroring the exploded pipeline, where such docs simply had no token
  * rows and dropped out of the groupBy (callers filter the NULLs to get the
  * same frame).
  *
  * WHY: the exploded form pushed O(corpus tokens × 16) rows through two
  * aggregations; this kernel is scan-local — at 100 TB the fingerprint
  * stage becomes map-only with nothing shuffled but (id, 16-char string).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs a string argument, got $other")
    }

  // Same token split as split(text, "\\s+") + length>0 filter: Java regex,
  // keep-then-drop empty tokens (leading separator yields one empty token).
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  private val hex = "0123456789abcdef"

  // Reused per-thread digest + output buffer (round-17 optimization pass —
  // same rationale as ShingleMinhash: one md5 per token in the hot loop;
  // shared via the companion since round 18 — see ShingleMinhash).
  private def tlMd = ShingleExpressions.tlMd
  private def tlBuf = ShingleExpressions.tlBuf

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) return null
    val s = t.asInstanceOf[UTF8String].toString
    // counts(j*4 + bit) = tokens whose hash hex-digit j has `bit` set;
    // digit j lives in md5 byte j/2 (high nibble first) — only the first
    // 16 hex chars (8 bytes) of the md5 participate, as in the exploded
    // construction's substr(h, 1, 16).
    val counts = new Array[Int](64)
    var n = 0
    val md = tlMd.get()
    md.reset()
    val d = tlBuf.get()
    val toks = ws.split(s, -1)
    var ti = 0
    while (ti < toks.length) {
      val tok = toks(ti)
      if (tok.nonEmpty) {
        n += 1
        md.update(tok.getBytes(StandardCharsets.UTF_8))
        md.digest(d, 0, 16) // in place; resets for the next token
        var j = 0
        while (j < 16) {
          val dig = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
          val base = j * 4
          if ((dig & 8) != 0) counts(base) += 1
          if ((dig & 4) != 0) counts(base + 1) += 1
          if ((dig & 2) != 0) counts(base + 2) += 1
          if ((dig & 1) != 0) counts(base + 3) += 1
          j += 1
        }
      }
      ti += 1
    }
    if (n == 0) return null
    val out = new Array[Char](16)
    var j = 0
    while (j < 16) {
      val base = j * 4
      var nib = 0
      if (2 * counts(base) > n) nib |= 8
      if (2 * counts(base + 1) > n) nib |= 4
      if (2 * counts(base + 2) > n) nib |= 2
      if (2 * counts(base + 3) > n) nib |= 1
      out(j) = hex.charAt(nib)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object ShingleExpressions {
  /** One per-thread MD5 digest + 16-byte output buffer for ALL kernel
    * instances (JVM-wide): hoisted from the per-instance ThreadLocals so
    * a long-lived executor running many distinct plans holds one slot
    * per thread, not one per (thread, plan) — the minor leak vector the
    * round-17 advisor flagged. Safety: eval() is single-threaded per
    * task, and every use is reset-by-digest (md.digest(buf, 0, 16)
    * resets the digest for the next call). */
  private[functions] val tlMd =
    ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))
  private[functions] val tlBuf =
    ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](16))

  /** Column wrapper for [[ShingleMinhash]]: struct(shset, sz, mh). */
  def shingleMinhash(text: Column, width: Int, k: Int): Column =
    GraftSqlShim.column(ShingleMinhash(GraftSqlShim.expression(text), width, k))

  /** Column wrapper for [[SimHash64]]: 16-hex-char fingerprint, NULL when
    * the text has no tokens. */
  def simhash64(text: Column): Column =
    GraftSqlShim.column(SimHash64(GraftSqlShim.expression(text)))
}
