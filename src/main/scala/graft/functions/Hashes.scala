package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-function surface (reference: Functions/FunctionsHashing.h:42-116
  * declares cityHash64 / xxHash32 / xxHash64 / xxh3 / wyHash64).
  *
  * Two tiers:
  *  - BIT-EXACT ports ([[cityHash64]], [[xxHash32Exact]], [[xxHash64Exact]],
  *    [[xxh3]], [[wyHash64]]) — byte-identical to the reference's C
  *    libraries (CityHash v1.0.2, xxhash ≥0.8 seed 0, wyhash final 3 seed
  *    0), vector-tested in RefHashSpec. Use these when interoperating with
  *    externally persisted reference hashes.
  *  - Spark-native role equivalents ([[xxHash64]], [[hash32]], [[crc32Of]],
  *    [[md5Hex]], [[sha256Hex]]) — Spark's codegen'd builtins for the same
  *    USES (dedup keys, bucketing, fingerprints); prefer these inside pure
  *    Spark pipelines (md5/sha are also the DuckDB-reproducible ones).
  */
object Hashes {
  // ── bit-exact reference family (RefHash kernels, codegen exprs) ────────
  /** CityHash v1.0.2, 64-bit — the reference's cityHash64. */
  def cityHash64(cs: Column*): Column = HashExpressions.cityHash64(cs: _*)

  /** XXH32(bytes, seed=0), zero-extended to long (UInt32 widening). */
  def xxHash32Exact(cs: Column*): Column = HashExpressions.xxHash32(cs: _*)

  /** XXH64(bytes, seed=0) over the raw bytes — the reference's xxHash64
    * (Spark's `xxhash64` hashes Spark's value encoding with seed 42 and is
    * NOT byte-compatible). */
  def xxHash64Exact(cs: Column*): Column = HashExpressions.xxHash64Raw(cs: _*)

  /** XXH3_64bits, default secret — the reference's xxh3. */
  def xxh3(cs: Column*): Column = HashExpressions.xxh3(cs: _*)

  /** wyhash final 3, seed 0, default secret — the reference's wyHash64. */
  def wyHash64(cs: Column*): Column = HashExpressions.wyHash64(cs: _*)

  // ── Spark-native role equivalents ──────────────────────────────────────
  /** 64-bit xxHash (Spark's XXH64 over value encoding, seed 42). */
  def xxHash64(cols: Column*): Column = xxhash64(cols: _*)

  /** 32-bit Murmur3 — fast 32-bit mix role. */
  def hash32(cols: Column*): Column = hash(cols: _*)

  /** CRC32 of binary/string — checksum role. */
  def crc32Of(c: Column): Column = crc32(c)

  /** md5 / sha256 hex digests — content fingerprints (oracle-reproducible). */
  def md5Hex(c: Column): Column = md5(c)
  def sha256Hex(c: Column): Column = sha2(c, 256)
}
