package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash-function surface (reference: Functions/FunctionsHashing.h:42-116
  * declares cityHash64 / xxHash32 / xxHash64 / xxh3 / wyHash64 — header-only,
  * never wired into the SSA layer).
  *
  * Capability mapping, not bit parity: Spark ships codegen'd xxhash64 /
  * murmur3 / crc32 / md5 / sha2, which cover every USE the reference has for
  * hashing (dedup keys, bucketing, fingerprints). Bit-exact cityHash64 /
  * wyHash64 would only matter for interop with externally-produced hashes —
  * nothing in the reference's tests asserts hash values (SURVEY §2.2) — and
  * would be a custom codegen Expression if ever needed.
  */
object Hashes {
  /** 64-bit xxHash (Spark's XXH64, seed 42) — the reference's xxHash64 role. */
  def xxHash64(cols: Column*): Column = xxhash64(cols: _*)

  /** 32-bit Murmur3 — the reference's xxHash32 role (fast 32-bit mix). */
  def hash32(cols: Column*): Column = hash(cols: _*)

  /** CRC32 of binary/string — checksum role. */
  def crc32Of(c: Column): Column = crc32(c)

  /** md5 / sha256 hex digests — content fingerprints (oracle-reproducible). */
  def md5Hex(c: Column): Column = md5(c)
  def sha256Hex(c: Column): Column = sha2(c, 256)
}
