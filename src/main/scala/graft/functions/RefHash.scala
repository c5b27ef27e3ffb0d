package graft.functions

/** Bit-exact JVM ports of the scalar hash family the reference declares
  * (/root/reference/Functions/FunctionsHashing.h:42-116): cityHash64
  * (CityHash v1.0.2 — the pre-1.1 variant ClickHouse pins), xxHash32 /
  * xxHash64 / XXH3_64bits (xxhash ≥0.8 stable, seed 0, default secret) and
  * wyHash64 (wyhash final 3, seed 0, default `_wyp` secret).
  *
  * All are published public-domain/MIT algorithms re-implemented here from
  * their specifications; the test suite asserts byte-for-byte agreement with
  * vectors generated from the upstream C libraries across every
  * length-branch of each function (RefHashSpec).
  *
  * These are plain static kernels over byte arrays so the codegen
  * expressions ([[HashExpressions]]) can call them from generated Java —
  * the same pattern Spark's own `xxhash64` uses (a static XXH64 class
  * invoked from codegen). Unsigned 64-bit arithmetic maps directly onto
  * JVM wrapping longs; `>>>` replaces unsigned shifts and
  * `Math.multiplyHigh` (+ sign corrections) provides the 128-bit products.
  */
object RefHash {

  // ── little-endian reads ────────────────────────────────────────────────
  @inline private def r8(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) | ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  /** u32 read, zero-extended to long. */
  @inline private def r4(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)

  @inline private def r4i(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) | ((b(i + 2) & 0xFF) << 16) |
      ((b(i + 3) & 0xFF) << 24)

  /** Unsigned 128-bit multiply, high word. */
  @inline private def umulHi(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  // ── CityHash64 v1.0.2 ──────────────────────────────────────────────────
  private final val CityK0 = 0xc3a5c85c97cb3127L
  private final val CityK1 = 0xb492b66fbe98f273L
  private final val CityK2 = 0x9ae16a3b2f90404fL
  private final val CityK3 = 0xc949d7c7509e6557L
  private final val CityMul = 0x9ddfea08eb382d69L

  @inline private def rot(v: Long, s: Int): Long =
    if (s == 0) v else (v >>> s) | (v << (64 - s))
  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  @inline private def hash128to64(lo: Long, hi: Long): Long = {
    var a = (lo ^ hi) * CityMul
    a ^= a >>> 47
    var b = (hi ^ a) * CityMul
    b ^= b >>> 47
    b * CityMul
  }
  @inline private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def cityLen0to16(b: Array[Byte], len: Int): Long = {
    if (len > 8) {
      val a = r8(b, 0)
      val x = r8(b, len - 8)
      // RotateByAtLeast1(x + len, len)
      hashLen16(a, ((x + len) >>> len) | ((x + len) << (64 - len))) ^ x
    } else if (len >= 4) {
      val a = r4(b, 0)
      hashLen16(len + (a << 3), r4(b, len - 4))
    } else if (len > 0) {
      val a = b(0) & 0xFFL
      val x = b(len >> 1) & 0xFFL
      val c = b(len - 1) & 0xFFL
      val y = a + (x << 8)
      val z = len + (c << 2)
      shiftMix(y * CityK2 ^ z * CityK3) * CityK2
    } else CityK2
  }

  private def cityLen17to32(b: Array[Byte], len: Int): Long = {
    val a = r8(b, 0) * CityK1
    val x = r8(b, 8)
    val c = r8(b, len - 8) * CityK2
    val d = r8(b, len - 16) * CityK0
    hashLen16(rot(a - x, 43) + rot(c, 30) + d,
      a + rot(x ^ CityK3, 20) - c + len)
  }

  /** Returns (first, second) of WeakHashLen32WithSeeds over b[off..off+31]. */
  private def cityWeak32(b: Array[Byte], off: Int, a0: Long, b0: Long): (Long, Long) = {
    val w = r8(b, off); val x = r8(b, off + 8)
    val y = r8(b, off + 16); val z = r8(b, off + 24)
    var a = a0 + w
    var bb = rot(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    bb += rot(a, 44)
    (a + z, bb + c)
  }

  private def cityLen33to64(b: Array[Byte], len: Int): Long = {
    var z = r8(b, 24)
    var a = r8(b, 0) + (len + r8(b, len - 16)) * CityK0
    var bb = rot(a + z, 52)
    var c = rot(a, 37)
    a += r8(b, 8)
    c += rot(a, 7)
    a += r8(b, 16)
    val vf = a + z
    val vs = bb + rot(a, 31) + c
    a = r8(b, 16) + r8(b, len - 32)
    z = r8(b, len - 8)
    bb = rot(a + z, 52)
    c = rot(a, 37)
    a += r8(b, len - 24)
    c += rot(a, 7)
    a += r8(b, len - 16)
    val wf = a + z
    val ws = bb + rot(a, 31) + c
    val r = shiftMix((vf + ws) * CityK2 + (wf + vs) * CityK0)
    shiftMix(r * CityK0 + vs) * CityK2
  }

  def cityHash64(b: Array[Byte]): Long = {
    val len = b.length
    if (len <= 16) return cityLen0to16(b, len)
    if (len <= 32) return cityLen17to32(b, len)
    if (len <= 64) return cityLen33to64(b, len)
    var x = r8(b, 0)
    var y = r8(b, len - 16) ^ CityK1
    var z = r8(b, len - 56) ^ CityK0
    var v = cityWeak32(b, len - 64, len.toLong, y)
    var w = cityWeak32(b, len - 32, len.toLong * CityK1, CityK0)
    z += shiftMix(v._2) * CityK1
    x = rot(z + x, 39) * CityK1
    y = rot(y, 33) * CityK1
    var rem = (len - 1) & ~63
    var off = 0
    while (rem != 0) {
      x = rot(x + y + v._1 + r8(b, off + 16), 37) * CityK1
      y = rot(y + v._2 + r8(b, off + 48), 42) * CityK1
      x ^= w._2
      y ^= v._1
      z = rot(z ^ w._1, 33)
      v = cityWeak32(b, off, v._2 * CityK1, x + w._1)
      w = cityWeak32(b, off + 32, z + w._2, y)
      val t = z; z = x; x = t
      off += 64
      rem -= 64
    }
    hashLen16(hashLen16(v._1, w._1) + shiftMix(y) * CityK1 + z,
      hashLen16(v._2, w._2) + x)
  }

  // ── xxHash32 (seed 0 for the reference role; seed kept general) ────────
  private final val XP32_1 = 0x9E3779B1
  private final val XP32_2 = 0x85EBCA77
  private final val XP32_3 = 0xC2B2AE3D
  private final val XP32_4 = 0x27D4EB2F
  private final val XP32_5 = 0x165667B1

  def xxh32(b: Array[Byte], seed: Int): Int = {
    val len = b.length
    var i = 0
    var h =
      if (len >= 16) {
        var v1 = seed + XP32_1 + XP32_2
        var v2 = seed + XP32_2
        var v3 = seed
        var v4 = seed - XP32_1
        while (i + 16 <= len) {
          v1 = Integer.rotateLeft(v1 + r4i(b, i) * XP32_2, 13) * XP32_1
          v2 = Integer.rotateLeft(v2 + r4i(b, i + 4) * XP32_2, 13) * XP32_1
          v3 = Integer.rotateLeft(v3 + r4i(b, i + 8) * XP32_2, 13) * XP32_1
          v4 = Integer.rotateLeft(v4 + r4i(b, i + 12) * XP32_2, 13) * XP32_1
          i += 16
        }
        Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
          Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
      } else seed + XP32_5
    h += len
    while (i + 4 <= len) {
      h = Integer.rotateLeft(h + r4i(b, i) * XP32_3, 17) * XP32_4
      i += 4
    }
    while (i < len) {
      h = Integer.rotateLeft(h + (b(i) & 0xFF) * XP32_5, 11) * XP32_1
      i += 1
    }
    h ^= h >>> 15
    h *= XP32_2
    h ^= h >>> 13
    h *= XP32_3
    h ^ (h >>> 16)
  }

  // ── xxHash64 ───────────────────────────────────────────────────────────
  private final val XP64_1 = 0x9E3779B185EBCA87L
  private final val XP64_2 = 0xC2B2AE3D27D4EB4FL
  private final val XP64_3 = 0x165667B19E3779F9L
  private final val XP64_4 = 0x85EBCA77C2B2AE63L
  private final val XP64_5 = 0x27D4EB2F165667C5L

  @inline private def xxh64Round(acc: Long, in: Long): Long =
    java.lang.Long.rotateLeft(acc + in * XP64_2, 31) * XP64_1
  @inline private def xxh64Merge(acc0: Long, v: Long): Long =
    (acc0 ^ xxh64Round(0L, v)) * XP64_1 + XP64_4

  def xxh64(b: Array[Byte], seed: Long): Long = {
    val len = b.length
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = seed + XP64_1 + XP64_2
        var v2 = seed + XP64_2
        var v3 = seed
        var v4 = seed - XP64_1
        while (i + 32 <= len) {
          v1 = xxh64Round(v1, r8(b, i))
          v2 = xxh64Round(v2, r8(b, i + 8))
          v3 = xxh64Round(v3, r8(b, i + 16))
          v4 = xxh64Round(v4, r8(b, i + 24))
          i += 32
        }
        var acc = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        acc = xxh64Merge(acc, v1)
        acc = xxh64Merge(acc, v2)
        acc = xxh64Merge(acc, v3)
        xxh64Merge(acc, v4)
      } else seed + XP64_5
    h += len
    while (i + 8 <= len) {
      h = java.lang.Long.rotateLeft(h ^ xxh64Round(0L, r8(b, i)), 27) * XP64_1 + XP64_4
      i += 8
    }
    if (i + 4 <= len) {
      h = java.lang.Long.rotateLeft(h ^ (r4(b, i) * XP64_1), 23) * XP64_2 + XP64_3
      i += 4
    }
    while (i < len) {
      h = java.lang.Long.rotateLeft(h ^ ((b(i) & 0xFFL) * XP64_5), 11) * XP64_1
      i += 1
    }
    h ^= h >>> 33
    h *= XP64_2
    h ^= h >>> 29
    h *= XP64_3
    h ^ (h >>> 32)
  }

  // ── XXH3 (64-bit, seed 0, default secret) ──────────────────────────────
  /** xxhash ≥0.8 default secret (XXH3_kSecret, 192 bytes). */
  private val Secret: Array[Byte] = Array(
    0xb8, 0xfe, 0x6c, 0x39, 0x23, 0xa4, 0x4b, 0xbe, 0x7c, 0x01, 0x81, 0x2c, 0xf7, 0x21, 0xad, 0x1c,
    0xde, 0xd4, 0x6d, 0xe9, 0x83, 0x90, 0x97, 0xdb, 0x72, 0x40, 0xa4, 0xa4, 0xb7, 0xb3, 0x67, 0x1f,
    0xcb, 0x79, 0xe6, 0x4e, 0xcc, 0xc0, 0xe5, 0x78, 0x82, 0x5a, 0xd0, 0x7d, 0xcc, 0xff, 0x72, 0x21,
    0xb8, 0x08, 0x46, 0x74, 0xf7, 0x43, 0x24, 0x8e, 0xe0, 0x35, 0x90, 0xe6, 0x81, 0x3a, 0x26, 0x4c,
    0x3c, 0x28, 0x52, 0xbb, 0x91, 0xc3, 0x00, 0xcb, 0x88, 0xd0, 0x65, 0x8b, 0x1b, 0x53, 0x2e, 0xa3,
    0x71, 0x64, 0x48, 0x97, 0xa2, 0x0d, 0xf9, 0x4e, 0x38, 0x19, 0xef, 0x46, 0xa9, 0xde, 0xac, 0xd8,
    0xa8, 0xfa, 0x76, 0x3f, 0xe3, 0x9c, 0x34, 0x3f, 0xf9, 0xdc, 0xbb, 0xc7, 0xc7, 0x0b, 0x4f, 0x1d,
    0x8a, 0x51, 0xe0, 0x4b, 0xcd, 0xb4, 0x59, 0x31, 0xc8, 0x9f, 0x7e, 0xc9, 0xd9, 0x78, 0x73, 0x64,
    0xea, 0xc5, 0xac, 0x83, 0x34, 0xd3, 0xeb, 0xc3, 0xc5, 0x81, 0xa0, 0xff, 0xfa, 0x13, 0x63, 0xeb,
    0x17, 0x0d, 0xdd, 0x51, 0xb7, 0xf0, 0xda, 0x49, 0xd3, 0x16, 0x55, 0x26, 0x29, 0xd4, 0x68, 0x9e,
    0x2b, 0x16, 0xbe, 0x58, 0x7d, 0x47, 0xa1, 0xfc, 0x8f, 0xf8, 0xb8, 0xd1, 0x7a, 0xd0, 0x31, 0xce,
    0x45, 0xcb, 0x3a, 0x8f, 0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e
  ).map(_.toByte)

  private final val MX1 = 0x165667919E3779F9L
  private final val MX2 = 0x9FB21C651E98DF25L

  @inline private def mul128fold64(a: Long, b: Long): Long =
    (a * b) ^ umulHi(a, b)
  @inline private def avalanche64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= XP64_2; h ^= h >>> 29; h *= XP64_3; h ^ (h >>> 32)
  }
  @inline private def avalanche3(h0: Long): Long = {
    var h = h0
    h ^= h >>> 37; h *= MX1; h ^ (h >>> 32)
  }
  @inline private def rrmxmx(h0: Long, len: Long): Long = {
    var h = h0
    h ^= java.lang.Long.rotateLeft(h, 49) ^ java.lang.Long.rotateLeft(h, 24)
    h *= MX2
    h ^= (h >>> 35) + len
    h *= MX2
    h ^ (h >>> 28)
  }
  @inline private def mix16B(b: Array[Byte], in: Int, sec: Int): Long =
    mul128fold64(r8(b, in) ^ r8(Secret, sec), r8(b, in + 8) ^ r8(Secret, sec + 8))

  def xxh3_64(b: Array[Byte]): Long = {
    val len = b.length
    if (len == 0) {
      avalanche64(r8(Secret, 56) ^ r8(Secret, 64))
    } else if (len <= 3) {
      val c1 = b(0) & 0xFFL
      val c2 = b(len >> 1) & 0xFFL
      val c3 = b(len - 1) & 0xFFL
      val combined = (c1 << 16) | (c2 << 24) | c3 | (len.toLong << 8)
      val bitflip = r4(Secret, 0) ^ r4(Secret, 4)
      avalanche64(combined ^ bitflip)
    } else if (len <= 8) {
      val in1 = r4(b, 0)
      val in2 = r4(b, len - 4)
      val bitflip = r8(Secret, 8) ^ r8(Secret, 16)
      rrmxmx((in2 | (in1 << 32)) ^ bitflip, len.toLong)
    } else if (len <= 16) {
      val lo = r8(b, 0) ^ (r8(Secret, 24) ^ r8(Secret, 32))
      val hi = r8(b, len - 8) ^ (r8(Secret, 40) ^ r8(Secret, 48))
      val acc = len.toLong + java.lang.Long.reverseBytes(lo) + hi + mul128fold64(lo, hi)
      avalanche3(acc)
    } else if (len <= 128) {
      var acc = len.toLong * XP64_1
      if (len > 32) {
        if (len > 64) {
          if (len > 96) {
            acc += mix16B(b, 48, 96)
            acc += mix16B(b, len - 64, 112)
          }
          acc += mix16B(b, 32, 64)
          acc += mix16B(b, len - 48, 80)
        }
        acc += mix16B(b, 16, 32)
        acc += mix16B(b, len - 32, 48)
      }
      acc += mix16B(b, 0, 0)
      acc += mix16B(b, len - 16, 16)
      avalanche3(acc)
    } else if (len <= 240) {
      var acc = len.toLong * XP64_1
      var i = 0
      while (i < 8) { acc += mix16B(b, 16 * i, 16 * i); i += 1 }
      acc = avalanche3(acc)
      // last 16 bytes use secret end (136 - 17); middle rounds start at +3
      var accEnd = mix16B(b, len - 16, 136 - 17)
      val nbRounds = len / 16
      i = 8
      while (i < nbRounds) {
        accEnd += mul128fold64(
          r8(b, 16 * i) ^ r8(Secret, 16 * (i - 8) + 3),
          r8(b, 16 * i + 8) ^ r8(Secret, 16 * (i - 8) + 3 + 8))
        i += 1
      }
      avalanche3(acc + accEnd)
    } else xxh3Long(b, len)
  }

  private def xxh3Long(b: Array[Byte], len: Int): Long = {
    val acc = Array(0xC2B2AE3DL, XP64_1, XP64_2, XP64_3, XP64_4, 0x85EBCA77L, XP64_5, 0x9E3779B1L)
    val nbStripesPerBlock = (192 - 64) / 8 // 16
    val blockLen = 64 * nbStripesPerBlock  // 1024
    val nbBlocks = (len - 1) / blockLen
    var n = 0
    while (n < nbBlocks) {
      accumulate(acc, b, n * blockLen, nbStripesPerBlock)
      scramble(acc)
      n += 1
    }
    val nbStripes = ((len - 1) - blockLen * nbBlocks) / 64
    accumulate(acc, b, nbBlocks * blockLen, nbStripes)
    accumulate512(acc, b, len - 64, 192 - 64 - 7)
    // merge with secret offset 11, start = len * PRIME64_1
    var res = len.toLong * XP64_1
    var i = 0
    while (i < 4) {
      res += mul128fold64(
        acc(2 * i) ^ r8(Secret, 11 + 16 * i),
        acc(2 * i + 1) ^ r8(Secret, 11 + 16 * i + 8))
      i += 1
    }
    avalanche3(res)
  }

  @inline private def accumulate512(acc: Array[Long], b: Array[Byte], in: Int, sec: Int): Unit = {
    var lane = 0
    while (lane < 8) {
      val dv = r8(b, in + lane * 8)
      val dk = dv ^ r8(Secret, sec + lane * 8)
      acc(lane ^ 1) += dv
      acc(lane) += (dk & 0xFFFFFFFFL) * (dk >>> 32)
      lane += 1
    }
  }

  @inline private def accumulate(acc: Array[Long], b: Array[Byte], in: Int, nbStripes: Int): Unit = {
    var s = 0
    while (s < nbStripes) {
      accumulate512(acc, b, in + s * 64, s * 8)
      s += 1
    }
  }

  @inline private def scramble(acc: Array[Long]): Unit = {
    var lane = 0
    while (lane < 8) {
      var a = acc(lane)
      a ^= a >>> 47
      a ^= r8(Secret, 128 + lane * 8)
      a *= 0x9E3779B1L
      acc(lane) = a
      lane += 1
    }
  }

  // ── multi-argument combines (FunctionsHashing.h combineHashes) ─────────
  // The reference hashes each column separately and folds:
  // h = apply(col0); h = combineHashes(h, apply(colN)) ...

  /** city / xxHash64 / xxh3 combine: Hash128to64(uint128(h1, h2)). */
  def combine64(h1: Long, h2: Long): Long = hash128to64(h1, h2)

  /** Thomas Wang 64→32 int hash with the reference's salt
    * (Common/HashTable/Hash.h:372-384, IntHash32Impl). */
  def intHash32(key0: Long): Int = {
    var key = key0 ^ 0x75D9543DE018BF45L
    key = (~key) + (key << 18)
    key = key ^ ((key >>> 31) | (key << 33))
    key = key * 21
    key = key ^ ((key >>> 11) | (key << 53))
    key = key + (key << 6)
    key = key ^ ((key >>> 22) | (key << 42))
    key.toInt
  }

  /** Reference IntHash64Impl: murmur-finalizer int hash of x ^ const
    * (FunctionsHashing.h:29-31, Common/HashTable/Hash.h:31-40) — the
    * integer-key hashing role. */
  def intHash64(x0: Long): Long = {
    var x = x0 ^ 0x4CF2D2BAAE6DA887L
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** xxHash32 combine: intHash32(h1) ^ h2 (UInt32 domain, zero-extended). */
  def combineXxh32(h1: Long, h2: Long): Long =
    ((intHash32(h1) & 0xFFFFFFFFL) ^ h2) & 0xFFFFFFFFL

  /** wyHash64 combine: wyhash over the 16 little-endian bytes of {h1, h2}
    * (combineHashesFunc — transformEndianness is a no-op on LE). */
  def combineWy(h1: Long, h2: Long): Long = {
    val b = new Array[Byte](16)
    var i = 0
    while (i < 8) { b(i) = (h1 >>> (8 * i)).toByte; b(8 + i) = (h2 >>> (8 * i)).toByte; i += 1 }
    wyHash64(b, 0L)
  }

  // ── wyhash final 3 (seed 0, default _wyp secret) ───────────────────────
  private final val Wyp0 = 0xa0761d6478bd642fL
  private final val Wyp1 = 0xe7037ed1a0b428dbL
  private final val Wyp2 = 0x8ebc6af09c88c6e3L
  private final val Wyp3 = 0x589965cc75374cc3L

  @inline private def wymix(a: Long, b: Long): Long =
    (a * b) ^ umulHi(a, b)
  @inline private def wyr3(b: Array[Byte], off: Int, k: Int): Long =
    ((b(off) & 0xFFL) << 16) | ((b(off + (k >> 1)) & 0xFFL) << 8) | (b(off + k - 1) & 0xFFL)

  def wyHash64(b: Array[Byte], seed0: Long): Long = {
    val len = b.length
    var seed = seed0 ^ Wyp0
    var a = 0L
    var bb = 0L
    if (len <= 16) {
      if (len >= 4) {
        a = (r4(b, 0) << 32) | r4(b, (len >> 3) << 2)
        bb = (r4(b, len - 4) << 32) | r4(b, len - 4 - ((len >> 3) << 2))
      } else if (len > 0) {
        a = wyr3(b, 0, len)
        bb = 0L
      }
    } else {
      var i = len
      var p = 0
      if (i > 48) {
        var see1 = seed
        var see2 = seed
        while (i > 48) {
          seed = wymix(r8(b, p) ^ Wyp1, r8(b, p + 8) ^ seed)
          see1 = wymix(r8(b, p + 16) ^ Wyp2, r8(b, p + 24) ^ see1)
          see2 = wymix(r8(b, p + 32) ^ Wyp3, r8(b, p + 40) ^ see2)
          p += 48
          i -= 48
        }
        seed ^= see1 ^ see2
      }
      while (i > 16) {
        seed = wymix(r8(b, p) ^ Wyp1, r8(b, p + 8) ^ seed)
        i -= 16
        p += 16
      }
      a = r8(b, p + i - 16)
      bb = r8(b, p + i - 8)
    }
    wymix(Wyp1 ^ len, wymix(a ^ Wyp1, bb ^ seed))
  }
}
