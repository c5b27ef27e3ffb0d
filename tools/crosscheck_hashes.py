#!/usr/bin/env python3
"""Independent cross-check of the graft hash query surface.

The `hash_reference` / `hash_native` queries are rows-only in the driver's
oracle gate (DuckDB has no cityhash/xxhash/wyhash twins). This tool closes
that gap with a SECOND, pure-Python implementation of each algorithm —
written from the published specifications (CityHash v1.0.2, xxHash32/64,
XXH3_64bits, wyhash final 3), entirely separate from the repo's Scala
kernels — and diffs it against the Verify parquet dumps over real data.

Trust chain:
  1. Each Python implementation is first validated against test vectors
     generated from the UPSTREAM C libraries (the same vector tables
     RefHashSpec embeds, covering every length branch of every algorithm,
     plus the wyhash repository's published vectors). A self-check failure
     aborts before any comparison.
  2. Only then are the Verify dumps compared, row by row, over the full
     documents table — exercising the Spark codegen path, UTF-8 handling,
     and multi-column combine on real data.

Usage:
  python3 tools/crosscheck_hashes.py <verify_out_dir> <sf_dir>

where <verify_out_dir> contains hash_reference.parquet / hash_native.parquet
(from `runMain graft.Verify <sf_dir> <verify_out_dir>`), and <sf_dir>
contains documents.parquet. Exit 0 = zero diffs.
"""

import sys
import zlib

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF


def rotl64(v, s):
    v &= M64
    return ((v << s) | (v >> (64 - s))) & M64 if s else v


def rotr64(v, s):
    v &= M64
    return ((v >> s) | (v << (64 - s))) & M64 if s else v


def rotl32(v, s):
    v &= M32
    return ((v << s) | (v >> (32 - s))) & M32 if s else v


def r8(b, i):
    return int.from_bytes(b[i:i + 8], "little")


def r4(b, i):
    return int.from_bytes(b[i:i + 4], "little")


# ── CityHash64 v1.0.2 (pre-1.1 variant; public spec) ────────────────────────
K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F
K3 = 0xC949D7C7509E6557
KMUL = 0x9DDFEA08EB382D69


def hash128to64(lo, hi):
    a = ((lo ^ hi) * KMUL) & M64
    a ^= a >> 47
    b = ((hi ^ a) * KMUL) & M64
    b ^= b >> 47
    return (b * KMUL) & M64


def shift_mix(v):
    return (v ^ (v >> 47)) & M64


def _city_0to16(b, n):
    if n > 8:
        a = r8(b, 0)
        x = r8(b, n - 8)
        return hash128to64(a, rotr64((x + n) & M64, n)) ^ x
    if n >= 4:
        a = r4(b, 0)
        return hash128to64((n + (a << 3)) & M64, r4(b, n - 4))
    if n > 0:
        a, x, c = b[0], b[n >> 1], b[n - 1]
        y = (a + (x << 8)) & M64
        z = (n + (c << 2)) & M64
        return (shift_mix((y * K2 ^ z * K3) & M64) * K2) & M64
    return K2


def _city_17to32(b, n):
    a = (r8(b, 0) * K1) & M64
    x = r8(b, 8)
    c = (r8(b, n - 8) * K2) & M64
    d = (r8(b, n - 16) * K0) & M64
    return hash128to64((rotr64((a - x) & M64, 43) + rotr64(c, 30) + d) & M64,
                       (a + rotr64(x ^ K3, 20) - c + n) & M64)


def _city_weak32(b, off, a, bb):
    w, x, y, z = r8(b, off), r8(b, off + 8), r8(b, off + 16), r8(b, off + 24)
    a = (a + w) & M64
    bb = rotr64((bb + a + z) & M64, 21)
    c = a
    a = (a + x + y) & M64
    bb = (bb + rotr64(a, 44)) & M64
    return (a + z) & M64, (bb + c) & M64


def _city_33to64(b, n):
    z = r8(b, 24)
    a = (r8(b, 0) + (n + r8(b, n - 16)) * K0) & M64
    bb = rotr64((a + z) & M64, 52)
    c = rotr64(a, 37)
    a = (a + r8(b, 8)) & M64
    c = (c + rotr64(a, 7)) & M64
    a = (a + r8(b, 16)) & M64
    vf = (a + z) & M64
    vs = (bb + rotr64(a, 31) + c) & M64
    a = (r8(b, 16) + r8(b, n - 32)) & M64
    z = r8(b, n - 8)
    bb = rotr64((a + z) & M64, 52)
    c = rotr64(a, 37)
    a = (a + r8(b, n - 24)) & M64
    c = (c + rotr64(a, 7)) & M64
    a = (a + r8(b, n - 16)) & M64
    wf = (a + z) & M64
    ws = (bb + rotr64(a, 31) + c) & M64
    r = shift_mix(((vf + ws) * K2 + (wf + vs) * K0) & M64)
    return (shift_mix((r * K0 + vs) & M64) * K2) & M64


def cityhash64(b):
    n = len(b)
    if n <= 16:
        return _city_0to16(b, n)
    if n <= 32:
        return _city_17to32(b, n)
    if n <= 64:
        return _city_33to64(b, n)
    x = r8(b, 0)
    y = r8(b, n - 16) ^ K1
    z = r8(b, n - 56) ^ K0
    v = _city_weak32(b, n - 64, n, y)
    w = _city_weak32(b, n - 32, (n * K1) & M64, K0)
    z = (z + shift_mix(v[1]) * K1) & M64
    x = (rotr64((z + x) & M64, 39) * K1) & M64
    y = (rotr64(y, 33) * K1) & M64
    rem = (n - 1) & ~63
    off = 0
    while rem:
        x = (rotr64((x + y + v[0] + r8(b, off + 16)) & M64, 37) * K1) & M64
        y = (rotr64((y + v[1] + r8(b, off + 48)) & M64, 42) * K1) & M64
        x ^= w[1]
        y ^= v[0]
        z = rotr64(z ^ w[0], 33)
        v = _city_weak32(b, off, (v[1] * K1) & M64, (x + w[0]) & M64)
        w = _city_weak32(b, off + 32, (z + w[1]) & M64, y)
        z, x = x, z
        off += 64
        rem -= 64
    return hash128to64((hash128to64(v[0], w[0]) + shift_mix(y) * K1 + z) & M64,
                       (hash128to64(v[1], w[1]) + x) & M64)


# ── xxHash32 ────────────────────────────────────────────────────────────────
P32_1, P32_2, P32_3, P32_4, P32_5 = (
    0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D, 0x27D4EB2F, 0x165667B1)


def xxh32(b, seed=0):
    n = len(b)
    i = 0
    if n >= 16:
        v1 = (seed + P32_1 + P32_2) & M32
        v2 = (seed + P32_2) & M32
        v3 = seed & M32
        v4 = (seed - P32_1) & M32
        while i + 16 <= n:
            v1 = (rotl32((v1 + r4(b, i) * P32_2) & M32, 13) * P32_1) & M32
            v2 = (rotl32((v2 + r4(b, i + 4) * P32_2) & M32, 13) * P32_1) & M32
            v3 = (rotl32((v3 + r4(b, i + 8) * P32_2) & M32, 13) * P32_1) & M32
            v4 = (rotl32((v4 + r4(b, i + 12) * P32_2) & M32, 13) * P32_1) & M32
            i += 16
        h = (rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18)) & M32
    else:
        h = (seed + P32_5) & M32
    h = (h + n) & M32
    while i + 4 <= n:
        h = (rotl32((h + r4(b, i) * P32_3) & M32, 17) * P32_4) & M32
        i += 4
    while i < n:
        h = (rotl32((h + b[i] * P32_5) & M32, 11) * P32_1) & M32
        i += 1
    h ^= h >> 15
    h = (h * P32_2) & M32
    h ^= h >> 13
    h = (h * P32_3) & M32
    return h ^ (h >> 16)


# ── xxHash64 ────────────────────────────────────────────────────────────────
P64_1, P64_2, P64_3, P64_4, P64_5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5)


def _x64round(acc, inp):
    return (rotl64((acc + inp * P64_2) & M64, 31) * P64_1) & M64


def xxh64(b, seed=0):
    n = len(b)
    i = 0
    if n >= 32:
        v1 = (seed + P64_1 + P64_2) & M64
        v2 = (seed + P64_2) & M64
        v3 = seed & M64
        v4 = (seed - P64_1) & M64
        while i + 32 <= n:
            v1 = _x64round(v1, r8(b, i))
            v2 = _x64round(v2, r8(b, i + 8))
            v3 = _x64round(v3, r8(b, i + 16))
            v4 = _x64round(v4, r8(b, i + 24))
            i += 32
        h = (rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _x64round(0, v)) * P64_1 + P64_4) & M64
    else:
        h = (seed + P64_5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        h = (rotl64(h ^ _x64round(0, r8(b, i)), 27) * P64_1 + P64_4) & M64
        i += 8
    if i + 4 <= n:
        h = (rotl64(h ^ ((r4(b, i) * P64_1) & M64), 23) * P64_2 + P64_3) & M64
        i += 4
    while i < n:
        h = (rotl64(h ^ ((b[i] * P64_5) & M64), 11) * P64_1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P64_2) & M64
    h ^= h >> 29
    h = (h * P64_3) & M64
    return h ^ (h >> 32)


# ── XXH3 64-bit, seed 0, default secret ─────────────────────────────────────
SECRET = bytes([
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
    0x45, 0xcb, 0x3a, 0x8f, 0x95, 0x16, 0x04, 0x28, 0xaf, 0xd7, 0xfb, 0xca, 0xbb, 0x4b, 0x40, 0x7e])
MX1 = 0x165667919E3779F9
MX2 = 0x9FB21C651E98DF25


def _mul128fold64(a, b):
    p = a * b
    return ((p & M64) ^ (p >> 64)) & M64


def _avalanche64(h):
    h &= M64
    h ^= h >> 33
    h = (h * P64_2) & M64
    h ^= h >> 29
    h = (h * P64_3) & M64
    return h ^ (h >> 32)


def _avalanche3(h):
    h &= M64
    h ^= h >> 37
    h = (h * MX1) & M64
    return h ^ (h >> 32)


def _rrmxmx(h, n):
    h &= M64
    h ^= rotl64(h, 49) ^ rotl64(h, 24)
    h = (h * MX2) & M64
    h ^= (h >> 35) + n
    h = ((h & M64) * MX2) & M64
    return h ^ (h >> 28)


def _mix16(b, i, s):
    return _mul128fold64(r8(b, i) ^ r8(SECRET, s), r8(b, i + 8) ^ r8(SECRET, s + 8))


def _acc512(acc, b, i, s):
    for lane in range(8):
        dv = r8(b, i + lane * 8)
        dk = dv ^ r8(SECRET, s + lane * 8)
        acc[lane ^ 1] = (acc[lane ^ 1] + dv) & M64
        acc[lane] = (acc[lane] + (dk & M32) * (dk >> 32)) & M64


def xxh3_64(b):
    n = len(b)
    if n == 0:
        return _avalanche64(r8(SECRET, 56) ^ r8(SECRET, 64))
    if n <= 3:
        combined = (b[0] << 16) | (b[n >> 1] << 24) | b[n - 1] | (n << 8)
        return _avalanche64(combined ^ (r4(SECRET, 0) ^ r4(SECRET, 4)))
    if n <= 8:
        keyed = (r4(b, n - 4) | (r4(b, 0) << 32)) ^ (r8(SECRET, 8) ^ r8(SECRET, 16))
        return _rrmxmx(keyed, n)
    if n <= 16:
        lo = r8(b, 0) ^ (r8(SECRET, 24) ^ r8(SECRET, 32))
        hi = r8(b, n - 8) ^ (r8(SECRET, 40) ^ r8(SECRET, 48))
        swapped = int.from_bytes(lo.to_bytes(8, "little"), "big")
        return _avalanche3(n + swapped + hi + _mul128fold64(lo, hi))
    if n <= 128:
        acc = (n * P64_1) & M64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc += _mix16(b, 48, 96) + _mix16(b, n - 64, 112)
                acc += _mix16(b, 32, 64) + _mix16(b, n - 48, 80)
            acc += _mix16(b, 16, 32) + _mix16(b, n - 32, 48)
        acc += _mix16(b, 0, 0) + _mix16(b, n - 16, 16)
        return _avalanche3(acc)
    if n <= 240:
        acc = (n * P64_1) & M64
        for i in range(8):
            acc = (acc + _mix16(b, 16 * i, 16 * i)) & M64
        acc = _avalanche3(acc)
        acc_end = _mix16(b, n - 16, 136 - 17)
        for i in range(8, n // 16):
            acc_end = (acc_end + _mul128fold64(
                r8(b, 16 * i) ^ r8(SECRET, 16 * (i - 8) + 3),
                r8(b, 16 * i + 8) ^ r8(SECRET, 16 * (i - 8) + 11))) & M64
        return _avalanche3(acc + acc_end)
    # long: 1024-byte blocks of 16 stripes, scramble between blocks
    acc = [0xC2B2AE3D, P64_1, P64_2, P64_3, P64_4, 0x85EBCA77, P64_5, 0x9E3779B1]
    block = 1024
    nb_blocks = (n - 1) // block
    for blk in range(nb_blocks):
        for s in range(16):
            _acc512(acc, b, blk * block + s * 64, s * 8)
        for lane in range(8):
            a = acc[lane]
            a ^= a >> 47
            a ^= r8(SECRET, 128 + lane * 8)
            acc[lane] = (a * 0x9E3779B1) & M64
    for s in range((n - 1 - block * nb_blocks) // 64):
        _acc512(acc, b, nb_blocks * block + s * 64, s * 8)
    _acc512(acc, b, n - 64, 192 - 64 - 7)
    res = (n * P64_1) & M64
    for i in range(4):
        res = (res + _mul128fold64(acc[2 * i] ^ r8(SECRET, 11 + 16 * i),
                                   acc[2 * i + 1] ^ r8(SECRET, 19 + 16 * i))) & M64
    return _avalanche3(res)


# ── wyhash final 3, default secret ──────────────────────────────────────────
WP0, WP1, WP2, WP3 = (0xA0761D6478BD642F, 0xE7037ED1A0B428DB,
                      0x8EBC6AF09C88C6E3, 0x589965CC75374CC3)


def _wymix(a, b):
    p = (a & M64) * (b & M64)
    return ((p & M64) ^ (p >> 64)) & M64


def wyhash64(b, seed=0):
    n = len(b)
    seed ^= WP0
    if n <= 16:
        if n >= 4:
            a = (r4(b, 0) << 32) | r4(b, (n >> 3) << 2)
            bb = (r4(b, n - 4) << 32) | r4(b, n - 4 - ((n >> 3) << 2))
        elif n > 0:
            a = (b[0] << 16) | (b[n >> 1] << 8) | b[n - 1]
            bb = 0
        else:
            a = bb = 0
    else:
        i, p = n, 0
        if i > 48:
            s1 = s2 = seed
            while i > 48:
                seed = _wymix(r8(b, p) ^ WP1, r8(b, p + 8) ^ seed)
                s1 = _wymix(r8(b, p + 16) ^ WP2, r8(b, p + 24) ^ s1)
                s2 = _wymix(r8(b, p + 32) ^ WP3, r8(b, p + 40) ^ s2)
                p += 48
                i -= 48
            seed ^= s1 ^ s2
        while i > 16:
            seed = _wymix(r8(b, p) ^ WP1, r8(b, p + 8) ^ seed)
            i -= 16
            p += 16
        a = r8(b, p + i - 16)
        bb = r8(b, p + i - 8)
    return _wymix(WP1 ^ n, _wymix(a ^ WP1, bb ^ seed))


def combine64(h1, h2):
    return hash128to64(h1, h2)


def combine_wy(h1, h2):
    return wyhash64(h1.to_bytes(8, "little") + h2.to_bytes(8, "little"), 0)


# ── Spark-native murmur3 (Murmur3_x86_32, Spark's byte-at-a-time tail) ──────
def spark_murmur3(data, seed=42):
    def mix_k1(k1):
        k1 = (k1 * 0xCC9E2D51) & M32
        k1 = rotl32(k1, 15)
        return (k1 * 0x1B873593) & M32

    def mix_h1(h1, k1):
        h1 ^= k1
        h1 = rotl32(h1, 13)
        return (h1 * 5 + 0xE6546B64) & M32

    h1 = seed & M32
    aligned = len(data) - len(data) % 4
    for i in range(0, aligned, 4):
        h1 = mix_h1(h1, mix_k1(r4(data, i)))
    for i in range(aligned, len(data)):
        byte = data[i] - 256 if data[i] >= 128 else data[i]  # sign-extended
        h1 = mix_h1(h1, mix_k1(byte & M32))
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & M32
    return h1 ^ (h1 >> 16)


def to_signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def to_signed32(v):
    return v - (1 << 32) if v >= (1 << 31) else v


# ── self-check against upstream-generated vectors ───────────────────────────
# (len, cityhash64, xxh32, xxh64, xxh3_64) over s[i] = (i*131+7) & 0xFF,
# generated from the upstream C libraries (cityhash-1.0.2, xxhash 0.8).
PAT_VECTORS = [
    (0, 11160318154034397263, 46947589, 17241709254077376921, 3244421341483603138),
    (1, 16166381634050148869, 3018034, 12208272383309036471, 5502495245947142431),
    (3, 6364913932381277911, 2106779867, 13750676314285879995, 7943829059066201772),
    (4, 4079987124836061262, 4052348055, 18023734343716549181, 6650799683851767871),
    (8, 9813560363119002425, 3347752397, 11046036222224798941, 18013639643258255605),
    (9, 14102836851044737945, 221499904, 6281260072103852792, 8944394699905593055),
    (16, 2851911280713872884, 1680374928, 10713219732412769493, 9704121104262105176),
    (17, 16678443089554295987, 476315077, 1469566490804707297, 13081819869213806705),
    (32, 2046368685727049628, 505151363, 574130765770354213, 16388932025501132398),
    (33, 12960740447276433099, 691338563, 718428505286426271, 11880189719134216051),
    (48, 15440471762093119139, 3446634584, 2974590575189884622, 15623491413930286745),
    (64, 552118647788991626, 3758695833, 5824303969334289198, 1338082372350062813),
    (65, 2740400107408553708, 1864413365, 15165616022809362172, 10936639315039379145),
    (128, 13793526629150434456, 3891339738, 301992085808146263, 1211889905577015873),
    (129, 2338030388222971948, 2528902413, 2276297918984362234, 1605741916052902306),
    (240, 11187624125333675441, 1678671357, 14558842148883094695, 13172940074023354854),
    (241, 4158150712321250441, 2290660338, 1152637890678185204, 10767172507156293534),
    (256, 8186648053014713560, 3797807362, 11735229524379588348, 12780746281945784236),
    (1024, 5627404316794502107, 3548643270, 6440339934864396215, 8123710315364152507),
    (2048, 7792288475052514002, 1734499105, 12671104034622313510, 10035931636063484464),
]
# wyhash final-3 repository vectors (seed = index).
WY_VECTORS = [
    ("", 0, 0x42BC986DC5EEC4D3),
    ("a", 1, 0x84508DC903C31551),
    ("abc", 2, 0x0BC54887CFC9ECB1),
    ("message digest", 3, 0x6E2FF3298208A67C),
    ("abcdefghijklmnopqrstuvwxyz", 4, 0x9A64E42E897195B9),
    ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789", 5, 0x9199383239C32554),
    ("12345678901234567890123456789012345678901234567890123456789012345678901234567890", 6, 0x7C1CCF6BBA30F5A5),
]


def self_check():
    bad = []
    for (n, city, x32, x64, x3) in PAT_VECTORS:
        pat = bytes((i * 131 + 7) & 0xFF for i in range(n))
        if cityhash64(pat) != city:
            bad.append(f"cityhash64 len={n}")
        if xxh32(pat) != x32:
            bad.append(f"xxh32 len={n}")
        if xxh64(pat) != x64:
            bad.append(f"xxh64 len={n}")
        if xxh3_64(pat) != x3:
            bad.append(f"xxh3_64 len={n}")
    for (s, seed, exp) in WY_VECTORS:
        if wyhash64(s.encode(), seed) != exp:
            bad.append(f"wyhash64 str={s!r}")
    # combine vectors (reference combineHashes formulas, upstream-generated)
    c1, c2 = cityhash64(b"test"), cityhash64(b"abc")
    if combine64(c1, c2) != 4139438780241656725:
        bad.append("combine64")
    if bad:
        print("SELF-CHECK FAILED — python implementations do not match "
              "upstream vectors:", file=sys.stderr)
        for m in bad:
            print(f"  {m}", file=sys.stderr)
        sys.exit(2)
    print(f"self-check OK: {len(PAT_VECTORS)}×4 upstream pattern vectors, "
          f"{len(WY_VECTORS)} wyhash vectors, combine64")


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    verify_dir, sf_dir = sys.argv[1], sys.argv[2]
    self_check()

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pylist()
    by_id = {r["doc_id"]: r for r in docs}

    total_diff = 0

    def check(qname, expected_fns):
        nonlocal total_diff
        tab = pq.read_table(f"{verify_dir}/{qname}").to_pylist()
        assert len(tab) == len(by_id), f"{qname}: row count {len(tab)} != {len(by_id)}"
        diffs = {c: 0 for c in expected_fns}
        for row in tab:
            doc = by_id[row["doc_id"]]
            for colname, fn in expected_fns.items():
                if row[colname] != fn(doc):
                    diffs[colname] += 1
        for colname, d in diffs.items():
            status = "OK " if d == 0 else "DIFF"
            print(f"  {status} {qname}.{colname}: {d}/{len(tab)} mismatches")
            total_diff += d

    tb = lambda doc: doc["text"].encode("utf-8")
    lb = lambda doc: doc["lang"].encode("utf-8")
    print(f"hash_reference over {len(by_id)} documents:")
    check("hash_reference", {
        "h_city64": lambda d: to_signed64(cityhash64(tb(d))),
        "h_xx32": lambda d: xxh32(tb(d)),            # UInt32 role, zero-extended
        "h_xx64raw": lambda d: to_signed64(xxh64(tb(d))),
        "h_xxh3": lambda d: to_signed64(xxh3_64(tb(d))),
        "h_wy64": lambda d: to_signed64(wyhash64(tb(d))),
        "h_city2": lambda d: to_signed64(combine64(cityhash64(tb(d)),
                                                   cityhash64(lb(d)))),
    })
    print(f"hash_native over {len(by_id)} documents:")
    check("hash_native", {
        "h_xx64": lambda d: to_signed64(xxh64(tb(d), seed=42)),   # Spark xxhash64
        "h_murmur": lambda d: to_signed32(spark_murmur3(tb(d))),  # Spark hash()
        "h_crc32": lambda d: zlib.crc32(tb(d)),
    })

    if total_diff:
        print(f"FAIL: {total_diff} total mismatches")
        sys.exit(1)
    print("PASS: 0 mismatches across all hash columns")


if __name__ == "__main__":
    main()
