package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: images/audio/video ride along as opaque
  * `binary` payloads with typed metadata; decode / feature-extraction /
  * resize / frame-sampling are batch transforms over those bytes.
  *
  * The real media codecs are NOT in this container, so the decode kernel is
  * a clearly-marked deterministic STUB — but the Spark-side contract is the
  * real design: payloads stay columnar (never collected), transforms are
  * scan-local column expressions or mapPartitions batches, and metadata is
  * a typed struct so filters on (kind, width, duration) push down without
  * touching bytes. At 100 TB the payload column dominates I/O; every
  * operator here prunes to exactly the columns it needs.
  */
object Multimodal {

  /** Typed metadata struct for a media payload. */
  def mediaMeta(kind: Column, width: Column, height: Column, durationMs: Column): Column =
    struct(kind.as("kind"), width.as("width"), height.as("height"),
      durationMs.as("duration_ms"))

  /** STUB decode → fixed-dim feature vector. A production build would run
    * the image/audio decoder here (e.g. over Arrow batches); this fake
    * derives `dim` deterministic doubles in [-1,1] from the payload bytes
    * via per-dimension md5 — same batch shape, schema, and partitioning as
    * the real thing, and (being md5-based) bit-reproducible by the SQL
    * oracle, so the stub path gets a full hash check. */
  def fakeDecodeFeatures(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), d =>
      (conv(substring(md5(concat(payload, encode(d.cast("string"), "UTF-8"))), 1, 8), 16, 10)
        .cast("long") % lit(2000001L)).cast("double") / 1000000.0 - 1.0)

  /** STUB "resize": real impl re-encodes pixels; the fake keeps the byte
    * budget contract (truncate payload to maxBytes) so downstream size
    * accounting is exercised. */
  def resizePayload(payload: Column, maxBytes: Int): Column =
    substring(payload, 1, maxBytes)

  /** STUB frame sampling: pick every `stride`-th byte-block as a "frame";
    * real impl would index into container frames. Returns an array of
    * binary chunks. */
  def sampleFrames(payload: Column, frameBytes: Int, stride: Int): Column =
    transform(
      sequence(lit(0),
        greatest(floor(octet_length(payload) / lit(frameBytes * stride)).cast("int") - 1, lit(0))),
      i => payload.substr((i * (frameBytes * stride) + 1).cast("int"), lit(frameBytes)))

  // ── REAL container-header decode (no codec needed — byte arithmetic) ──
  //
  // Pixel/sample decode needs native codecs (absent in this container) and
  // stays behind the stub above, but the metadata-level decode a pipeline
  // runs BEFORE routing payloads to decoders — magic-byte format sniffing
  // and fixed-offset header field extraction — is pure byte arithmetic and
  // is implemented for real here: PNG signature + IHDR width/height
  // (big-endian, offsets 17/21, PNG spec §5.2/§11.2.2) and WAV RIFF/WAVE +
  // fmt channels/sample-rate (little-endian, offsets 23/25, RIFF spec).
  // Everything is scan-local codegen'd column arithmetic over the binary
  // column — at 100 TB this classifies and routes payloads without a
  // single byte leaving the scan.

  /** 4-byte big-endian unsigned int at 1-based `off` in a binary column. */
  private def beInt(p: Column, off: Int): Column =
    conv(hex(substring(p, off, 4)), 16, 10).cast("long")

  /** `len`-byte little-endian unsigned int at 1-based `off`. */
  private def leInt(p: Column, off: Int, len: Int): Column =
    conv(concat((0 until len).reverse.map(i => hex(substring(p, off + i, 1))): _*),
      16, 10).cast("long")

  private val PngMagic = "89504E470D0A1A0A" // \x89PNG\r\n\x1a\n

  private def isPng(p: Column): Column =
    octet_length(p) >= 33 && hex(substring(p, 1, 8)) === PngMagic
  private def isWav(p: Column): Column =
    octet_length(p) >= 36 && hex(substring(p, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(p, 9, 4)) === "57415645" &&                        // "WAVE"
      hex(substring(p, 13, 4)) === "666D7420"                          // "fmt "
  private def isJpeg(p: Column): Column =
    octet_length(p) >= 4 && hex(substring(p, 1, 2)) === "FFD8"         // SOI
  private def isMp4(p: Column): Column =
    octet_length(p) >= 16 && hex(substring(p, 5, 4)) === "66747970"    // "ftyp"

  /** REAL header probe: (kind, width, height, sample_rate, channels,
    * duration_ms) from the payload bytes; unknown/truncated payloads yield
    * kind NULL (never a crash, never a guess). PNG/WAV fields come from
    * fixed-offset arithmetic; JPEG dimensions from an SOF segment walk and
    * MP4 duration from the moov/mvhd box walk (the
    * [[graft.functions.MediaKernels]] codegen kernels — a walk whose
    * failure modes all collapse to the same NULL contract).
    *
    * WAV fields assume the CANONICAL layout — the `fmt ` chunk immediately
    * after `WAVE` (the layout [[wavHeaderPayload]] writes). Real-world
    * RIFF files with a leading LIST/JUNK chunk fail the `fmt ` check in
    * [[isWav]] and fall through to the NULL kind rather than returning
    * garbage bytes as sample_rate/channels. */
  def probeMediaHeader(p: Column): Column = {
    val nul = lit(null).cast("long")
    val jd = graft.functions.MediaKernels.jpegDimsPacked(p)
    val mp4ms = graft.functions.MediaKernels.mp4Duration(p)
    when(isPng(p), struct(lit("png").as("kind"),
      beInt(p, 17).as("width"), beInt(p, 21).as("height"),
      nul.as("sample_rate"), nul.as("channels"), nul.as("duration_ms")))
    .when(isWav(p), struct(lit("wav").as("kind"),
      nul.as("width"), nul.as("height"),
      leInt(p, 25, 4).as("sample_rate"), leInt(p, 23, 2).as("channels"),
      nul.as("duration_ms")))
    .when(isJpeg(p) && jd >= 0, struct(lit("jpeg").as("kind"),
      shiftright(jd, 32).as("width"),
      jd.bitwiseAND(lit(0xFFFFFFFFL)).as("height"),
      nul.as("sample_rate"), nul.as("channels"), nul.as("duration_ms")))
    .when(isMp4(p) && mp4ms >= 0, struct(lit("mp4").as("kind"),
      nul.as("width"), nul.as("height"),
      nul.as("sample_rate"), nul.as("channels"), mp4ms.as("duration_ms")))
    .otherwise(struct(lit(null).cast("string").as("kind"),
      nul.as("width"), nul.as("height"),
      nul.as("sample_rate"), nul.as("channels"), nul.as("duration_ms")))
  }

  /** Hex of an int column as exactly `bytes` big-endian bytes. Raises on a
    * value outside [0, 2^(8·bytes)) — `lpad` would otherwise TRUNCATE the
    * hex (keeping the high-order digits, silently corrupting the field),
    * against the repo's fail-loudly convention. */
  private def beHex(v: Column, bytes: Int): Column = {
    require(bytes <= 4, s"beHex supports at most 4 bytes, got $bytes")
    val lim = 1L << (8 * bytes)
    val lv = v.cast("long")
    val checked = when(lv.isNull || (lv >= 0 && lv < lim), lv).otherwise(
      raise_error(concat(lit(s"value out of range for a $bytes-byte field: "),
        lv.cast("string"))).cast("long"))
    lpad(hex(checked), 2 * bytes, "0")
  }

  /** Same value little-endian: byte-swapped hex pairs. */
  private def leHex(v: Column, bytes: Int): Column = {
    val be = beHex(v, bytes)
    concat((0 until bytes).reverse.map(i => substring(be, 2 * i + 1, 2)): _*)
  }

  /** A minimal VALID PNG signature + full 33-byte IHDR chunk carrying
    * (width, height) — synthesis twin of [[probeMediaHeader]] for
    * tests/fixtures (CRC bytes are a zero placeholder, so the payload is
    * header-probe-valid — it satisfies [[isPng]]'s 33-byte minimum on its
    * own — but not render-valid). */
  def pngHeaderPayload(width: Column, height: Column): Column =
    unhex(concat(lit(PngMagic), lit("0000000D49484452"),
      beHex(width, 4), beHex(height, 4),
      lit("0806000000"), // bit depth 8, RGBA, deflate/filter/interlace 0
      lit("00000000")))  // CRC placeholder (probe never reads it)

  /** A minimal VALID JPEG prefix: SOI + standard 16-byte JFIF APP0 + an
    * SOF0 frame header carrying (width, height) for 3 components — enough
    * segment structure that [[probeMediaHeader]]'s real SOF walk must skip
    * APP0 and parse big-endian dims at the SOF offsets (not render-valid:
    * no DQT/DHT/SOS follow). */
  def jpegHeaderPayload(width: Column, height: Column): Column =
    unhex(concat(
      lit("FFD8"),                                       // SOI
      lit("FFE00010" + "4A46494600" + "0101" + "00" +    // APP0 len 16, "JFIF\0"
          "00010001" + "0000"),                          // 1:1 density, no thumb
      lit("FFC00011" + "08"),                            // SOF0 len 17, 8-bit
      beHex(height, 2), beHex(width, 2),
      lit("03" + "012200" + "021101" + "031101")))       // 3 comps, 4:2:0

  /** A minimal VALID MP4 prefix: `ftyp` (isom) + `moov`/`mvhd` version 0
    * with timescale 1000, so the stored duration field IS milliseconds.
    * [[probeMediaHeader]] must walk the box tree to read it back. */
  def mp4HeaderPayload(durationMs: Column): Column =
    unhex(concat(
      lit("00000014" + "66747970" + "69736F6D" + "00000000" + "69736F6D"),
      lit("00000074" + "6D6F6F76"),                      // moov, size 8+108
      lit("0000006C" + "6D766864" + "00" + "000000" +    // mvhd v0
          "00000000" + "00000000" + "000003E8"),         // ctime/mtime/ts=1000
      beHex(durationMs, 4),
      lit("00010000" + "0100" + "0000" +                 // rate 1.0, volume, rsvd
          "0000000000000000" +                           // reserved ×2
          "00010000" + "00000000" + "00000000" +         // unity matrix
          "00000000" + "00010000" + "00000000" +
          "00000000" + "00000000" + "40000000" +
          "000000000000000000000000" +                   // pre_defined ×6
          "000000000000000000000000" +
          "00000002")))                                  // next_track_ID

  /** A minimal valid RIFF/WAVE header + fmt chunk carrying
    * (sampleRate, channels), 16-bit PCM. */
  def wavHeaderPayload(sampleRate: Column, channels: Column): Column = {
    val byteRate = sampleRate * channels * lit(2L)
    unhex(concat(
      lit("52494646"), lit("24000000"), lit("57415645"), // RIFF <size> WAVE
      lit("666D7420"), lit("10000000"), lit("0100"),     // "fmt " 16 PCM
      leHex(channels, 2), leHex(sampleRate, 4), leHex(byteRate, 4),
      leHex(channels * lit(2L), 2), lit("1000")))        // block align, 16 bit
  }

  /** Payload stats every pipeline wants without decoding: size + hash. */
  def payloadStats(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(payloadCol)).as("payload_bytes"),
      md5(col(payloadCol)).as("payload_md5"))

  /** End-to-end stub pipeline: binary payload → meta + features, projecting
    * away the payload as early as possible (the scale-critical move). */
  def featurize(df: DataFrame, idCol: String, payloadCol: String, dim: Int): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(payloadCol)).as("payload_bytes"),
      fakeDecodeFeatures(col(payloadCol), dim).as("features"))

  final case class MediaRecord(id: Long, payload: Array[Byte])
  final case class MediaFeatures(id: Long, payload_bytes: Int, features: Array[Double])

  /** The mapPartitions batch-decode path — the shape a REAL decoder needs:
    * per-partition iteration so a native decoder (image/audio lib, not in
    * this container) can be initialized once per partition and fed batches
    * of byte payloads. The decode kernel is a deterministic STUB computing
    * exactly [[fakeDecodeFeatures]] (md5-derived doubles), so the two decode
    * paths are cross-checkable and both oracle-verifiable; schema, batching,
    * and partition lifecycle are the real contract. */
  def featurizePartitions(
      ds: org.apache.spark.sql.Dataset[MediaRecord], dim: Int
  ): org.apache.spark.sql.Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // Once per partition — exactly where a real NativeDecoder.open() goes.
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val feats = Array.tabulate(dim) { d =>
          // Incremental digest — no payload ++ suffix copy per dimension
          // (that copy is O(dim × payloadBytes) on exactly the path built
          // for large media payloads). digest() resets the instance.
          md.update(r.payload)
          md.update(d.toString.getBytes("UTF-8"))
          val h = md.digest()
          // first 4 md5 bytes big-endian == first 8 hex chars of md5(x)
          val base = ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
            ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
          (base % 2000001L) / 1000000.0 - 1.0
        }
        MediaFeatures(r.id, r.payload.length, feats)
      }
    }
  }
}
