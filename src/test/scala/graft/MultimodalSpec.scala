package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaRecord

/** Multimodal plumbing: payload stats, stub decode shapes, partition path. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "hello world".getBytes("UTF-8")),
    (2L, Array.fill[Byte](256)(7)),
    (3L, Array.empty[Byte])).toDF("id", "payload")

  test("payload stats: byte length + content hash, payload projected away") {
    val out = Multimodal.payloadStats(media, "id", "payload")
    assert(out.columns.toSeq === Seq("id", "payload_bytes", "payload_md5"))
    val m = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m === Map(1L -> 11, 2L -> 256, 3L -> 0))
  }

  test("column stub decode: fixed dim, deterministic, bounded values") {
    val a = Multimodal.featurize(media, "id", "payload", dim = 4).collect()
    val b = Multimodal.featurize(media, "id", "payload", dim = 4).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      val feats = r.getSeq[Double](r.fieldIndex("features"))
      assert(feats.length === 4)
      assert(feats.forall(f => f >= -1.0 && f <= 1.0))
    }
  }

  test("mapPartitions decode: schema, determinism, per-row feature shape") {
    val ds = media.select(col("id"), col("payload")).as[MediaRecord]
    val out = Multimodal.featurizePartitions(ds, dim = 6).collect()
    assert(out.length === 3)
    out.foreach { f =>
      assert(f.features.length === 6)
      assert(f.features.forall(v => v >= -1.0f && v <= 1.0f))
    }
    assert(out.find(_.id == 2L).get.payload_bytes === 256)
    // determinism across runs and partitionings
    val again = Multimodal.featurizePartitions(ds.repartition(3), dim = 6)
      .collect().sortBy(_.id)
    assert(again.map(_.features.toSeq).toSeq === out.sortBy(_.id).map(_.features.toSeq).toSeq)
  }

  test("column and mapPartitions stub kernels agree bit-for-bit") {
    val colFeats = Multimodal.featurize(media, "id", "payload", dim = 6)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](r.fieldIndex("features"))).toMap
    val ds = media.select(col("id"), col("payload")).as[MediaRecord]
    val partFeats = Multimodal.featurizePartitions(ds, dim = 6).collect()
      .map(f => f.id -> f.features.toSeq).toMap
    assert(colFeats === partFeats)
  }

  test("header probe parses hand-crafted spec bytes (ground truth, not the builder)") {
    // Byte literals transcribed from the PNG and RIFF specs BY HAND — not
    // produced by pngHeaderPayload/wavHeaderPayload, so a symmetric
    // offset/endianness bug in builder+parser cannot self-cancel here.
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // 1×1 RGBA PNG: signature, IHDR len 13, "IHDR", w=1 BE, h=1 BE, rest
    val png = hx("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000001" + "00000001" + "0806000000" + "1F15C489")
    // canonical 44.1 kHz stereo 16-bit PCM WAV header: rate LE = 44AC0000
    val wav = hx("52494646" + "24000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0200" + "44AC0000" + "10B10200" + "0400" + "1000")
    val junk = "not a media file at all".getBytes("UTF-8")
    // 2×3 JPEG: SOI, APP0 (JFIF), a COM segment the SOF walk must SKIP,
    // then SOF0 with height=3 width=2 — transcribed from ITU T.81 §B
    val jpeg = hx("FFD8" + "FFE00010" + "4A46494600" + "0101" + "00" +
      "00010001" + "0000" + "FFFE0004" + "ABCD" + // COM, 2 payload bytes
      "FFC00011" + "08" + "0003" + "0002" + "03" + "012200" + "021101" + "031101")
    // minimal MP4: ftyp(isom), moov > mvhd v0 timescale=600 duration=1200
    // (→ 2000 ms), zero matrix/reserved tail — ISO 14496-12 §8.2.2 layout
    val mp4 = hx("00000014" + "66747970" + "69736F6D" + "00000000" + "69736F6D" +
      "00000074" + "6D6F6F76" +
      "0000006C" + "6D766864" + "00000000" + "00000000" + "00000000" +
      "00000258" + "000004B0" + // timescale 600, duration 1200
      "00010000" + "0100" + "0000" + "0000000000000000" +
      "000100000000000000000000" + "000000000001000000000000" +
      "000000000000000040000000" +
      "000000000000000000000000" + "000000000000000000000000" + "00000002")
    val df = Seq((1L, png), (2L, wav), (3L, junk), (4L, png.take(10)),
        (5L, jpeg), (6L, mp4), (7L, jpeg.take(6)), (8L, mp4.take(30)))
      .toDF("id", "payload")
      .select(col("id"), Multimodal.probeMediaHeader(col("payload")).as("m"))
      .select(col("id"), col("m.kind"), col("m.width"), col("m.height"),
        col("m.sample_rate"), col("m.channels"), col("m.duration_ms"))
    val rows = df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(rows(1L) === Seq("png", 1L, 1L, null, null, null))
    assert(rows(2L) === Seq("wav", null, null, 44100L, 2L, null))
    assert(rows(3L) === Seq(null, null, null, null, null, null), "junk must be NULL-kind")
    assert(rows(4L) === Seq(null, null, null, null, null, null), "truncated header must not parse")
    assert(rows(5L) === Seq("jpeg", 2L, 3L, null, null, null),
      "SOF walk must skip APP0+COM and read BE dims")
    assert(rows(6L) === Seq("mp4", null, null, null, null, 2000L),
      "mvhd duration 1200 @ timescale 600 is 2000 ms")
    assert(rows(7L) === Seq(null, null, null, null, null, null), "truncated JPEG must not parse")
    assert(rows(8L) === Seq(null, null, null, null, null, null), "truncated MP4 must not parse")
  }

  test("non-canonical RIFF/WAVE (leading JUNK chunk) is NULL-kind, not garbage") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // RIFF … WAVE then a JUNK chunk BEFORE fmt — common in real encoders;
    // fixed-offset field reads would return junk bytes as sample_rate
    val wavJunk = hx("52494646" + "30000000" + "57415645" +
      "4A554E4B" + "04000000" + "DEADBEEF" + // "JUNK" len=4 payload
      "666D7420" + "10000000" + "0100" + "0200" + "44AC0000" +
      "10B10200" + "0400" + "1000")
    val kind = Seq((1L, wavJunk)).toDF("id", "payload")
      .select(Multimodal.probeMediaHeader(col("payload")).as("m"))
      .select(col("m.kind"), col("m.sample_rate")).head()
    assert(kind.isNullAt(0) && kind.isNullAt(1),
      "non-canonical layout must fall through to NULL, never a guessed rate")
  }

  test("header builders fail loudly on out-of-range field values (no hex truncation)") {
    // channels is a 2-byte field: 65536 does not fit; lpad would silently
    // keep the wrong digits without the range guard
    val e = intercept[Exception] {
      spark.range(1).select(
        Multimodal.wavHeaderPayload(lit(8000), lit(65536))).collect()
    }
    assert(e.getMessage.contains("out of range") ||
      Option(e.getCause).exists(_.getMessage.contains("out of range")))
  }

  test("header builders invert through the probe (build→parse roundtrip)") {
    // Asserted driver-side with POSITIVE per-row expectations: a filter on
    // a negated predicate silently drops NULL-kind rows under three-valued
    // logic (true && !(NULL) = NULL), which is exactly how a broken builder
    // would evade a `bad.count() === 0` style assertion.
    val built = spark.range(1, 50).select(col("id"),
      when(col("id") % 4 === 0,
        Multimodal.pngHeaderPayload(col("id") * 3, col("id") + 7))
      .when(col("id") % 4 === 1,
        Multimodal.wavHeaderPayload(lit(8000) + col("id"), lit(1)))
      .when(col("id") % 4 === 2,
        Multimodal.jpegHeaderPayload(col("id") + 100, col("id") * 2))
      .otherwise(Multimodal.mp4HeaderPayload(col("id") * 37))
        .as("payload"))
    val parsed = built
      .select(col("id"), Multimodal.probeMediaHeader(col("payload")).as("m"))
      .select(col("id"), col("m.kind"), col("m.width"), col("m.height"),
        col("m.sample_rate"), col("m.channels"), col("m.duration_ms"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(parsed.size === 49)
    parsed.foreach { case (id, got) =>
      val want = (id % 4) match {
        case 0 => Seq("png", id * 3, id + 7, null, null, null)
        case 1 => Seq("wav", null, null, 8000L + id, 1L, null)
        case 2 => Seq("jpeg", id + 100, id * 2, null, null, null)
        case _ => Seq("mp4", null, null, null, null, id * 37)
      }
      assert(got === want, s"id=$id")
    }
  }

  test("resize and frame sampling respect byte budgets") {
    // resize caps bytes
    assert(media.select(octet_length(Multimodal.resizePayload(col("payload"), 10)))
      .collect().map(_.getInt(0)).max <= 10)
    // 256-byte payload, 16-byte frames, stride 2 → 8 sampled frames of ≤16B
    val frames = media.filter(col("id") === 2L)
      .select(Multimodal.sampleFrames(col("payload"), frameBytes = 16, stride = 2).as("f"))
      .head().getSeq[Array[Byte]](0)
    assert(frames.length === 8)
    assert(frames.forall(_.length <= 16))
  }
}
