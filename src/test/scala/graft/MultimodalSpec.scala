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
