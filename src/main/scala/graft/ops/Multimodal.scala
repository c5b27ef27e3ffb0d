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
    * derives `dim` deterministic floats in [-1,1] from the payload bytes
    * via seeded xxhash64 — same batch shape, schema, and partitioning as
    * the real thing. */
  def fakeDecodeFeatures(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), d =>
      (pmod(xxhash64(payload, d), lit(2000001)).cast("double") / 1000000.0) - 1.0)

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
  final case class MediaFeatures(id: Long, payload_bytes: Int, features: Array[Float])

  /** The mapPartitions batch-decode path — the shape a REAL decoder needs:
    * per-partition iteration so a native decoder (image/audio lib, not in
    * this container) can be initialized once per partition and fed batches
    * of byte payloads. The decode kernel is a deterministic STUB
    * (murmur3-derived floats); schema, batching, and partition lifecycle
    * are the real contract. */
  def featurizePartitions(
      ds: org.apache.spark.sql.Dataset[MediaRecord], dim: Int
  ): org.apache.spark.sql.Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: val decoder = NativeDecoder.open() — once per partition
      it.map { r =>
        val feats = Array.tabulate(dim) { d =>
          // STUB decode: deterministic pseudo-feature from payload bytes
          val h = scala.util.hashing.MurmurHash3.bytesHash(r.payload, d)
          (math.floorMod(h, 2000001) / 1000000.0f) - 1.0f
        }
        MediaFeatures(r.id, r.payload.length, feats)
      }
    }
  }
}
