package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Container-header WALK kernels for the formats whose metadata is not at
  * a fixed offset — JPEG (dimensions live in an SOF segment somewhere
  * after a variable run of APPn/COM segments) and MP4 (duration lives in
  * moov/mvhd, a nested box tree). Pure byte arithmetic, no codec: the
  * metadata-level decode a pipeline runs BEFORE routing payloads to real
  * decoders, same contract as the fixed-offset PNG/WAV probes in
  * [[graft.ops.Multimodal]].
  *
  * Each kernel is one static call per row from generated Java (the
  * [[RefHash]] execution shape), returning a packed long with -1 for
  * "not valid / not found" — the caller maps that to the NULL-kind
  * contract (never a guess, never a crash). Bounded work per row: the
  * JPEG walk visits each segment header once and stops at SOF/SOS; the
  * MP4 walk visits top-level boxes once and moov's children once. */
object MediaKernels {

  private def be2(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be4(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def be8(b: Array[Byte], i: Int): Long =
    (be4(b, i) << 32) | be4(b, i + 4)
  private def typeIs(b: Array[Byte], i: Int, t: String): Boolean =
    (b(i) & 0xFF) == t.charAt(0) && (b(i + 1) & 0xFF) == t.charAt(1) &&
      (b(i + 2) & 0xFF) == t.charAt(2) && (b(i + 3) & 0xFF) == t.charAt(3)

  /** `(width << 32) | height` of the first SOF frame header (any SOF0-15
    * except DHT/JPG/DAC), or -1 when the payload is not a parseable JPEG.
    * Segment walk per ITU T.81 §B: FF marker, big-endian length that
    * includes itself; stops at SOS (entropy data follows — a frame with
    * no SOF before SOS is broken) and EOI. */
  def jpegDims(b: Array[Byte]): Long = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return -1L
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return -1L
      var j = i + 1
      while (j < b.length && (b(j) & 0xFF) == 0xFF) j += 1 // fill bytes
      if (j >= b.length) return -1L
      val marker = b(j) & 0xFF
      if (marker >= 0xC0 && marker <= 0xCF &&
        marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        if (j + 8 >= b.length) return -1L
        val h = be2(b, j + 4)
        val w = be2(b, j + 6)
        if (w == 0 || h == 0) return -1L
        return (w.toLong << 32) | h.toLong
      }
      if (marker == 0xD9 || marker == 0xDA) return -1L // EOI / SOS first
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) i = j + 1
      else {
        if (j + 2 >= b.length) return -1L
        val len = be2(b, j + 1)
        if (len < 2) return -1L
        i = j + 1 + len
      }
    }
    -1L
  }

  /** Presentation duration in milliseconds from moov/mvhd (version 0 and
    * 1 layouts, ISO/IEC 14496-12 §8.2.2), or -1 when the payload is not a
    * parseable MP4. Requires the leading `ftyp` box (the sniffing
    * contract); tolerates trailing bytes after `moov`. */
  def mp4DurationMs(b: Array[Byte]): Long = {
    if (b == null || b.length < 16 || !typeIs(b, 4, "ftyp")) return -1L
    var i = 0L
    val n = b.length.toLong
    while (i + 8 <= n) {
      var size = be4(b, i.toInt)
      var hdr = 8L
      if (size == 1L) {
        if (i + 16 > n) return -1L
        size = be8(b, i.toInt + 8); hdr = 16L
      } else if (size == 0L) size = n - i // box runs to EOF
      if (size < hdr || i + size > n) return -1L
      if (typeIs(b, i.toInt + 4, "moov")) {
        var c = i + hdr
        val end = i + size
        while (c + 8 <= end) {
          var cs = be4(b, c.toInt)
          var chdr = 8L
          if (cs == 1L) {
            if (c + 16 > end) return -1L
            cs = be8(b, c.toInt + 8); chdr = 16L
          } else if (cs == 0L) cs = end - c
          if (cs < chdr || c + cs > end) return -1L
          if (typeIs(b, c.toInt + 4, "mvhd")) {
            val ct = (c + chdr).toInt
            if (ct + 4 > end) return -1L
            val (ts, dur) = (b(ct) & 0xFF) match {
              case 0 =>
                if (ct + 20 > end) return -1L
                (be4(b, ct + 12), be4(b, ct + 16))
              case 1 =>
                if (ct + 32 > end) return -1L
                (be4(b, ct + 20), be8(b, ct + 24))
              case _ => return -1L
            }
            if (ts <= 0L || dur < 0L) return -1L
            return dur * 1000L / ts
          }
          c += cs
        }
        return -1L // moov without mvhd
      }
      i += size
    }
    -1L
  }

  def jpegDimsPacked(p: Column): Column =
    GraftSqlShim.column(JpegDimsExpr(GraftSqlShim.expression(p)))
  def mp4Duration(p: Column): Column =
    GraftSqlShim.column(Mp4DurationExpr(GraftSqlShim.expression(p)))
}

/** `(width << 32) | height` of a JPEG payload, -1 if unparseable. */
case class JpegDimsExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "jpeg_dims_packed"
  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.jpegDims(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaKernels.jpegDims($c)")
  override protected def withNewChildInternal(newChild: Expression): JpegDimsExpr =
    copy(child = newChild)
}

/** mvhd duration in ms of an MP4 payload, -1 if unparseable. */
case class Mp4DurationExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[GraftSqlShim.AbstractType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "mp4_duration_ms"
  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.mp4DurationMs(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaKernels.mp4DurationMs($c)")
  override protected def withNewChildInternal(newChild: Expression): Mp4DurationExpr =
    copy(child = newChild)
}
