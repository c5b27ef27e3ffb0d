package graft.sources

import org.apache.spark.sql.types.{Decimal, StructType}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Row-REMAPPING shim for deletion-vector masking on the COLUMNAR path:
  * logical row `i` of the masked batch reads physical row `map(i)` of
  * the underlying Arrow vector — the batch shrinks to the survivors
  * without copying a byte of column data (the map is one int per
  * surviving row, shared across all of the batch's columns). This is
  * what keeps a vector-carrying file on the zero-copy columnar read:
  * without it the whole SCAN would fall to the row path, because Spark
  * requires every partition of one scan to agree on columnar-vs-row.
  *
  * Nested types ride the same map: struct field access goes through
  * [[getChild]] (ColumnarRow resolves `child.getX(rowId)` with the
  * TOP-LEVEL row id, so the child wraps with the same map); array/map
  * accessors return the inner vector's slices, whose offsets index the
  * UNWRAPPED child data — physical coordinates, unaffected by masking.
  *
  * `hasNull`/`numNulls` delegate unmapped and may OVER-report (a masked
  * row's null still counts) — safe: the only consumer effect is a
  * skippable null check. */
private[sources] final class MaskedColumnVector(
    inner: ColumnVector, map: Array[Int])
    extends ColumnVector(inner.dataType) {

  override def close(): Unit = inner.close()

  override def hasNull: Boolean = inner.hasNull
  override def numNulls: Int = inner.numNulls

  override def isNullAt(rowId: Int): Boolean = inner.isNullAt(map(rowId))
  override def getBoolean(rowId: Int): Boolean = inner.getBoolean(map(rowId))
  override def getByte(rowId: Int): Byte = inner.getByte(map(rowId))
  override def getShort(rowId: Int): Short = inner.getShort(map(rowId))
  override def getInt(rowId: Int): Int = inner.getInt(map(rowId))
  override def getLong(rowId: Int): Long = inner.getLong(map(rowId))
  override def getFloat(rowId: Int): Float = inner.getFloat(map(rowId))
  override def getDouble(rowId: Int): Double = inner.getDouble(map(rowId))
  override def getDecimal(rowId: Int, precision: Int, scale: Int): Decimal =
    inner.getDecimal(map(rowId), precision, scale)
  override def getUTF8String(rowId: Int): UTF8String =
    inner.getUTF8String(map(rowId))
  override def getBinary(rowId: Int): Array[Byte] = inner.getBinary(map(rowId))
  override def getArray(rowId: Int): ColumnarArray = inner.getArray(map(rowId))
  override def getMap(rowId: Int): ColumnarMap = inner.getMap(map(rowId))

  // struct children resolve per-field with the top-level row id — wrap
  // each with the same map, once (ColumnarRow calls getChild per access)
  private val kids = new Array[ColumnVector](inner.dataType match {
    case s: StructType => s.size
    case _ => 0
  })
  override def getChild(ordinal: Int): ColumnVector = {
    if (ordinal < kids.length) {
      if (kids(ordinal) == null)
        kids(ordinal) = new MaskedColumnVector(inner.getChild(ordinal), map)
      kids(ordinal)
    } else new MaskedColumnVector(inner.getChild(ordinal), map)
  }
}
