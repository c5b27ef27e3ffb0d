package graft.sources

import org.apache.spark.sql.types.{DataType, Decimal, FloatType, IntegerType}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Columnar widening shim for TYPE-WIDENING schema evolution
  * ([[ArrowInterchange.isWidening]]): a pre-evolution file's vector
  * carries the NARROW physical type (int32 / float / decimal(p,s)) while
  * the plan reads the table's widened type (int64 / double /
  * decimal(p+k,s)) — codegen therefore calls `getLong`/`getDouble`/
  * `getDecimal` against a vector whose own accessor only answers the
  * narrow getter. This wrapper answers the WIDE getter by exact
  * conversion from the narrow one (`int.toLong`, `float.toDouble` — the
  * IEEE-exact widening, the same value the stats canonicals recorded),
  * keeping mixed-generation directories on the zero-copy columnar path
  * instead of falling back to row decode. Decimal needs no value
  * conversion at all: Spark's arrow accessor builds the Decimal with the
  * CALLER's precision/scale, so the delegate call is already correct. */
private[sources] final class WideningColumnVector(
    inner: ColumnVector, target: DataType, fileType: DataType)
    extends ColumnVector(target) {

  override def close(): Unit = inner.close()

  override def hasNull: Boolean = inner.hasNull
  override def numNulls: Int = inner.numNulls
  override def isNullAt(rowId: Int): Boolean = inner.isNullAt(rowId)

  override def getLong(rowId: Int): Long = fileType match {
    case IntegerType => inner.getInt(rowId).toLong
    case _ => inner.getLong(rowId)
  }

  override def getDouble(rowId: Int): Double = fileType match {
    case FloatType => inner.getFloat(rowId).toDouble
    case _ => inner.getDouble(rowId)
  }

  override def getDecimal(rowId: Int, precision: Int, scale: Int): Decimal =
    inner.getDecimal(rowId, precision, scale)

  // narrow getters pass through — a plan never asks for them on a
  // widened column, but the contract costs nothing to keep total
  override def getBoolean(rowId: Int): Boolean = inner.getBoolean(rowId)
  override def getByte(rowId: Int): Byte = inner.getByte(rowId)
  override def getShort(rowId: Int): Short = inner.getShort(rowId)
  override def getInt(rowId: Int): Int = inner.getInt(rowId)
  override def getFloat(rowId: Int): Float = inner.getFloat(rowId)
  override def getArray(rowId: Int): ColumnarArray = inner.getArray(rowId)
  override def getMap(ordinal: Int): ColumnarMap = inner.getMap(ordinal)
  override def getUTF8String(rowId: Int): UTF8String = inner.getUTF8String(rowId)
  override def getBinary(rowId: Int): Array[Byte] = inner.getBinary(rowId)
  override def getChild(ordinal: Int): ColumnVector = inner.getChild(ordinal)
}

private[sources] object WideningColumnVector {
  /** Wrap `vec` iff the file's type differs from (widens to) `target`. */
  def maybe(vec: ColumnVector, fileType: DataType, target: DataType)
      : ColumnVector =
    if (fileType == target) vec
    else {
      assert(ArrowInterchange.isWidening(fileType, target),
        s"widening shim asked for non-widening $fileType -> $target")
      new WideningColumnVector(vec, target, fileType)
    }
}
