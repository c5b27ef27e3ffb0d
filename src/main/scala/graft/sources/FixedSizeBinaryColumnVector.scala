package graft.sources

import org.apache.arrow.vector.FixedSizeBinaryVector
import org.apache.spark.sql.types.{BinaryType, Decimal}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** Columnar accessor for Arrow FixedSizeBinary vectors — the one type in
  * this source's surface Spark's own `ArrowColumnVector` has no accessor
  * for (verified against 4.1.2: Binary/LargeBinary yes, FixedSizeBinary
  * no), which previously forced any projection touching an
  * `arrow.fixed_size` column onto the row-decode path. Embedding tables
  * keyed by fixed-width ids/digests are exactly the wide scans the
  * zero-copy columnar path exists for, so this small wrapper keeps them
  * on it: Spark sees a BinaryType column; `getBinary` reads the value
  * bytes straight out of the Arrow buffer (one copy into the returned
  * array — the same contract as `ArrowColumnVector`'s BinaryAccessor).
  *
  * The reference treats fixed-size binary as first-class comparable data
  * (CompositeKey.h:175-252); here it stays first-class through the
  * vectorized read too.
  */
private[sources] final class FixedSizeBinaryColumnVector(v: FixedSizeBinaryVector)
    extends ColumnVector(BinaryType) {

  override def close(): Unit = () // the reader owns the Arrow root's lifecycle

  override def hasNull: Boolean = v.getNullCount > 0
  override def numNulls: Int = v.getNullCount
  override def isNullAt(rowId: Int): Boolean = v.isNull(rowId)

  override def getBinary(rowId: Int): Array[Byte] = v.get(rowId)

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"FixedSizeBinary column supports only binary access, not $what")

  override def getBoolean(rowId: Int): Boolean = unsupported("boolean")
  override def getByte(rowId: Int): Byte = unsupported("byte")
  override def getShort(rowId: Int): Short = unsupported("short")
  override def getInt(rowId: Int): Int = unsupported("int")
  override def getLong(rowId: Int): Long = unsupported("long")
  override def getFloat(rowId: Int): Float = unsupported("float")
  override def getDouble(rowId: Int): Double = unsupported("double")
  override def getArray(rowId: Int): ColumnarArray = unsupported("array")
  override def getMap(ordinal: Int): ColumnarMap = unsupported("map")
  override def getDecimal(rowId: Int, precision: Int, scale: Int): Decimal =
    unsupported("decimal")
  override def getUTF8String(rowId: Int): UTF8String = unsupported("string")
  override def getChild(ordinal: Int): ColumnVector = unsupported("child")
}
