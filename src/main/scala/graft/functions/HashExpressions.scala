package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen expressions for the reference's scalar hash family
  * (/root/reference/Functions/FunctionsHashing.h:42-116), bit-exact via the
  * [[RefHash]] kernels. One static call per row from generated Java — the
  * same execution shape as Spark's built-in `xxhash64`.
  *
  * Input: string (hashes the UTF-8 bytes) or binary. Output: LongType —
  * UInt64 results carry the raw 64 bits (Spark's own xxhash64 convention);
  * the UInt32 xxHash32 is zero-extended so values read as the reference's
  * unsigned integers (SURVEY §1.3 widening rule).
  */
abstract class RefHashExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string or binary arg, got $other")
  }
  override def dataType: DataType = LongType

  /** Static method on [[RefHash]] mapping byte[] → long (exact codegen call). */
  protected def kernelCall(bytes: String): String
  protected def kernel(bytes: Array[Byte]): Long

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => kernel(s.getBytes)
    case b: Array[Byte] => kernel(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = child.dataType match {
        case StringType => s"$c.getBytes()"
        case _ => c
      }
      s"${ev.value} = ${kernelCall(bytes)};"
    })
}

/** CityHash v1.0.2 64-bit (reference ImplCityHash64). */
case class CityHash64Expr(child: Expression) extends RefHashExpression {
  override def prettyName: String = "city_hash64"
  protected def kernelCall(bytes: String): String =
    s"graft.functions.RefHash.cityHash64($bytes)"
  protected def kernel(b: Array[Byte]): Long = RefHash.cityHash64(b)
  override protected def withNewChildInternal(c: Expression): CityHash64Expr = copy(child = c)
}

/** XXH32 seed 0 (reference ImplXxHash32), zero-extended to long. */
case class XxHash32Expr(child: Expression) extends RefHashExpression {
  override def prettyName: String = "xx_hash32"
  protected def kernelCall(bytes: String): String =
    s"graft.functions.RefHash.xxh32($bytes, 0) & 0xFFFFFFFFL"
  protected def kernel(b: Array[Byte]): Long = RefHash.xxh32(b, 0) & 0xFFFFFFFFL
  override protected def withNewChildInternal(c: Expression): XxHash32Expr = copy(child = c)
}

/** XXH64 seed 0 over the raw bytes (reference ImplXxHash64 — NOT Spark's
  * xxhash64, which hashes the Spark-internal value encoding with seed 42). */
case class XxHash64RawExpr(child: Expression) extends RefHashExpression {
  override def prettyName: String = "xx_hash64_raw"
  protected def kernelCall(bytes: String): String =
    s"graft.functions.RefHash.xxh64($bytes, 0L)"
  protected def kernel(b: Array[Byte]): Long = RefHash.xxh64(b, 0L)
  override protected def withNewChildInternal(c: Expression): XxHash64RawExpr = copy(child = c)
}

/** XXH3_64bits, default secret (reference ImplXXH3). */
case class Xxh3Expr(child: Expression) extends RefHashExpression {
  override def prettyName: String = "xxh3_64"
  protected def kernelCall(bytes: String): String =
    s"graft.functions.RefHash.xxh3_64($bytes)"
  protected def kernel(b: Array[Byte]): Long = RefHash.xxh3_64(b)
  override protected def withNewChildInternal(c: Expression): Xxh3Expr = copy(child = c)
}

/** wyhash final 3, seed 0, default secret (reference ImplWyHash64). */
case class WyHash64Expr(child: Expression) extends RefHashExpression {
  override def prettyName: String = "wy_hash64"
  protected def kernelCall(bytes: String): String =
    s"graft.functions.RefHash.wyHash64($bytes, 0L)"
  protected def kernel(b: Array[Byte]): Long = RefHash.wyHash64(b, 0L)
  override protected def withNewChildInternal(c: Expression): WyHash64Expr = copy(child = c)
}

object HashExpressions {
  def cityHash64(c: Column): Column =
    GraftSqlShim.column(CityHash64Expr(GraftSqlShim.expression(c)))
  def xxHash32(c: Column): Column =
    GraftSqlShim.column(XxHash32Expr(GraftSqlShim.expression(c)))
  def xxHash64Raw(c: Column): Column =
    GraftSqlShim.column(XxHash64RawExpr(GraftSqlShim.expression(c)))
  def xxh3(c: Column): Column =
    GraftSqlShim.column(Xxh3Expr(GraftSqlShim.expression(c)))
  def wyHash64(c: Column): Column =
    GraftSqlShim.column(WyHash64Expr(GraftSqlShim.expression(c)))
}
