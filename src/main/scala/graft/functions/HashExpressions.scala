package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen expressions for the reference's scalar hash family
  * (/root/reference/Functions/FunctionsHashing.h:42-116), bit-exact via the
  * [[RefHash]] kernels. One static call per column per row from generated
  * Java — the same execution shape as Spark's built-in `xxhash64`.
  *
  * MULTI-ARGUMENT semantics follow the reference exactly: each column's
  * bytes are hashed separately and folded left-to-right with the
  * function's `combineHashes` (Hash128to64 for the 64-bit family,
  * intHash32^ for xxHash32, wyhash-over-16-bytes for wyHash64).
  *
  * Input: strings (UTF-8 bytes) and/or binary. Output: LongType — UInt64
  * results carry the raw 64 bits (Spark's own xxhash64 convention); the
  * UInt32 xxHash32 is zero-extended so values read as the reference's
  * unsigned integers (SURVEY §1.3 widening rule).
  */
abstract class RefHashExpression extends Expression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs at least one arg")
    else children.map(_.dataType).find(t => t != StringType && t != BinaryType) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs string or binary args, got $bad")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  /** Static call on [[RefHash]]: byte[] → long. */
  protected def kernelCall(bytes: String): String
  protected def kernel(b: Array[Byte]): Long
  /** Static combine call on [[RefHash]]: (long, long) → long. */
  protected def combineCall(h1: String, h2: String): String
  protected def combine(h1: Long, h2: Long): Long

  override def eval(input: InternalRow): Any = {
    var h = 0L
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      val bytes = v match {
        case s: UTF8String => s.getBytes
        case b: Array[Byte] => b
      }
      h = if (i == 0) kernel(bytes) else combine(h, kernel(bytes))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val h = ctx.freshName("h")
    val steps = children.indices.map { i =>
      val g = gens(i)
      val bytes = children(i).dataType match {
        case StringType => s"${g.value}.getBytes()"
        case _ => g.value.toString
      }
      val assign =
        if (i == 0) s"$h = ${kernelCall(bytes)};"
        else s"$h = ${combineCall(h, kernelCall(bytes))};"
      s"""
         |if (!${ev.isNull}) {
         |  ${g.code}
         |  if (${g.isNull}) { ${ev.isNull} = true; } else { $assign }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        long $h = 0L;
        $steps
        long ${ev.value} = $h;""")
  }
}

/** CityHash v1.0.2 64-bit (reference ImplCityHash64). */
case class CityHash64Expr(children: Seq[Expression]) extends RefHashExpression {
  override def prettyName: String = "city_hash64"
  protected def kernelCall(bytes: String): String = s"graft.functions.RefHash.cityHash64($bytes)"
  protected def kernel(b: Array[Byte]): Long = RefHash.cityHash64(b)
  protected def combineCall(h1: String, h2: String): String = s"graft.functions.RefHash.combine64($h1, $h2)"
  protected def combine(h1: Long, h2: Long): Long = RefHash.combine64(h1, h2)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CityHash64Expr =
    copy(children = c)
}

/** XXH32 seed 0 (reference ImplXxHash32), zero-extended to long. */
case class XxHash32Expr(children: Seq[Expression]) extends RefHashExpression {
  override def prettyName: String = "xx_hash32"
  protected def kernelCall(bytes: String): String =
    s"(graft.functions.RefHash.xxh32($bytes, 0) & 0xFFFFFFFFL)"
  protected def kernel(b: Array[Byte]): Long = RefHash.xxh32(b, 0) & 0xFFFFFFFFL
  protected def combineCall(h1: String, h2: String): String = s"graft.functions.RefHash.combineXxh32($h1, $h2)"
  protected def combine(h1: Long, h2: Long): Long = RefHash.combineXxh32(h1, h2)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): XxHash32Expr =
    copy(children = c)
}

/** XXH64 seed 0 over the raw bytes (reference ImplXxHash64 — NOT Spark's
  * xxhash64, which hashes the Spark-internal value encoding with seed 42). */
case class XxHash64RawExpr(children: Seq[Expression]) extends RefHashExpression {
  override def prettyName: String = "xx_hash64_raw"
  protected def kernelCall(bytes: String): String = s"graft.functions.RefHash.xxh64($bytes, 0L)"
  protected def kernel(b: Array[Byte]): Long = RefHash.xxh64(b, 0L)
  protected def combineCall(h1: String, h2: String): String = s"graft.functions.RefHash.combine64($h1, $h2)"
  protected def combine(h1: Long, h2: Long): Long = RefHash.combine64(h1, h2)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): XxHash64RawExpr =
    copy(children = c)
}

/** XXH3_64bits, default secret (reference ImplXXH3). */
case class Xxh3Expr(children: Seq[Expression]) extends RefHashExpression {
  override def prettyName: String = "xxh3_64"
  protected def kernelCall(bytes: String): String = s"graft.functions.RefHash.xxh3_64($bytes)"
  protected def kernel(b: Array[Byte]): Long = RefHash.xxh3_64(b)
  protected def combineCall(h1: String, h2: String): String = s"graft.functions.RefHash.combine64($h1, $h2)"
  protected def combine(h1: Long, h2: Long): Long = RefHash.combine64(h1, h2)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Xxh3Expr =
    copy(children = c)
}

/** wyhash final 3, seed 0, default secret (reference ImplWyHash64). */
case class WyHash64Expr(children: Seq[Expression]) extends RefHashExpression {
  override def prettyName: String = "wy_hash64"
  protected def kernelCall(bytes: String): String = s"graft.functions.RefHash.wyHash64($bytes, 0L)"
  protected def kernel(b: Array[Byte]): Long = RefHash.wyHash64(b, 0L)
  protected def combineCall(h1: String, h2: String): String = s"graft.functions.RefHash.combineWy($h1, $h2)"
  protected def combine(h1: Long, h2: Long): Long = RefHash.combineWy(h1, h2)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): WyHash64Expr =
    copy(children = c)
}

object HashExpressions {
  private def exprs(cs: Seq[Column]): Seq[Expression] = cs.map(GraftSqlShim.expression)
  def cityHash64(cs: Column*): Column = GraftSqlShim.column(CityHash64Expr(exprs(cs)))
  def xxHash32(cs: Column*): Column = GraftSqlShim.column(XxHash32Expr(exprs(cs)))
  def xxHash64Raw(cs: Column*): Column = GraftSqlShim.column(XxHash64RawExpr(exprs(cs)))
  def xxh3(cs: Column*): Column = GraftSqlShim.column(Xxh3Expr(exprs(cs)))
  def wyHash64(cs: Column*): Column = GraftSqlShim.column(WyHash64Expr(exprs(cs)))
}
