package graft.ssa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The SSA "program" layer: the reference engine's entire scalar-expression /
  * filter / group-by surface, declared as data and interpreted into a lazy
  * DataFrame transformation chain.
  *
  * Reference: YdbModes/SsaProgram.h:234-289 (ProgramStep = assignes, filters,
  * groupBy + groupByKeys, projection), applied in that order per step
  * (YdbModes/SsaProgram.cpp:715-743). The reference evaluates each step
  * eagerly per Arrow batch; here a Program builds a Catalyst logical plan, so
  * column pruning, predicate pushdown, constant folding and whole-stage
  * codegen happen for free, and execution distributes across partitions
  * instead of running in the calling thread.
  */
sealed trait EOperation

/** Scalar operation inventory, mirroring the enabled subset of the
  * reference's EOperation enum (YdbModes/SsaProgram.h:10-96; kernel mapping
  * SsaProgram.cpp:52-196; arity rules SsaProgram.cpp:198-288). */
object EOperation {
  // Constant scalar attach (reference: Assign with a scalar datum).
  case object Constant extends EOperation
  // Casts (reference: arrow "cast" kernel per target type).
  case object CastBoolean extends EOperation
  case object CastInt8 extends EOperation
  case object CastInt16 extends EOperation
  case object CastInt32 extends EOperation
  case object CastInt64 extends EOperation
  // Unsigned targets widen (no unsigned on the JVM — SURVEY §1.3).
  case object CastUInt8 extends EOperation
  case object CastUInt16 extends EOperation
  case object CastUInt32 extends EOperation
  case object CastUInt64 extends EOperation
  case object CastFloat extends EOperation
  case object CastDouble extends EOperation
  case object CastBinary extends EOperation
  case object CastString extends EOperation
  case object CastTimestamp extends EOperation
  // Null tests (arrow is_valid / is_null).
  case object IsValid extends EOperation
  case object IsNull extends EOperation
  // Comparisons.
  case object Equal extends EOperation
  case object NotEqual extends EOperation
  case object Less extends EOperation
  case object LessEqual extends EOperation
  case object Greater extends EOperation
  case object GreaterEqual extends EOperation
  // Boolean.
  case object Invert extends EOperation
  case object And extends EOperation
  case object Or extends EOperation
  case object Xor extends EOperation
  // Arithmetic (non-checked: wraps on overflow — keep ANSI mode off).
  case object Add extends EOperation
  case object Subtract extends EOperation
  case object Multiply extends EOperation
  case object Divide extends EOperation
  case object Abs extends EOperation
  case object Negate extends EOperation
  // Checked arithmetic (reference add_checked → error on overflow). Two
  // interpreter modes: default maps to Spark try_* (NULL on overflow —
  // the distributed-friendly choice); `checkedErrors = true` restores
  // reference parity by raising on the NULL-from-non-NULL-inputs case.
  case object AddNotNull extends EOperation
  case object SubtractNotNull extends EOperation
  case object MultiplyNotNull extends EOperation
  case object DivideNotNull extends EOperation
  // Strings (match family takes a pattern + ignoreCase via Assign).
  case object BinaryLength extends EOperation
  case object MatchSubstring extends EOperation
  case object MatchLike extends EOperation
  case object StartsWith extends EOperation
  case object EndsWith extends EOperation
  // Rounding.
  case object Floor extends EOperation
  case object Ceil extends EOperation
  case object Trunc extends EOperation
  case object Round extends EOperation
  // Declared-but-disabled ops the reference earmarks as future work
  // (SsaProgram.cpp:112-121 Modulo; :156 math fns / RoundBankers; :190
  // is_in TODO) — trivial on Spark, enabled here.
  case object Modulo extends EOperation
  case object Sqrt extends EOperation
  case object RoundBankers extends EOperation
  /** membership test; the value set rides in Assign.const as a Seq. */
  case object IsIn extends EOperation
}

/** Aggregate function ids — the implemented subset of the reference's
  * AggFunctionId (AggregateFunctions/IAggregateFunction.h:454-473; the
  * var/stddev/argmin/quantile ids are commented out there too). */
sealed trait EAggregate
object EAggregate {
  case object Count extends EAggregate
  case object Sum extends EAggregate
  case object Min extends EAggregate
  case object Max extends EAggregate
  case object Avg extends EAggregate
  /** "any": first non-null in encounter order (reference EAggregate::Some,
    * AggregateFunctionMinMaxAny.h:526-534). Order-dependent in both engines —
    * tests assert membership, not a specific value (SURVEY §7 risk 3). */
  case object AnyValue extends EAggregate
}

/** One named expression: `name := op(args…)`, appended to the step's column
  * namespace (reference Assign, SsaProgram.h:118-194). `const` carries the
  * scalar for Constant and the pattern for the match family. */
final case class Assign(
    name: String,
    op: EOperation,
    args: Seq[String] = Nil,
    const: Option[Any] = None,
    ignoreCase: Boolean = false)

/** One aggregate: `name := func(arg)`; arg None = count(*) (reference
  * AggregateDescription, arrow_clickhouse_types.h:144-153). */
final case class AggregateAssign(name: String, func: EAggregate, arg: Option[String] = None)

/** One SSA step; sub-phases apply in reference order: assignes → filters →
  * aggregates → projection (SsaProgram.cpp:715-743). Steps are the
  * pipeline barriers in the reference; in Spark they just concatenate into
  * one logical plan and Catalyst re-partitions the work. */
final case class ProgramStep(
    assignes: Seq[Assign] = Nil,
    filters: Seq[String] = Nil,
    groupBy: Seq[AggregateAssign] = Nil,
    groupByKeys: Seq[String] = Nil,
    projection: Seq[String] = Nil) {

  /** @param checkedErrors reference-parity mode for the *NotNull family:
    *   raise (like the arrow checked kernels, SsaProgram.cpp:244-253) when
    *   a checked op would produce NULL from non-NULL inputs — i.e. on
    *   overflow or division by zero — instead of the default try_* NULL. */
  def apply(df: DataFrame, checkedErrors: Boolean = false): DataFrame = {
    val afterAssign = ProgramStep.applyAssignes(df, assignes, checkedErrors)
    val afterFilter =
      if (filters.isEmpty) afterAssign
      else afterAssign.filter(filters.map(col).reduce(_ && _))
    val afterAgg =
      if (groupBy.isEmpty) afterFilter
      else if (groupByKeys.isEmpty) {
        // Keyless aggregation → exactly one row, even on empty input
        // (count = 0, sum/min/max = NULL) — Spark's global agg matches the
        // reference (Aggregator.cpp:571-577).
        val aggs = groupBy.map(ProgramStep.aggColumn)
        afterFilter.agg(aggs.head, aggs.tail: _*)
      } else {
        val aggs = groupBy.map(ProgramStep.aggColumn)
        afterFilter
          .groupBy(groupByKeys.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
      }
    if (projection.isEmpty) afterAgg else afterAgg.select(projection.map(col): _*)
  }
}

object ProgramStep {

  /** Evaluate assigns in order into one `select` — later assigns may
    * reference earlier ones in the same step (the reference appends each
    * result column to the batch namespace, SsaProgram.cpp:481-509).
    * Duplicate names are rejected like the reference does. */
  private[ssa] def applyAssignes(
      df: DataFrame, assigns: Seq[Assign],
      checkedErrors: Boolean = false): DataFrame = {
    if (assigns.isEmpty) return df
    val existing = df.columns.toSet
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Column]
    def resolve(n: String): Column = acc.getOrElse(n, col(n))
    assigns.foreach { a =>
      require(!existing.contains(a.name) && !acc.contains(a.name),
        s"duplicate column in assign: ${a.name}")
      acc += a.name -> eval(a, resolve, checkedErrors)
    }
    df.select(df.columns.toIndexedSeq.map(col) ++ acc.map { case (n, c) => c.as(n) }: _*)
  }

  private[ssa] def aggColumn(a: AggregateAssign): Column = {
    import EAggregate._
    val c = a.func match {
      case Count    => a.arg.map(x => count(col(x))).getOrElse(count(lit(1)))
      case Sum      => sum(col(a.arg.get))
      case Min      => min(col(a.arg.get))
      case Max      => max(col(a.arg.get))
      case Avg      => avg(col(a.arg.get))
      case AnyValue => first(col(a.arg.get), ignoreNulls = true)
    }
    c.as(a.name)
  }

  /** EOperation → Catalyst expression (the table in SURVEY §2.2). */
  private[ssa] def eval(
      a: Assign, resolve: String => Column,
      checkedErrors: Boolean = false): Column = {
    import EOperation._
    def arg0 = resolve(a.args(0))
    def arg1 = resolve(a.args(1))
    def pattern: String = a.const match {
      case Some(s: String) => s
      case other => throw new IllegalArgumentException(s"${a.op} needs a string pattern, got $other")
    }
    // Case-insensitive match family uses Java-regex Unicode case folding
    // ((?iu) — character-level simple folding, the same family RE2 applies
    // for the reference's MatchSubstringOptions{ignore_case},
    // ut_ssa_step.cpp:159-185). Deliberately NOT lower()-based: lowercasing
    // is locale/normalization-sensitive (İ U+0130 lowers to "i̇" — two
    // codepoints — so lower-vs-lower misses İ≈i, which folding catches).
    def ciRegex(body: String): String = "(?ius)" + body
    def quoted: String = java.util.regex.Pattern.quote(pattern)
    // LIKE pattern → anchored Java regex (%→.*, _→., rest quoted
    // per-char); (?s) so _ and % cross newlines like LIKE does.
    def likeAsRegex: String = pattern.map {
      case '%' => ".*"
      case '_' => "."
      case c   => java.util.regex.Pattern.quote(c.toString)
    }.mkString
    // Checked-kernel parity: try_* yields NULL both for NULL inputs (keep)
    // and for overflow/zero-division from non-NULL inputs (reference
    // raises) — the guard separates the two cases.
    def checked(t: Column): Column =
      if (!checkedErrors) t
      else when(t.isNull && arg0.isNotNull && arg1.isNotNull,
        raise_error(lit(s"${a.op}: overflow or invalid argument " +
          "(checked-kernel parity mode)"))).otherwise(t)

    a.op match {
      case Constant       => lit(a.const.get)
      case CastBoolean    => arg0.cast(BooleanType)
      case CastInt8       => arg0.cast(ByteType)
      case CastInt16      => arg0.cast(ShortType)
      case CastInt32      => arg0.cast(IntegerType)
      case CastInt64      => arg0.cast(LongType)
      case CastUInt8      => arg0.cast(ShortType)       // widened, SURVEY §1.3
      case CastUInt16     => arg0.cast(IntegerType)
      case CastUInt32     => arg0.cast(LongType)
      case CastUInt64     => arg0.cast(DecimalType(20, 0))
      case CastFloat      => arg0.cast(FloatType)
      case CastDouble     => arg0.cast(DoubleType)
      case CastBinary     => arg0.cast(BinaryType)
      case CastString     => arg0.cast(StringType)
      case CastTimestamp  => arg0.cast(TimestampType)
      case IsValid        => arg0.isNotNull
      case IsNull         => arg0.isNull
      case Equal          => arg0 === arg1
      case NotEqual       => arg0 =!= arg1
      case Less           => arg0 < arg1
      case LessEqual      => arg0 <= arg1
      case Greater        => arg0 > arg1
      case GreaterEqual   => arg0 >= arg1
      case Invert         => !arg0
      case And            => arg0 && arg1
      case Or             => arg0 || arg1
      case Xor            => arg0 =!= arg1              // boolean xor
      case Add            => arg0 + arg1
      case Subtract       => arg0 - arg1
      case Multiply       => arg0 * arg1
      case Divide         => arg0 / arg1
      case Abs            => abs(arg0)
      case Negate         => negate(arg0)
      case AddNotNull      => checked(try_add(arg0, arg1))
      case SubtractNotNull => checked(try_subtract(arg0, arg1))
      case MultiplyNotNull => checked(try_multiply(arg0, arg1))
      case DivideNotNull   => checked(try_divide(arg0, arg1))
      case BinaryLength   => octet_length(arg0)
      case MatchSubstring =>
        if (a.ignoreCase) arg0.rlike(ciRegex(quoted))
        else arg0.contains(lit(pattern))
      case MatchLike      =>
        // \A/\z anchors, not ^/$ — $ would also match before a trailing
        // newline, which LIKE does not.
        if (a.ignoreCase) arg0.rlike(ciRegex("\\A" + likeAsRegex + "\\z"))
        else arg0.like(pattern)
      case StartsWith     =>
        if (a.ignoreCase) arg0.rlike(ciRegex("\\A" + quoted))
        else arg0.startsWith(lit(pattern))
      case EndsWith       =>
        if (a.ignoreCase) arg0.rlike(ciRegex(quoted + "\\z"))
        else arg0.endsWith(lit(pattern))
      case Floor          => floor(arg0)
      case Ceil           => ceil(arg0)
      // Numeric truncation toward zero (arrow "trunc"): floor for
      // non-negatives, ceil for negatives.
      case Trunc          => when(arg0 >= 0, floor(arg0)).otherwise(ceil(arg0))
      case Round          => round(arg0)
      case Modulo         => arg0 % arg1   // remainder, sign of dividend
      case Sqrt           => sqrt(arg0)
      case RoundBankers   => bround(arg0)
      case IsIn           => arg0.isInCollection(a.const.get.asInstanceOf[Seq[Any]])
    }
  }
}

/** A whole program = ordered steps (reference Program::applyTo,
  * SsaProgram.h:265-289). */
final case class Program(steps: Seq[ProgramStep]) {
  def applyTo(df: DataFrame, checkedErrors: Boolean = false): DataFrame =
    steps.foldLeft(df)((d, s) => s.apply(d, checkedErrors))
}
