package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's code points:
  *
  *   h = fold(codepoints, 0L, (acc, c) => (acc * 131 + c) mod (2^31 - 1))
  *
  * The point of this hash is PORTABILITY, not speed of mixing: it is pure
  * integer arithmetic with no 64-bit wraparound, so an external SQL engine
  * (the DuckDB oracle — OracleSql.polyHashSql) can reproduce it bit-for-bit,
  * which xxhash64 cannot do without modular-multiply gymnastics. The
  * hash-dependent operators (feature hashing, MinHash, SimHash, hyperplane
  * LSH) take the hash as a parameter: xxhash64 for raw speed, poly_hash when
  * the result must be verifiable outside Spark.
  *
  * Identical values to the built-in HOF formulation
  * `aggregate(transform(split(s, ""), c => ascii(c)), 0L, (a, c) => ...)`
  * for any string without unpaired surrogates (split("") keeps surrogate
  * pairs together and ascii() returns the code point), but evaluated as a
  * single codegen loop instead of three interpreted higher-order functions
  * with two intermediate arrays per row.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash requires a string input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 2147483647L // 2^31 - 1
  final val Mul = 131L

  /** Shared by interpreted eval and codegen (one JIT-friendly static loop). */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * Mul + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Column API for the text expressions. */
object TextFunctions {
  def poly_hash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
}
