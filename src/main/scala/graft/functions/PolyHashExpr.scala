package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Hot loop of every text-mining hash, shared by the interpreted and
  * codegen'd paths. Iterates CODE POINTS, matching both the HOF spelling
  * `aggregate(transform(split(s,''), ascii), ...)` for BMP strings and
  * DuckDB's `ascii()` (code point) — the cross-engine hash contract of
  * the extension oracles. */
object PolyHash {
  val Mod = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** Native Catalyst expression for the polynomial code-point hash
  * (TextFeatures.charHash). The HOF formulation evaluates interpreted —
  * one expression-tree walk per character; this compiles to a tight
  * JVM loop inside whole-stage codegen. Used via the session function
  * registry (`graft_polyhash`) so it also composes inside higher-order
  * lambdas (shingle hashing, token hashing).
  */
case class PolyHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}
