package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hot loop shared by interpreted and codegen'd paths: tf-weighted
  * SimHash over a token array — per occurrence, hash the token
  * ([[PolyHash]]) and add ±1 to each bit counter; result bit b is set
  * iff counter_b > 0. Bit-identical to the HOF spelling in
  * [[TextFeatures.simhash]] (same hash, same counter semantics). */
object SimHash {
  def simhash(toks: ArrayData, bits: Int): Long = {
    val counters = new Array[Long](bits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = PolyHash.hash(toks.getUTF8String(i))
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Native codegen'd SimHash over a token-array column (`graft_simhash`).
  * The HOF spelling allocates a bits-wide array per TOKEN and walks an
  * interpreted expression tree per element — this is a flat compiled
  * loop, the dominant cost of the SimHash dedup operator. */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_simhash expects array<string>, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    SimHash.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
