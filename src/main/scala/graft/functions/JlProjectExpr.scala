package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Hot loop shared by interpreted and codegen'd paths: the Achlioptas
  * ±1 JL projection of one float vector onto `outDims` pseudo-random
  * hyperplanes. Bit-identical to the HOF spelling it replaces (and to
  * the DuckDB oracle): elements floor-quantize to longs at scale 1e6,
  * the plane entry for flat index i = j·dims + d is +1 iff bit 16 of
  * the LCG value i·1103515245 + 12345 is even, and the fold runs
  * d = 0..dims−1 in order. Indices beyond the vector's length read 0.
  */
object JlProject {
  def project(vec: ArrayData, dims: Int, outDims: Int): ArrayData = {
    val q = new Array[Long](dims)
    val n = math.min(vec.numElements(), dims)
    var d = 0
    while (d < n) {
      q(d) = math.floor(vec.getFloat(d).toDouble * 1e6).toLong
      d += 1
    }
    val out = new Array[Long](outDims)
    var j = 0
    while (j < outDims) {
      var acc = 0L
      var i = j.toLong * dims
      d = 0
      while (d < dims) {
        val lcg = i * 1103515245L + 12345L
        acc += (if (((lcg >> 16) % 2) == 0L) q(d) else -q(d))
        i += 1
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd JL random projection over a float-array column
  * (`graft_jlproject(vec, dims, outDims)` in the session registry).
  * The interpreted HOF spelling walks dims·outDims expression-tree
  * nodes per row (and projection collapse can evaluate the whole
  * nest once per consumer) — this is one flat compiled loop.
  */
case class JlProjectExpr(child: Expression, dims: Int, outDims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_jlproject"

  override def checkInputDataTypes(): TypeCheckResult = {
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_jlproject expects array<float>, got ${other.sql}")
    }
  }

  override def nullSafeEval(input: Any): Any =
    JlProject.project(input.asInstanceOf[ArrayData], dims, outDims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JlProject.project($c, $dims, $outDims)")

  override protected def withNewChildInternal(newChild: Expression): JlProjectExpr =
    copy(child = newChild)
}
