package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Hot loop shared by interpreted and codegen'd paths: product-
  * quantization assignment of one float vector against a FLAT codebook
  * (`ksub` centroids × `dims` floats, laid out [code][dim]). Each of
  * the `m` subvectors takes the centroid with minimal squared L2 over
  * its dim range, summed left-to-right in double — the exact
  * association order a SQL list_reduce mirrors, so codes (and the tie
  * rule: strict `<`, first/smallest code wins) are bit-identical
  * across engines. Indices beyond the vector's length read 0.
  */
object PqAssign {
  def assign(vec: ArrayData, cb: ArrayData, m: Int, ksub: Int): ArrayData = {
    val dims = cb.numElements() / ksub
    val sub = dims / m
    val n = vec.numElements()
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        var d2 = 0.0d
        var i = 0
        while (i < sub) {
          val idx = j * sub + i
          val v = if (idx < n) vec.getFloat(idx).toDouble else 0.0d
          val t = v - cb.getFloat(c * dims + idx).toDouble
          d2 += t * t
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd PQ assignment over a float-array column against a
  * literal flat codebook (`graft_pqassign(vec, cbFlat, m, ksub)` in
  * the session registry): one compiled loop per row, no per-(row,
  * code) explode, no shuffle — the model is broadcast as a literal,
  * the data never moves (the X21 k-means discipline applied to the
  * faiss-style memory-reduction step).
  */
case class PqAssignExpr(left: Expression, right: Expression,
                        m: Int, ksub: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pqassign"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pqassign expects (array<float>, array<float>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(vec: Any, cb: Any): Any =
    PqAssign.assign(vec.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqAssign.assign($v, $c, $m, $ksub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAssignExpr =
    copy(left = newLeft, right = newRight)
}
