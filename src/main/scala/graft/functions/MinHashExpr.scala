package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Hot loop shared by interpreted and codegen'd paths: the k-way MinHash
  * signature over precomputed shingle hashes, one pass over the hashes
  * with all k running minima — h_j(x) = ((2j+3)x + (5j+7)) mod 1e9+7,
  * identical to the HOF spelling in TextFeatures.minhashSignature and
  * the DuckDB oracle. Empty input → null (no minimum exists). */
object MinHashSig {
  def signature(hashes: ArrayData, k: Int): GenericArrayData = {
    val n = hashes.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val h = ((2L * j + 3L) * x + (5L * j + 7L)) % PolyHash.Mod
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box))
  }
}

/** Native codegen'd k-way MinHash signature (`graft_minhash<k>`): the
  * HOF spelling re-walks the hash array once per hash function through
  * an interpreted expression tree; this is one compiled pass. */
case class MinHashExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"graft_minhash$k"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash expects array<bigint>, got ${other.sql}")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashSig.signature($c, $k);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}
