package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector for graft's native expressions —
  * lets a cluster enable them declaratively:
  *
  *   spark.sql.extensions=graft.functions.GraftSparkExtensions
  *
  * so `normalize_text` / `graft_polyhash` / `graft_dot` resolve in every
  * session (SQL included) without imperative registration. The
  * imperative [[GraftFunctions.register]] remains for embedded use; both
  * paths build the same expressions.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftSparkExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(str) - reference cell normalization"),
      (es: Seq[Expression]) => NormalizeTextExpr(es.head, header = false)))
    ext.injectFunction((FunctionIdentifier("normalize_header"),
      info("normalize_header", "normalize_header(str) - reference header normalization"),
      (es: Seq[Expression]) => NormalizeTextExpr(es.head, header = true)))
    ext.injectFunction((FunctionIdentifier("graft_polyhash"),
      info("graft_polyhash", "graft_polyhash(str) - polynomial code-point hash mod 1e9+7"),
      (es: Seq[Expression]) => PolyHashExpr(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - ordered double dot product of float arrays"),
      (es: Seq[Expression]) => DotProductExpr(es.head, es(1))))
  }
}
