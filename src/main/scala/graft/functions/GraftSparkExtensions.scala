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
    ext.injectFunction((FunctionIdentifier("graft_bytemax"),
      info("graft_bytemax", "graft_bytemax(bin) - aggregate: elementwise byte max"),
      (es: Seq[Expression]) => ByteMaxAgg(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_hllpack"),
      info("graft_hllpack", "graft_hllpack(bucket, rho, m) - aggregate: packed HLL registers"),
      (es: Seq[Expression]) => HllPackAgg(es.head, es(1),
        es(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_unpack_bytes"),
      info("graft_unpack_bytes", "graft_unpack_bytes(bin) - bytes as array<bigint>"),
      (es: Seq[Expression]) => UnpackBytesExpr(es.head)))
    ext.injectFunction((FunctionIdentifier("graft_mg"),
      info("graft_mg", "graft_mg(item, k) - aggregate: Misra-Gries frequent-items summary"),
      (es: Seq[Expression]) => MgSummaryAgg(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler", "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in ppm"),
      (es: Seq[Expression]) => JaroWinklerExpr(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_swarmax"),
      info("graft_swarmax", "graft_swarmax(a, b) - lane-wise max of 8 byte lanes in a bigint"),
      (es: Seq[Expression]) => SwarByteMaxExpr(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("graft_packmax"),
      info("graft_packmax", "graft_packmax(arr, n) - aggregate: lane-wise max of packed register vectors"),
      (es: Seq[Expression]) => PackedRegMaxAgg(es.head,
        es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((FunctionIdentifier("graft_mgw"),
      info("graft_mgw", "graft_mgw(item, w, k) - aggregate: weighted Misra-Gries summary"),
      (es: Seq[Expression]) => MgWeightedAgg(es.head, es(1),
        es(2).eval().asInstanceOf[Number].intValue())))
  }
}
