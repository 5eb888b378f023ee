package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding storage quantization — the compression primitive of a
  * 100 TB embedding table: symmetric per-vector int8 (4× smaller than
  * float32 at rest, and the shape ANN engines consume). Pure narrow
  * projection: no shuffle, codegen'd, columnar in and out.
  *
  * Determinism (cross-engine contract): `scale = 127/max|v_i|` is one
  * double division off an exact float max; each code is
  * `floor(v_i · scale)` — same association order in the DuckDB oracle,
  * so codes match bit-for-bit. The floor edge can emit -128 (when
  * `v_i = -max` rounds a hair past -127), which still fits int8; a
  * zero vector gets scale 0 and all-zero codes.
  */
object Quantize {

  /** @return (id, qvec: array<byte>, scale: double) — reconstruct with
    *         `v_i ≈ qvec_i / scale`.
    *
    * The O(dims) scale fold is BOUND AS A LAMBDA VARIABLE (a transform
    * over a one-element array) rather than carried as a projection
    * column: Catalyst's projection collapse and generator/filter
    * pushdown substitute plain column aliases into every use site —
    * which previously inlined the fold into the per-element lambda and
    * into a filter pushed to the scan (O(dims²) interpreted work per
    * row; the r4 q42 plan defect). A LambdaVariable is opaque to
    * expression substitution, so the fold is evaluated once per
    * reference to the packed struct — O(dims) per row under ANY
    * downstream plan rewrite. */
  def int8(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x)))
    val scale = when(maxAbs > 0, lit(127.0) / maxAbs.cast("double"))
      .otherwise(lit(0.0))
    val packed = transform(array(scale), s0 => struct(
      transform(col(vecCol), x =>
        when(s0 > 0, floor(x.cast("double") * s0))
          .otherwise(lit(0L)).cast("byte")).as("qvec"),
      s0.as("scale"))).getItem(0)
    corpus.select(col(idCol),
      packed.getField("qvec").as("qvec"),
      packed.getField("scale").as("scale"))
  }
}
