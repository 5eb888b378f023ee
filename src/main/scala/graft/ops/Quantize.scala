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
    *         `v_i ≈ qvec_i / scale`. */
  def int8(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x)))
    val scale = when(maxAbs > 0, lit(127.0) / maxAbs.cast("double"))
      .otherwise(lit(0.0))
    corpus.select(col(idCol), col(vecCol), scale.as("scale"))
      .select(col(idCol),
        transform(col(vecCol), x =>
          when(col("scale") > 0, floor(x.cast("double") * col("scale")))
            .otherwise(lit(0L)).cast("byte")).as("qvec"),
        col("scale"))
  }
}
