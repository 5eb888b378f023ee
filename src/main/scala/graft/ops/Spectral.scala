package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Integer-exact power iteration: per-document projection scores onto
  * the corpus's top principal direction (the unnormalized leading
  * eigenvector of the Gram matrix Σ eᵢeᵢᵀ) — the "dominant semantic
  * axis" signal used for embedding whitening, outlier surfacing, and
  * diversity-aware curation.
  *
  * Everything is quantized-integer so the result is bit-identical under
  * any partitioning and reproducible by a SQL oracle:
  *  - embedding elements floor-quantize to longs at scale 10⁶ once;
  *  - v₀ = (10⁶, …, 10⁶); each round computes per-row dots (long — max
  *    |dims·qe·v| ≈ 2.6·10¹⁴) and the weighted column sums
  *    w = Σᵢ dotᵢ·qeᵢ as DECIMAL(38,0) (magnitudes ≈ 10²¹ exceed
  *    longs; decimal sums are exact and match DuckDB HUGEINT);
  *  - v ← (w·10⁶) div max|w|, computed on the DRIVER over exactly
  *    `dims` values (the same bounded-state shape as the k-means
  *    centroid loop) with BigInt division truncating toward zero —
  *    matching DuckDB's `//` on negative operands.
  *
  * Dataflow per round: one pass over the corpus (dot projection +
  * posexplode + map-side-combinable per-dimension sum). Driver state
  * and per-round collect are `dims` values, never row-proportional.
  */
object Spectral {

  val Scale: Long = 1000000L

  /** @return (`idCol`, score): the quantized projection of each row's
    *         embedding onto the final iterate of the power method. */
  def topComponentScores(emb: DataFrame, idCol: String, vecCol: String,
                         iters: Int = 2): DataFrame = {
    require(iters >= 1, "power iteration needs at least one round")
    val qe = emb.select(col(idCol),
        transform(col(vecCol), x => floor(x.cast("double") * Scale).cast("long"))
          .as("__q"))
      .localCheckpoint()
    val firstRow = qe.select(size(col("__q"))).head(1)
    require(firstRow.nonEmpty, "power iteration needs a non-empty corpus")
    val dims = firstRow(0).getInt(0)
    // Per-row dots accumulate in LONG: |dot| ≤ dims·max|q|·max|v| with
    // max|v| = Scale by construction (v is renormalized to max-abs Scale
    // each round). Pin the magnitude precondition with one cheap
    // aggregate instead of silently overflowing into corrupt scores —
    // at dims=64 this admits |element| up to ~1.4·10⁵ pre-quantization,
    // far beyond any normalized embedding.
    val maxAbsQ = qe.agg(max(aggregate(col("__q"), lit(0L),
      (a, x) => greatest(a, abs(x))))).head.getLong(0)
    require(maxAbsQ <= Long.MaxValue / Scale / math.max(dims, 1),
      s"quantized embedding magnitude $maxAbsQ would overflow the " +
        s"long dot product at dims=$dims (max ${Long.MaxValue / Scale / math.max(dims, 1)})")
    def dotWith(vArr: Array[Long]) = {
      val vLit = array(vArr.map(lit(_)): _*)
      aggregate(zip_with(col("__q"), vLit, (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    }
    var v = Array.fill(dims)(Scale)
    (1 to iters).foreach { _ =>
      val dotted = qe.select(col("__q"),
        dotWith(v).cast(DecimalType(38, 0)).as("__dot"))
      // Two physical spellings of the SAME integer sums (identical
      // results — exact decimal arithmetic either way), chosen by dims:
      //
      //  - dims ≤ WideAggLimit: one aggregate COLUMN per dimension over
      //    the un-exploded frame. No explode, one dims-wide partial row
      //    per partition, fully codegen'd. 6.4× faster than the explode
      //    spelling at dims = 64.
      //  - dims > WideAggLimit: posexplode → groupBy(pos). A dims-wide
      //    select crosses spark.sql.codegen.maxFields (100) and kicks
      //    the whole stage out of codegen — measured 7× slower at 256
      //    dims, 28× at 1024. The exploded aggregate keys on (pos) with
      //    map-side combine, so each partition still reduces to `dims`
      //    rows before the exchange; the shuffle is partitions×dims
      //    rows, never rows×dims.
      val w: Array[BigInt] =
        if (dims <= WideAggLimit) {
          val row = dotted.agg(
              sum(col("__dot") * element_at(col("__q"), 1)).as("w0"),
              (1 until dims).map(i =>
                sum(col("__dot") * element_at(col("__q"), i + 1)).as(s"w$i")): _*)
            .head()
          Array.tabulate(dims)(i => BigInt(row.getDecimal(i).toBigInteger))
        } else {
          val rows = dotted.select(col("__dot"), posexplode(col("__q")))
            .groupBy(col("pos"))
            .agg(sum(col("__dot") * col("col")).as("__w"))
            .collect()
          require(rows.length == dims, s"ragged embeddings: got ${rows.length} dims, expected $dims")
          val arr = new Array[BigInt](dims)
          rows.foreach(r => arr(r.getInt(0)) = BigInt(r.getDecimal(1).toBigInteger))
          arr
        }
      val m = w.map(_.abs).max
      require(m > 0, "degenerate corpus: zero Gram matrix")
      // BigInt / truncates toward zero — identical to DuckDB's `//`
      v = Array.tabulate(dims)(i => ((w(i) * Scale) / m).toLong)
    }
    qe.select(col(idCol), dotWith(v).as("score"))
  }

  /** Widest per-dimension aggregate column list that stays inside
    * whole-stage codegen (spark.sql.codegen.maxFields defaults to 100;
    * beyond it the stage silently interprets). */
  val WideAggLimit: Int = 100

  /** X150: embedding anisotropy probe — is the embedding space a
    * narrow cone (Ethayarajh EMNLP'19)? An anisotropic space makes
    * every cosine look high, silently inflating near-dup rates (X5,
    * q120) and deflating retrieval contrast; this one-row diagnostic
    * is the cheap pre-flight check before trusting any cosine
    * threshold. The expected pairwise dot over all ordered pairs has a
    * closed form — no pair sampling, no |docs|² join:
    *
    *   Σ_{i≠j} v_i·v_j  =  ‖Σ_i v‖² − Σ_i ‖v‖²   ( = S − T )
    *
    * so mean_pair_dot = (S−T)/(n(n−1)) and the normalized anisotropy
    * ratio mean_pair_dot / mean_sq_norm collapses (the n's cancel) to
    * (S−T) div ((n−1)·T) — the mean pairwise dot over the mean squared
    * norm, ≈ the mean pairwise cosine for homogeneous norms, in exact
    * ppm (10³-quantized elements, the q125 spelling; sign-split
    * two-step floor division, mirrored in the oracle).
    *
    * Shape: the quantized corpus forks into (a) ONE map-side-
    * combinable scalar fold (count + per-row squared-norm sum) and
    * (b) the per-dimension sum via posexplode + a dims-key aggregate —
    * shuffle volume is partitions·dims, never rows·dims; S is a
    * |dims|-row fold. Driver state: none. Squares run in
    * DECIMAL(38,0): exact while per-dim sums stay below 10¹⁹ —
    * 10 B docs at |v| ≤ 10⁴ quantized.
    *
    * @return one row (n_vecs, dims, mean_pair_dot_q3, anisotropy_ppm)
    */
  def anisotropyPpm(emb: DataFrame, vecCol: String): DataFrame = {
    val qv = emb
      .select(expr(s"transform($vecCol, v -> cast(floor(cast(v as double) * 1000) as bigint))").as("__q"))
      .localCheckpoint(eager = false) // forked: scalar fold + per-dim sums
    val t = qv.agg(count(lit(1)).as("n_vecs"),
      max(size(col("__q"))).cast("long").as("dims"),
      sum(expr("aggregate(__q, cast(0 as bigint), (a, x) -> a + x * x)"))
        .cast("decimal(38,0)").as("__t"))
    val s = qv.select(posexplode(col("__q")).as(Seq("__pos", "__x")))
      .groupBy("__pos").agg(sum(col("__x")).as("__s"))
      .agg(coalesce(sum(expr("cast(__s as decimal(38,0)) * __s")),
        lit(0L).cast("decimal(38,0)")).as("__snorm"))
    t.crossJoin(s)
      .withColumn("__d", col("__snorm") - col("__t"))
      .select(col("n_vecs"), col("dims"),
        when(col("n_vecs") < 2, lit(0L)).otherwise(
          expr("""case when __d >= 0
                 | then __d div (cast(n_vecs as decimal(38,0)) * (n_vecs - 1))
                 | else -((-__d) div (cast(n_vecs as decimal(38,0)) * (n_vecs - 1)))
                 | end""".stripMargin).cast("long")).as("mean_pair_dot_q3"),
        when(col("n_vecs") < 2 || col("__t") === 0, lit(0L)).otherwise(
          expr("""case when __d >= 0
                 | then ((__d * 1000000) div __t) div (n_vecs - 1)
                 | else -((((-__d) * 1000000) div __t) div (n_vecs - 1))
                 | end""".stripMargin).cast("long")).as("anisotropy_ppm"))
  }
}
