package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFeatures._

/** Benchmark decontamination — the overlap check a pretraining pipeline
  * runs before any evaluation claim: which training documents contain
  * n-grams from the held-out / benchmark set? (The GPT-3 appendix-C /
  * Llama "13-gram decontamination" recipe, re-expressed as a Spark
  * program.)
  *
  * Scale shape: the eval side of a decontamination run is tiny relative
  * to the corpus (benchmarks are thousands of documents; the corpus is
  * the 100 TB side), so its distinct n-gram hash set is BROADCAST and
  * the corpus is scanned exactly once — explode n-grams, hash-probe the
  * broadcast set, aggregate per document. No shuffle touches corpus
  * text; the only exchange is the per-doc count aggregation on the
  * fixed-width doc id, with map-side partial aggregation.
  */
object Contamination {

  /** Per-corpus-document overlap against `evalSet`'s n-gram set.
    *
    * N-grams are compared as their polynomial hashes (fixed-width probe
    * key; a collision flags an extra hit on both engines identically —
    * the standard hashed-shingling approximation, same as the dedup
    * family). Documents with fewer than `n` tokens have no n-grams and
    * are absent from the output, mirroring the shingle guard.
    *
    * @return (doc_id, n_ngrams, n_hits, contaminated): distinct n-gram
    *         count, how many of those appear anywhere in the eval set,
    *         and the 0/1 flag (any hit ⇒ contaminated).
    */
  /** Embedding-space decontamination — the semantic complement of
    * [[ngramOverlap]]: a paraphrased benchmark question shares no
    * 13-gram with its source but sits next to it in embedding space.
    * Same scale shape as the n-gram path: the eval side is broadcast,
    * the corpus embedding column is scanned exactly once, and the only
    * shuffle is the per-doc argmax aggregation on the fixed-width id.
    *
    * @return (`idCol`, near_seed, cosine, contaminated): each corpus
    *         doc's closest eval seed (ties → lower seed id), the cosine,
    *         and the 0/1 flag (cosine ≥ threshold).
    */
  def semanticOverlap(corpus: DataFrame, evalSet: DataFrame,
                      idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol), col(vecCol).as("__cv"))
    val s = evalSet.select(col(idCol).as("near_seed"), col(vecCol).as("__sv"))
    // Partial-aggregable argmax: MIN over the struct (−cosine, seed)
    // picks the highest cosine with ties to the lower seed id — the
    // exact total order of the oracle's ROW_NUMBER (cosine DESC,
    // near_seed ASC) — but as a declarative aggregate, so map-side
    // combining reduces each partition to |corpus| rows BEFORE the
    // exchange. The window spelling this replaces shuffled the whole
    // |corpus|·|eval| cross product into the partitioner.
    // NULL-cosine guard: a zero-norm vector makes cosine NULL, and a
    // bare struct-min would sort that NULL FIRST (asc-nulls-first) —
    // inverting the window/oracle's desc-NULLS-LAST. Coalescing the
    // sort key to +MaxValue keeps degenerate seeds from ever winning
    // while all-NULL rows still resolve to the lowest seed id, exactly
    // as ROW_NUMBER(cosine DESC, near_seed ASC) does.
    c.crossJoin(broadcast(s))
      .withColumn("cosine", Similarity.cosine(col("__cv"), col("__sv")))
      .groupBy(col(idCol))
      .agg(min(struct(coalesce(-col("cosine"), lit(Double.MaxValue)).as("__nc"),
        col("near_seed"), col("cosine"))).as("__m"))
      .select(col(idCol), col("__m.near_seed").as("near_seed"),
        col("__m.cosine").as("cosine"),
        (col("__m.cosine") >= threshold).cast("long").as("contaminated"))
  }

  def ngramOverlap(corpus: DataFrame, evalSet: DataFrame,
                   idCol: String, textCol: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def grams(df: DataFrame): DataFrame = df.select(
      col(idCol).as("doc_id"),
      explode(array_distinct(transform(
        shingles(tokens(col(textCol)), n), s => charHash(s)))).as("__g"))
    val evalGrams = grams(evalSet).select(col("__g")).distinct()
      .withColumn("__hit", lit(1L))
    grams(corpus)
      .join(broadcast(evalGrams), Seq("__g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
      .withColumn("contaminated", (col("n_hits") > 0).cast("long"))
  }
}
