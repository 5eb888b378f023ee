package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFeatures

/** Corpus-level term statistics for training-data curation: TF-IDF
  * top-terms per document and deterministic stratified sampling.
  *
  * Scale shape: both are two-shuffle programs. TF-IDF is
  * (doc, term)-grouped counts joined with a term-grouped document
  * frequency — the term side is vocabulary-sized (≪ corpus at 100 TB)
  * and broadcastable; sampling is one window per stratum.
  */
object TermStats {

  /** Top-`k` TF-IDF terms per document.
    *
    * The idf is the RATIONAL smooth variant `(N+1)/(df+1)` rather than
    * its logarithm — a deliberate, documented variant: one double
    * division is computed identically (IEEE round-to-nearest) by every
    * engine, while `ln` is only guaranteed faithful per math library,
    * so the score stays bit-reproducible in the DuckDB oracle. Note the
    * tf·idf PRODUCT ranking is NOT identical to log-idf TF-IDF (the
    * rational form weights rare terms more aggressively); swap the
    * score expression for `tf * (ln((N+1)/(df+1)) + 1)` when classic
    * ranking matters more than cross-engine bit-equality.
    *
    * Ties rank deterministically by (score desc, term asc).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(TextFeatures.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df = docs containing the term (vocabulary-sized aggregate);
    // n = corpus size. Both tiny relative to the corpus — the join
    // back to tf broadcasts at any realistic vocabulary.
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // row count, NOT distinct-id count: matches the oracle's count(*)
    // exactly (a duplicate-id input is the caller's bug, and silently
    // diverging from the oracle would mask it), and skips a shuffle.
    val n = docs.count()
    val scored = tf.join(broadcast(df_), Seq("term"))
      .withColumn("score",
        (col("tf") * (n + 1)).cast("double") / (col("df") + 1))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term").asc))
        .cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("rnk"), col("score"))
  }

  /** Deterministic stratified head-sample: the first `perStratum` rows
    * of each stratum under (orderHash asc, id asc) — a reproducible
    * stand-in for per-class random sampling (the hash plays the RNG;
    * same data -> same sample on any cluster layout, which is what a
    * training-data pipeline needs for auditable splits).
    *
    * One shuffle on the stratum column; `WindowGroupLimit` pushes the
    * per-partition top-k ahead of the final window at scale.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       orderHash: Column, perStratum: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__h", orderHash)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(stratumCol).orderBy(col("__h").asc, col(idCol).asc))
        .cast("long"))
      .filter(col("rnk") <= perStratum)
      .drop("__h")
  }
}
