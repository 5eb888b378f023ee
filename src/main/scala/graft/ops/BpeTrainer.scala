package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFeatures

/** BPE merge-table training (Sennrich et al. 2016) — the
  * tokenizer-training step of an LLM data pipeline, shaped for Spark's
  * execution model like the k-means loop: the corpus collapses ONCE to
  * its word-frequency vocabulary (pair statistics are weighted by word
  * count, so every later pass runs over |vocab| rows, never corpus
  * rows), each round is one map-side-combinable pair-count aggregate
  * whose argmax comes back via a TakeOrdered limit(1) — the MODEL
  * (merge table) is driver state of `rounds` entries, nothing
  * row-proportional.
  *
  * Determinism (the cross-engine contract): the winning pair breaks
  * frequency ties lexicographically (left asc, right asc), and the
  * merge application is the GREEDY LEFTMOST fold — a left-to-right
  * array fold that joins the current symbol into the previous one
  * whenever they form the winning pair, so "a a a" under merge (a,a)
  * becomes ["aa", "a"], bit-identically in any engine that folds
  * left-to-right (the oracle replays the same fold as a recursive CTE).
  * Symbols start as single characters; non-BMP code points follow the
  * same UTF-16/code-point caveat as frame sampling (ASCII-safe).
  */
object BpeTrainer {

  /** Train `rounds` merges over the corpus's token stream.
    * @return (rnk, left, right, freq): the merge table in training
    *         order — rank r's pair counts are computed AFTER merges
    *         1..r-1 are applied. Stops early (fewer rows) if no pair
    *         remains.
    */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, "BPE training needs at least one round")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val spark = docs.sparkSession
    // the corpus → word-frequency vocabulary collapse: the ONLY
    // corpus-sized pass in the whole training run
    var words = docs
      .select(explode(TextFeatures.tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .select(split(col("__w"), "").as("__syms"), col("__n"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val top = words.filter(size(col("__syms")) >= 2)
        .select(col("__n"), explode(transform(
          sequence(lit(1), size(col("__syms")) - 1),
          i => struct(element_at(col("__syms"), i).as("l"),
            element_at(col("__syms"), i + 1).as("r")))).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("__n")).as("f"))
        .orderBy(col("f").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((round.toLong, l, r, f))
        val merged = l + r
        // greedy leftmost merge as a left-to-right fold: join the
        // current symbol into the accumulator's last element whenever
        // (last, current) is the winning pair
        words = words.select(
            aggregate(col("__syms"),
              array().cast("array<string>"),
              (acc, s) => when(
                size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
                .otherwise(concat(acc, array(s)))).as("__syms"),
            col("__n"))
          // LAZY: the next round's pair count (or the caller's action)
          // materializes the chain; lineage stays one fold per round
          .localCheckpoint(eager = false)
        round += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rnk", "left", "right", "freq")
  }

  /** Apply an ORDERED merge table to the corpus vocabulary — the
    * tokenizer's segmentation step. Each merge replays the same
    * greedy-leftmost fold as training, in training order (BPE's
    * apply-time contract); the whole application is `merges.size`
    * chained codegen-able fold expressions over the |vocab|-sized
    * frame — the corpus itself is touched only by the initial
    * word-count collapse.
    *
    * @return (word, n, n_syms, segmented): per distinct word, its
    *         corpus frequency, symbol count after all merges, and the
    *         space-joined segmentation
    */
  def applyMerges(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val vocab = docs
      .select(explode(TextFeatures.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("word"), col("n"), split(col("word"), "").as("__syms"))
    val segmented = merges.foldLeft(vocab) { case (df, (l, r)) =>
      val m = l + r
      df.withColumn("__syms",
        aggregate(col("__syms"), array().cast("array<string>"),
          (acc, s) => when(
            size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
            .otherwise(concat(acc, array(s)))))
    }
    segmented.select(col("word"), col("n"),
      size(col("__syms")).cast("long").as("n_syms"),
      array_join(col("__syms"), " ").as("segmented"))
  }

  /** X164: tokenizer-fit histogram — how well does a merge table fit
    * THIS corpus: the occurrence-weighted distribution of pieces per
    * word after segmentation. The mean of this histogram is the
    * tokenizer's FERTILITY (pieces per word — the number that sets
    * sequence lengths, packing density and training cost downstream);
    * a heavy tail is the domain-mismatch signal (words the merges
    * never learned shatter into characters). All arithmetic rides
    * [[applyMerges]]' vocabulary-bounded frame — corpus volume was
    * already collapsed to (word, count) before any merge ran.
    *
    * @return (n_pieces, n_types, n_occurrences), one row per distinct
    *         piece count
    */
  def fitHistogram(docs: DataFrame, textCol: String,
                   merges: Seq[(String, String)]): DataFrame =
    applyMerges(docs, textCol, merges)
      .groupBy(col("n_syms").as("n_pieces"))
      .agg(count(lit(1)).as("n_types"), sum(col("n")).as("n_occurrences"))
}
