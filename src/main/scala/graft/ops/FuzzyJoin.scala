package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFeatures

/** X65: edit-distance similarity self-join — the fuzzy-key matcher a
  * catalog pipeline needs when the same item arrives under slightly
  * different descriptions (typos, truncations, OCR noise). The
  * reference's catalog is keyed on exact `codigo`s (processor.py's
  * drop_duplicates), so near-key reconciliation is beyond-reference;
  * at training-data scale the same operator is the URL/title/near-key
  * variant of the dedup family.
  *
  * Algorithm: positional q-gram prefix filtering in the Ed-Join family
  * (Gravano et al. VLDB'01 count bound; Xiao et al. VLDB'08 prefix
  * principle), then an exact `levenshtein` confirm:
  *
  *  1. every string's DISTINCT q-gram hashes, plus each gram's global
  *     document frequency (one vocab-bounded aggregate);
  *  2. each string keeps only its (d·q + 1) RAREST grams under the
  *     total order (df ASC, gram ASC) — its prefix signature. One edit
  *     destroys at most q distinct grams, so two strings within
  *     distance d lose at most d·q set elements each; by the prefix
  *     principle their (d·q+1)-prefixes under any shared total order
  *     must intersect — the signature join is LOSSLESS;
  *  3. candidate pairs = prefix-gram equi-join with the length filter
  *     |len_a − len_b| ≤ d (a deletion/insertion changes length by 1);
  *  4. exact confirm: join texts back by id, keep levenshtein ≤ d.
  *
  * Scale shape: the only joins are equi-joins on fixed-width gram
  * hashes and ids; candidate volume is Σ df² over PREFIX grams only —
  * the d·q+1 rarest per string — not over the full gram vocabulary
  * (the df-ordering concentrates the join on the sparse tail). Text
  * rides only through the final bounded confirm join. No cross join,
  * no window over more than |grams-per-string| rows.
  */
object FuzzyJoin {

  /** Hashes of all q-length substrings of `s` (1-based positions). */
  private[ops] def gramHashes(s: Column, q: Int): Column =
    transform(sequence(lit(1), greatest(length(s) - (q - 1), lit(0))),
      i => TextFeatures.charHash(s.substr(i, lit(q))))

  /** All pairs (id_a < id_b) within `maxDist` edits, with the distance.
    *
    * Strings shorter than `minLen` are dropped (mirrored by oracles):
    * the count bound minLen − q + 1 − maxDist·q must stay ≥ 1 for the
    * gram signature to be guaranteed non-trivial.
    *
    * @return (id_a, id_b, dist)
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int, q: Int = 2, minLen: Int = 12): DataFrame = {
    require(maxDist >= 1, "editDistanceJoin needs maxDist >= 1")
    require(q >= 2, "editDistanceJoin needs q >= 2")
    require(minLen - q + 1 - maxDist * q >= 1,
      s"count bound (minLen-q+1-maxDist*q) must be >= 1; got " +
        s"${minLen - q + 1 - maxDist * q} for minLen=$minLen q=$q maxDist=$maxDist")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val prefixLen = maxDist * q + 1

    val s = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(length(col("s")) >= minLen)
    val grams = s
      .select(col("id"), length(col("s")).as("len"),
        explode(gramHashes(col("s"), q)).as("g"))
      .distinct()
    // Global gram rarity — the shared total order the prefix principle
    // needs. Vocab-bounded aggregate; the join back is left to AQE.
    val gramDf = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val prefix = grams.join(gramDf, "g")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df").asc, col("g").asc)))
      .filter(col("__rn") <= prefixLen)
      .select(col("id"), col("len"), col("g"))

    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    cand
      .join(s.select(col("id").as("id_a"), col("s").as("__sa")), Seq("id_a"))
      .join(s.select(col("id").as("id_b"), col("s").as("__sb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** X94: sorted-neighborhood candidate pairs (Hernández & Stolfo
    * SIGMOD'95) — the third blocking strategy next to equality blocking
    * (X81) and signature joins (X65/PPJoin): sort the corpus by a
    * domain sort key and pair every record with its `winSize` nearest
    * neighbors in that order. Catches near-dups that share a PREFIX
    * region of the key but no exact block value — and its candidate
    * count is exactly ≤ n·winSize by construction, the hardest
    * guarantee of the three.
    *
    * The global rank is the classic sorted-neighborhood scaling trap —
    * a bare `Window.orderBy` funnels the corpus through one task. Here
    * it is [[Packing]]'s two-pass distributed prefix COUNT over the
    * (sortKey, id) struct order: range partition + per-partition
    * window + broadcast offsets, bounded driver state (plan-guarded —
    * no single-partition window). Pairing is then a block-banded
    * equi-join: rank-block b joins {b, b+1} with the 0 < gap ≤ winSize
    * residual — each row shuffles twice, output n·winSize.
    *
    * Ties in `sortKey` order deterministically by `idCol` (the struct
    * ordering), so the neighborhood — hence the result — is
    * layout-independent for any (sortKey, id)-unique input.
    *
    * @return (id_a, id_b, gap): gap = rank distance in [1, winSize]
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String,
                              sortKey: Column, winSize: Int): DataFrame = {
    require(winSize >= 1, s"winSize must be >= 1: $winSize")
    val keyed = df.select(
      struct(sortKey.as("k"), col(idCol).as("i")).as("__sk"),
      lit(1L).as("__one"))
    val ranked = Packing.runningTotalsMulti(keyed, "__sk", Seq("__one"))
      .select(col("__id").getField("i").as("id"),
        col("__one_cum").as("rnk"))
      .localCheckpoint(eager = false) // forked: both sides of the band join
    val b = ranked.select(col("id").as("id_b"), col("rnk").as("rb"),
      expr(s"rnk div ${winSize}L").as("__blk"))
    ranked
      .select(col("id").as("id_a"), col("rnk").as("ra"),
        explode(array(expr(s"rnk div ${winSize}L"),
          expr(s"rnk div ${winSize}L") + 1L)).as("__blk"))
      .join(b, Seq("__blk"))
      .filter(col("rb") > col("ra") && col("rb") <= col("ra") + winSize)
      .select(col("id_a"), col("id_b"), (col("rb") - col("ra")).as("gap"))
  }
}
