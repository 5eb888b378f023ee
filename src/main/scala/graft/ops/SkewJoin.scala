package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 shuffle notes). AQE's
  * skew-join split handles sort-merge skew adaptively, but it cannot
  * help when one side must be replicated (e.g. a hot dimension row
  * joined by a power-law fact key) — salting is the explicit remedy:
  *
  *  - fact side: key → (key, salt = pmod(hash(row-random), S))
  *  - dim side: replicate each row S times, once per salt value
  *
  * The shuffle then spreads each hot key over S reducers. S multiplies
  * the small side's volume — size it to the observed skew factor, not
  * higher. Correctness is unchanged: every fact row meets exactly one
  * replica of its dim row.
  */
object SkewJoin {

  /** Inner equi-join of `facts` (skewed, large) with `dims` (small) on
    * `key`, salted `salt` ways. Deterministic salt derivation
    * (`pmod(hash(fact cols...), salt)`) keeps re-runs reproducible.
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String, salt: Int,
                 saltSource: Seq[Column]): DataFrame = {
    require(salt > 0, "salt count must be positive")
    val saltedFacts = facts.withColumn("__salt", pmod(hash(saltSource: _*), lit(salt)))
    val replicatedDims = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFacts.join(replicatedDims, Seq(key, "__salt")).drop("__salt")
  }
}
