package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale stress for the two iterative operators (VERDICT r6
  * task 8): synthesizes worst-case graphs far larger than sf0.1's and
  * reports the two numbers that matter for 100 TB viability — driver
  * round-trips (the structural cost) and wall seconds (the local one).
  *
  *  - ConnectedComponents on a CHAIN of n nodes — the pathological
  *    diameter-n case. Hop-only label propagation needs n rounds;
  *    hop+pointer-doubling must stay ≤ ⌈log₂ n⌉ + c as n grows 100×.
  *  - TreeExplode on a forest of k independent chains of depth d —
  *    holds depth (round count) fixed while scaling per-level volume.
  *
  * Synthetic `spark.range` inputs only (no testdata writes); results are
  * recorded in BASELINE.md, clearly marked self-measured.
  *
  * Usage: runMain graft.StressScale [maxChainExp]
  */
object StressScale {
  def main(args: Array[String]): Unit = {
    val maxExp = if (args.nonEmpty) args(0).toInt else 6 // up to 10^6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    (4 to maxExp).foreach { exp =>
      val n = math.pow(10, exp).toLong
      val chain = spark.range(n - 1).select(col("id").as("a"), (col("id") + 1).as("b"))
      val t0 = System.nanoTime()
      val (lbl, rounds) = ops.ConnectedComponents.labelsWithRounds(chain, maxIters = 64)
      val nodes = lbl.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val bound = (math.log(n.toDouble) / math.log(2)).ceil.toInt + 2
      println(f"[stress] cc_chain n=$n nodes=$nodes rounds=$rounds (log2-bound $bound) $secs%.1f s")
    }

    // 100k chains × depth 20: 2M (root,node) path rows, depth fixed.
    val k = 100000L
    val d = 20
    val edges = spark.range(k * (d - 1)).select(
      col("id").as("parent"), (col("id") + k).as("child"), lit(1.0).as("coeff"))
    val roots = spark.range(k).select(col("id").as("root"))
    val t0 = System.nanoTime()
    val (paths, rounds) = ops.TreeExplode.explodeWithRounds(edges, roots, maxDepth = 32)
    val rows = paths.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[stress] tree_forest k=$k depth=$d rows=$rows rounds=$rounds $secs%.1f s")
    spark.stop()
  }
}
