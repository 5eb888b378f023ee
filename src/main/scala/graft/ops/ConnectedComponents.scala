package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * finishing step of large-scale dedup (near-dup PAIRS → duplicate
  * GROUPS, keep one representative per component).
  *
  * Each node starts labeled with itself; every round each node takes the
  * minimum label among itself and its neighbors; fixpoint after
  * O(component diameter) rounds — for dedup graphs (near-cliques) a
  * handful. Same engineering as [[TreeExplode]]: every round is
  * localCheckpoint'ed (computed once, bounded lineage) and constraint
  * propagation is disabled around the loop (Catalyst Union rewrite bug
  * with checkpointed branches).
  */
object ConnectedComponents {

  /** @param edges undirected edges as columns (a, b)
    * @return (node, cluster_id) where cluster_id = min node id reachable
    */
  def labels(edges: DataFrame, maxIters: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    val cpKey = "spark.sql.constraintPropagation.enabled"
    val cpOld = spark.conf.getOption(cpKey)
    spark.conf.set(cpKey, "false")
    try {
      val und = edges.select(col("a"), col("b"))
        .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
        .distinct()
      und.cache()
      try {
        var lbl = und.select(col("a").as("node")).distinct()
          .select(col("node"), col("node").as("cluster_id"))
          .localCheckpoint()
        var converged = false
        var it = 0
        while (!converged && it < maxIters) {
          val fromNeighbors = lbl.join(und, lbl("node") === und("a"))
            .select(und("b").as("node"), lbl("cluster_id"))
          val next = lbl.unionByName(fromNeighbors)
            .groupBy("node").agg(min("cluster_id").as("cluster_id"))
            .localCheckpoint()
          val changed = next.as("n")
            .join(lbl.as("o"), col("n.node") === col("o.node"))
            .filter(col("n.cluster_id") =!= col("o.cluster_id"))
            .count()
          lbl = next
          converged = changed == 0
          it += 1
        }
        if (!converged)
          throw new IllegalStateException(
            s"ConnectedComponents: no fixpoint after $maxIters rounds")
        lbl
      } finally und.unpersist()
    } finally cpOld match {
      case Some(v) => spark.conf.set(cpKey, v)
      case None    => spark.conf.unset(cpKey)
    }
  }
}
