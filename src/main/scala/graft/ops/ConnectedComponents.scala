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
          // ONE job per round: the node's previous label rides through
          // the aggregate (self rows carry it, neighbor rows carry null;
          // min ignores nulls and every node has exactly one self row),
          // so the change count is a filter over the same lazily
          // checkpointed frame — its count() both materializes the new
          // labels and decides convergence, with no second join+count.
          val selfRows = lbl.select(col("node"), col("cluster_id"),
            col("cluster_id").as("__old"))
          val fromNeighbors = lbl.join(und, lbl("node") === und("a"))
            .select(und("b").as("node"), lbl("cluster_id"),
              lit(null).cast(lbl.schema("cluster_id").dataType).as("__old"))
          val next = selfRows.unionByName(fromNeighbors)
            .groupBy("node").agg(min("cluster_id").as("cluster_id"),
              min("__old").as("__old"))
            .localCheckpoint(eager = false)
          val changed = next
            .filter(col("cluster_id") =!= col("__old")).count()
          lbl = next.select(col("node"), col("cluster_id"))
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
