package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recursive explosion of a weighted adjacency list (the reference's
  * composition-tree use case, `/root/reference/docs/DataModel.md:386-391`:
  * a PostgreSQL recursive CTE over `vw_composicao_itens_unificados`).
  *
  * Spark SQL has no recursive CTE, so this is an iterative BFS of
  * self-joins (SURVEY.md §7.4). Two scale-minded choices:
  *  - **DAG collapse**: after each hop, paths converging on the same
  *    (root, node) are pre-aggregated (`sum` of path products — valid
  *    because multiplication distributes over addition). Path count never
  *    explodes combinatorially, unlike naive path enumeration.
  *  - **Lineage control**: `localCheckpoint` every `checkpointEvery`
  *    levels so the plan doesn't grow unboundedly with depth.
  *
  * Cycle guard: the loop is bounded by `maxDepth`; a non-empty frontier at
  * the bound raises (dangling/cyclic graphs exist in the wild — the
  * reference's own placeholder machinery proves dangling refs happen).
  */
object TreeExplode {

  /** @param edges  DataFrame with columns (parent, child, coeff)
    * @param roots  DataFrame with single column (root)
    * @return (root, node, eff_coeff): every node reachable from each root,
    *         with the summed product of edge coefficients over all paths.
    */
  def explode(edges: DataFrame, roots: DataFrame,
              maxDepth: Int = 32, checkpointEvery: Int = 4): DataFrame = {
    val e = edges.select(col("parent"), col("child"), col("coeff"))
    // At realistic scale the edge table is dimension-sized (10^5-10^6 rows):
    // cache it once; every level joins against it.
    e.cache()
    var frontier = roots.select(col("root")).as("f")
      .join(e.as("e"), col("f.root") === col("e.parent"))
      .select(col("f.root").as("root"), col("e.child").as("node"),
        col("e.coeff").as("eff_coeff"))
      .groupBy("root", "node").agg(sum("eff_coeff").as("eff_coeff"))
    var acc = frontier
    var depth = 1
    var done = frontier.isEmpty
    while (!done && depth < maxDepth) {
      frontier = frontier.as("f")
        .join(e.as("e"), col("f.node") === col("e.parent"))
        .select(col("f.root").as("root"), col("e.child").as("node"),
          (col("f.eff_coeff") * col("e.coeff")).as("eff_coeff"))
        .groupBy("root", "node").agg(sum("eff_coeff").as("eff_coeff"))
      if (depth % checkpointEvery == 0) frontier = frontier.localCheckpoint()
      done = frontier.isEmpty
      if (!done) acc = acc.unionByName(frontier)
      depth += 1
    }
    if (!done && depth >= maxDepth)
      throw new IllegalStateException(
        s"TreeExplode: frontier still non-empty at depth $maxDepth - cycle or overly deep graph")
    acc.groupBy("root", "node").agg(sum("eff_coeff").as("eff_coeff"))
  }
}
