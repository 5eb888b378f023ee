package graft

import graft.ops.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("two components, min id labels, multi-hop chains converge") {
    // component {1,2,3,7} via chain 1-2, 2-3, 3-7; component {10,11}
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 7L), (10L, 11L)).toDF("a", "b")
    val out = ConnectedComponents.labels(edges)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("chain fixture: rounds <= ceil(log2 n) + 2, not O(diameter)") {
    // A 512-node chain is the adversarial case for plain min-label
    // propagation (511 rounds); pointer doubling must land it in
    // ceil(log2 512) + 2 = 11 rounds. Structural guard — variance-proof,
    // unlike wall-clock (VERDICT r6 performance notes).
    val n = 512
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")
    // localThreshold = 0: force the DISTRIBUTED path — this guard exists
    // to pin its round count, not the small-graph union-find's
    val (out, rounds) = ConnectedComponents.labelsWithRounds(edges, 50, localThreshold = 0)
    val labels = out.as[(Long, Long)].collect()
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L))
    val bound = (math.log(n) / math.log(2)).ceil.toInt + 2
    assert(rounds <= bound, s"convergence took $rounds rounds > bound $bound")
  }

  test("a clique resolves in few rounds; isolated pair keeps its own min") {
    val clique = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val edges = (clique :+ ((100L, 200L))).toDF("a", "b")
    val out = ConnectedComponents.labels(edges).as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(out(_) == 1L))
    assert(out(100L) == 100L && out(200L) == 100L)
  }
}
