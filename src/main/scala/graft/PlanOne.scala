package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print `explain("formatted")` for the named queries — the
  * before/after plan evidence `plans/r10/` captures for every query an
  * optimization round touches.
  *
  * Usage: runMain graft.PlanOne <q1,q2,...> [sfDir]
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq.filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(128, cpus.toInt * 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n (initial plan, pre-AQE, at $sfDir)")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
