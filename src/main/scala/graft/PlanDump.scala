package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints a condensed executed plan for every
  * declared query (scan pushdown, broadcast choices, codegen coverage) —
  * evidence that the declarative plans compile to the intended physical
  * strategies, reviewable without running the engine.
  *
  * Usage: runMain graft.PlanDump [sfDir] > PLANS.md
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"# Physical plans (initial, pre-AQE) at $sfDir\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"## $name\n")
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val interesting = plan.linesIterator.filter { l =>
          l.contains("FileScan") || l.contains("Broadcast") ||
          l.contains("Exchange") || l.contains("Join") ||
          l.contains("HashAggregate") || l.contains("Window") ||
          l.contains("Expand") || l.contains("Generate") ||
          l.contains("WholeStageCodegen")
        }.map(_.replaceAll("#\\d+L?", "").trim.take(240))
        println("```")
        interesting.foreach(println)
        println("```\n")
      } catch {
        case e: Exception => println(s"(plan unavailable: ${e.getMessage})\n")
      }
    }
    spark.stop()
  }
}
