package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Physical-plan audit artifact generator (`PLANS_r{N}.md`): dumps the
  * initial (pre-AQE) executed plan of every declared query, condensed to
  * the lines that matter for a scale review — exchanges, joins,
  * aggregates, windows, scans (with pushed filters), generators. Run:
  * `sbt "runMain graft.Plans <sfDir> <outFile>"`.
  */
object Plans {
  private val Keep =
    Seq("Exchange", "HashAggregate", "ObjectHashAggregate", "SortAggregate",
      "FileScan", "Join", "Window", "Expand", "Generate", "Sort ", "Scan ",
      "Union", "LocalLimit", "GlobalLimit", "TakeOrdered", "Project [", "Filter (",
      "WindowGroupLimit", "UnionLoop", "MapPartitions", "SerializeFromObject")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS_r3.md")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE partition headroom: start wide so big-stage aggregates and
      // sorts never funnel millions of keys through one task (the r9
      // 100x probe measured pageRank's edge distinct going 28x super-
      // linear on exactly this cliff: 7.5M keys/partition at width 16
      // spills; width 256 restored ~linear scaling, 420 -> 255 s).
      // AQE coalesces small stages back down to the advisory size, so
      // sf0.001-sized queries pay nothing. A real cluster sizes this
      // to data volume; 8 threads of headroom per core is the local
      // stand-in.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(128, cpus.toInt * 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder(
      s"# Physical plans (initial, pre-AQE) at $sfDir\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n## $name\n\n```\n")
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
        plan.linesIterator
          .filter(l => Keep.exists(l.contains))
          .map(l => if (l.length > 240) l.take(240) else l)
          .foreach(l => sb.append(l.trim.replaceAll("^[:+\\- ]*", "+- ")).append('\n'))
      } catch {
        case e: Exception => sb.append(s"ERROR: ${e.getMessage}\n")
      }
      sb.append("```\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out")
    spark.stop()
  }
}
