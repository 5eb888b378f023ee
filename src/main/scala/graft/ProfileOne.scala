package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only stage-level profiler: run one named query with the bench
  * session config and print, per completed stage, the wall duration,
  * task count, summed executor run/GC/deserialize time, shuffle bytes
  * and spill — the guide §1/§7.1 task-metrics table without the UI
  * (headless container). Extra `k=v` args after the query name are set
  * as runtime SQL confs before the run, so AQE knob A/Bs need no
  * rebuild.
  *
  * Usage: runMain graft.ProfileOne <queryName> [sfDir] [reps] [k=v ...]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.contains("=")).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).filterNot(_.contains("=")).map(_.toInt).getOrElse(1)
    val confs = args.filter(_.contains("=")).map { a =>
      val i = a.indexOf('='); (a.take(i), a.drop(i + 1))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(128, cpus.toInt * 8))
      // Coalesce post-shuffle stages to the ADVISORY SIZE, not to the
      // core count (guide §2.2: size partitions to data, not cores):
      // with the default parallelismFirst=true a KB-sized stage still
      // runs `defaultParallelism` tasks, and at local[32] the per-task
      // scheduling overhead (single-threaded DAGScheduler event loop)
      // dominates small queries — measured on a 45-query sf0.1 slice:
      // 79.2 s → 64.9 s best-of-2 (single-pass 182 → 121 s). At 100 TB
      // the same setting yields the same wide stages as before, because
      // data volume, not core count, then drives the width.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      // ...with the advisory size PARAMETERISED and a local default that
      // keeps CPU-dense stages parallel: coalescing is size-based, but a
      // stage can be compute-bound on few bytes (q97's in-core triangle
      // intersections: 5.8 MB shuffle, ~7 s CPU — 64 MB advisory funnels
      // it into ONE task). 2 MB at sf0.1 (~100 MB inputs) is the same
      // partitions-per-input ratio a 64-256 MB advisory gives cluster
      // inputs; production sets SPARK_GRAFT_ADVISORY_PART accordingly.
      // Measured (best-of-2, sf0.1, 32c): CPU-dense 12-query slice
      // 75.4 s @64m -> 47.7 s @2m; scheduling-bound 45-query slice
      // 79.2 s (parallelismFirst=true) -> 59.2 s.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PART", "2m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "30s")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }

    final case class St(var wallMs: Long = 0, var tasks: Int = 0,
                        var runMs: Long = 0, var gcMs: Long = 0,
                        var deserMs: Long = 0, var resSerMs: Long = 0,
                        var shRead: Long = 0, var shWrite: Long = 0,
                        var spill: Long = 0, var nameHint: String = "")
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val s = stages.getOrElseUpdate(t.stageId, St())
        val m = t.taskMetrics
        if (m != null) {
          s.tasks += 1
          s.runMs += m.executorRunTime
          s.gcMs += m.jvmGCTime
          s.deserMs += m.executorDeserializeTime
          s.resSerMs += m.resultSerializationTime
          s.shRead += m.shuffleReadMetrics.totalBytesRead
          s.shWrite += m.shuffleWriteMetrics.bytesWritten
          s.spill += m.diskBytesSpilled + m.memoryBytesSpilled
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
        val i = e.stageInfo
        val s = stages.getOrElseUpdate(i.stageId, St())
        s.wallMs = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
        s.nameHint = i.name.takeWhile(_ != '\n').take(60)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      ExtensionQueries.clearMemos()
      listener.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted async; let the bus drain
      Thread.sleep(500)
      val snap = listener.synchronized(stages.toSeq.sortBy(_._1))
      println(f"[profile] $name rep $i: $wall%.2f s, $n rows, ${snap.size} stages, " +
        f"sum(stageWall)=${snap.map(_._2.wallMs).sum / 1e3}%.2f s")
      println(f"${"stage"}%6s ${"wall_s"}%8s ${"tasks"}%6s ${"run_s"}%8s ${"gc_s"}%7s " +
        f"${"deser_s"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"spill_MB"}%9s  name")
      snap.foreach { case (id, s) =>
        println(f"$id%6d ${s.wallMs / 1e3}%8.2f ${s.tasks}%6d ${s.runMs / 1e3}%8.2f " +
          f"${s.gcMs / 1e3}%7.2f ${s.deserMs / 1e3}%8.2f ${s.shRead / 1e6}%8.1f " +
          f"${s.shWrite / 1e6}%8.1f ${s.spill / 1e6}%9.1f  ${s.nameHint}")
      }
    }
    spark.stop()
  }
}
