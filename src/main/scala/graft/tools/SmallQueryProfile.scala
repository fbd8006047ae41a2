package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}
import graft.operators.CacheScope

/** Profiler for the r8 "sub-0.3 s uniform creep" adjudication: shared
  * small queries drifted +~0.05 s each between the r6 (107-query) and
  * r8 (152-query) idle closing artifacts. Is that per-query FIXED
  * overhead that grows with session age / registry size (codegen cache
  * eviction, listener state, plan-cache churn), or did the plans
  * themselves get slower?
  *
  * Method: run the same small-query set twice in separate JVMs —
  * (a) a session whose history is ONLY those queries, and (b) a
  * session that first executed the ENTIRE registry once (the closing
  * bench's state when a small query's timed rep runs). For each timed
  * rep a listener splits wall-clock into executor task time (the plan)
  * and everything else (driver: analysis, optimization, codegen,
  * scheduling). If the b−a delta sits in the non-task component, the
  * creep is session aging, not plans.
  *
  * Usage: runMain graft.tools.SmallQueryProfile <warm:small|full> <name,name,...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1). Prints one JSON line per
  * query: min wall, min task-sum, jobs/stages/tasks per rep.
  */
object SmallQueryProfile {

  private class Acc extends SparkListener {
    @volatile var taskNanos = 0L
    @volatile var tasks = 0
    @volatile var jobs = 0
    @volatile var stages = 0
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      if (t.taskMetrics != null) {
        taskNanos += t.taskMetrics.executorRunTime * 1000000L
        tasks += 1
      }
    }
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized { jobs += 1 }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized { stages += 1 }
    def reset(): Unit = synchronized { taskNanos = 0L; tasks = 0; jobs = 0; stages = 0 }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SmallQueryProfile <warm:small|full> <name,...>")
    val warmFull = args(0) == "full"
    val names = args(1).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-profile"), "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reg = SparkEntry.queries
    val warmSet = if (warmFull) reg.toSeq.sortBy(_._1) else
      names.map(n => n -> reg(n))
    warmSet.foreach { case (_, fn) =>
      try CacheScope.withScope { fn(spark, sfDir).count() }
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    val out = names.map { n =>
      val fn = reg(n)
      val samples = (1 to reps).map { _ =>
        acc.reset()
        val t0 = System.nanoTime()
        CacheScope.withScope { fn(spark, sfDir).count() }
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async; a short quiesce (outside the timed
        // window) keeps task sums whole. Private waitUntilEmpty is
        // off-limits; 150 ms covers local-mode drain.
        Thread.sleep(150L)
        (wall, acc.taskNanos / 1e9, acc.jobs, acc.stages, acc.tasks)
      }
      val best = samples.minBy(_._1)
      f"""{"query":"$n","warm":"${args(0)}","wall_min":${best._1}%.3f,"task_sum_sec":${best._2}%.3f,"jobs":${best._3},"stages":${best._4},"tasks":${best._5}}"""
    }
    out.foreach(println)
    spark.stop()
  }
}
