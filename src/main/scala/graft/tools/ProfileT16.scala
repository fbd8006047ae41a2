package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.functions._

/** Stage/job accounting for the distributed-rank diagnostics
  * (t16_psi_event_type / t17_winsorize): times the full operators at
  * the bench scale and counts the Spark jobs + stages each evaluation
  * schedules — the evidence behind the scaladoc adjudication that
  * their toy-scale cost is per-job scheduling floor, not wasted data
  * work. Not part of the driver contract; run manually:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileT16"`. */
object ProfileT16 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    import graft.operators.CacheScope

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })

    val ev = graft.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull).select(col("event_type"), col("value"))
    println(s"PROF events rows: ${ev.count()}")

    def run(tag: String)(f: => Unit): Unit = {
      val (j0, s0) = (jobs.get(), stages.get())
      val t0 = System.nanoTime()
      CacheScope.withScope(f)
      println(f"PROF $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
        s"jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      run("t16 psiDrift") {
        graft.operators.Diagnostics.psiDrift(ev, "event_type", "value",
          col("event_type") === "view", bins = 10)
          .orderBy("event_type").collect()
      }
      run("t17 quantiles") {
        graft.operators.Diagnostics.groupQuantilesByRank(ev, "event_type",
          "value", Seq("p05" -> 0.05, "p95" -> 0.95)).collect()
      }
    }
    spark.stop()
  }
}
