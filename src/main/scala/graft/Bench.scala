package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}. Each query is
  * forced with a count() action (full pipeline execution, no result
  * materialization on the driver).
  *
  * Each query runs SPARK_GRAFT_REPS times (default 3) and reports the
  * MINIMUM, so the numbers measure the plan rather than JVM/codegen
  * warm-up — a cold single shot was observed 2× the warm band.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up on the smallest sf so per-query numbers
    // measure the plan, not first-call compilation.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // Optional comma-separated name filter for single-query profiling.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to math.max(1, reps)).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
