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
      // A rep that throws yields None: a query failing every rep reports
      // null in the JSON, never the min of N fast failure times.
      val times = (1 to math.max(1, reps)).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      name -> times.flatten.minOption
    }
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + f"\":$v%.3f"
      case (k, None) => "\"" + k + "\":null"
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    val nFailed = results.count(_._2.isEmpty)
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$nFailed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
