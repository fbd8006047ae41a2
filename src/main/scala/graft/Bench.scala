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
    try graft.operators.CacheScope.withScope { SparkEntry.entry(spark).count() }
    catch { case _: Throwable => () }

    // Optional comma-separated name filter for single-query profiling.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // A rep that throws yields None: a query failing every rep reports
      // null in the JSON, never the min of N fast failure times.
      val times = (1 to math.max(1, reps)).map { _ =>
        val t0 = System.nanoTime()
        // CacheScope: operator-internal persists release after each rep,
        // so caches never accumulate across the run (the r3 f-cluster
        // regression was exactly this pressure).
        val ok = try { graft.operators.CacheScope.withScope {
          fn(spark, sfDir).count() }; true }
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
    val full =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$nFailed,"queries":$qs,"sf":"$sfDir"}"""
    println(full)
    // The full line (~3 KB at 86 queries) outgrows the harness's 2000-char
    // output tail, so per-query numbers also go to a FILE, and the very
    // last line is a compact summary that always survives the tail whole.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      graft.queries.Q.repoRoot + "/BENCH_PARSED.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), full + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    val slowest = results.collect { case (k, Some(v)) => (k, v) }
      .sortBy(-_._2).take(5)
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","failed":$nFailed,"sf":"$sfDir","queries_file":"$outPath","slowest":$slowest}""")
    spark.stop()
  }
}
