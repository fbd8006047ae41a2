package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one or more declared queries (comma-separated names
  * in args(0)) against args(1) sf dir, args(2) reps (default 3) —
  * per-rep CacheScope like Bench, min reported. Used to iterate on a
  * single query's plan without a full bench run. */
object QTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.CacheScope.withScope {
          SparkEntry.queries(n)(spark, sfDir).count()
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $n%-32s min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
