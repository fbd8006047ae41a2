package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.operators.{CacheScope, Graphs}

/** Dev probe for the reliable-checkpoint IO claim (Graphs.ckpt scaladoc:
  * "results identical either way; only fault tolerance and checkpoint IO
  * differ"): runs pageRank and labelPropagation over the co-purchase
  * graph in BOTH checkpoint modes — default `localCheckpoint` (executor
  * block storage) vs reliable `checkpoint()` against a directory — and
  * prints min/median wall-clock per mode. Row-identity is spec-proven
  * (LibraryOpsSpec "identical results under reliable checkpointing");
  * this measures the other half of the claim. Memoization is OFF
  * (memoKey = None) so every rep pays the full iterative chain.
  * Usage: runMain graft.tools.ProfileCkpt [sfDir] [ckptDir]
  */
object ProfileCkpt {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ckptDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-ckpt-prof").toString
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-profile-ckpt"),
      "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    def run(tag: String, dir: Option[String])(body: Option[String] => Long): Unit = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        CacheScope.withScope(body(dir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"op":"$tag","min":${times.min}%.3f,"median":${med(times)}%.3f}""")
    }
    val edges = graft.queries.QScale.copurchaseEdges(spark, sfDir)
    for (mode <- Seq(None, Some(ckptDir))) {
      val tag = if (mode.isEmpty) "local" else "reliable"
      run(s"pageRank/$tag", mode)(d =>
        Graphs.pageRank(edges, "src", "dst", iters = 3, checkpointDir = d).count())
      run(s"lpa/$tag", mode)(d =>
        Graphs.labelPropagation(edges, "src", "dst", iters = 3,
          checkpointDir = d).count())
    }
    spark.stop()
  }
}
