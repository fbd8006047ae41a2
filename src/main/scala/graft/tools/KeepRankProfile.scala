package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Graphs, Memo}

/** Throwaway stage-by-stage timer for the dedup_keep_rank composition —
  * attributes the wall clock across pair build, CC, PageRank and the
  * keeper election so a composition blow-up is localizable. */
object KeepRankProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[krp] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    graft.operators.CacheScope.withScope {
      val pairs = time("pairs build+count") {
        val p = Dedup.minhashLsh(Tables.documentsP(spark, d), "doc_id", "text",
          nHash = 12, bandRows = 2, threshold = 0.5,
          memoKey = Some(Memo.corpusKey("mh", d)))
        p.count(); p
      }
      val edges = pairs.select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val pr = time("pageRank build") {
        Graphs.pageRank(edges, "src", "dst", iters = 3, damping = 0.85) }
      time("pageRank count")(pr.count())
      val cc = time("cc build") {
        Dedup.connectedComponents(pairs, "doc_a", "doc_b") }
      time("cc count")(cc.count())
      val prj = cc.join(pr.select(col("node"), col("r")), "node")
      time("prj count")(prj.count())
      val keepers = prj.groupBy("comp")
        .agg(max(struct(col("r"), (-col("node")).as("nid"))).as("m"))
        .select(col("comp"), (-col("m.nid")).as("keep_id"))
      time("keepers count")(keepers.count())
      val fin = prj.join(keepers, "comp")
        .select(col("node").as("doc_id"), col("comp"),
          round(col("r") * lit(1e6), 6).as("rank_ppm"), col("keep_id"),
          (col("node") === col("keep_id")).as("kept"))
        .orderBy("doc_id")
      time("final count")(fin.count())
      time("final count again")(fin.count())
    }
    spark.stop()
  }
}
