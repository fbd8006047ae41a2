package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.{CacheScope, Dedup}

/** Stage-split profiler for the sf1 dedup tail (r13): with the shared
  * signature tables memoized, the five text-shingling queries' WARM
  * cost moved from the tokenize stage to the candidate-join/verify
  * stages — this main measures each stage in isolation so optimization
  * lands where the seconds actually are. Reads SPARK_GRAFT_SF_DIR.
  */
object ProfileDedup {

  private def time(tag: String)(action: => Long): Unit = {
    val samples = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = CacheScope.withScope(action)
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val best = samples.minBy(_._1)
    println(f"""{"stage":"$tag","sec":${best._1}%.3f,"rows":${best._2}}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]").appName("graft-profile-dedup"),
      "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- simhash chain -------------------------------------------------
    val docs = Tables.documents(spark, sfDir)
    val sh = Dedup.simhashSigTable(docs, "doc_id", "text",
      memoKey = Some(graft.operators.Memo.corpusKey("sh", sfDir)))
    sh.count() // memo-warm baseline
    time("simhash/signatures(memo-warm)")(sh.count())
    time("simhash/candidates")(
      Dedup.simhashCandidates(docs, "doc_id", "text",
        sigTable = Some(sh)).count())
    time("simhash/full")(
      Dedup.simhash(docs, "doc_id", "text", maxHamming = 2,
        sigTable = Some(sh)).count())

    // --- ngram containment chain --------------------------------------
    val docsP = Tables.documentsP(spark, sfDir)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val st = Dedup.minhashSigTable(docsP, "doc_id", "text",
      carry = Seq("lang", "source", "n_tok"), ngram = 3, nHash = 12,
      memoKey = Some(graft.operators.Memo.corpusKey("tok", sfDir)))
    st.count()
    time("ngram/sigTable(memo-warm)")(st.count())
    val baseC = st.select(col("doc_id"), col("lang"),
      size(col("s")).cast("long").as("n"), explode(col("s")).as("sh"))
    time("ngram/explodedIndex")(baseC.count())
    time("containment/candidates")(
      Dedup.ngramJaccardCandidates(docsP, "doc_id", "text", Seq("lang"),
        sigTable = Some(st)).count())
    time("containment/full")(
      Dedup.ngramContainment(docsP, "doc_id", "text", Seq("lang"),
        threshold = 0.8, sigTable = Some(st)).count())
    val stJ = st.withColumn("lb", col("n_tok").divide(lit(40)).cast("long"))
    time("jaccard/candidates")(
      Dedup.ngramJaccardCandidates(docsP, "doc_id", "text", Seq("lang", "lb"),
        sigTable = Some(stJ)).count())
    time("jaccard/full")(
      Dedup.ngramJaccard(docsP, "doc_id", "text", Seq("lang", "lb"),
        threshold = 0.8, sigTable = Some(stJ)).count())

    // --- embedding near-dup ---------------------------------------------
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
    val nv = Tables.rowCount(spark, sfDir, "embeddings")
    time("embedding/candidates")(
      Dedup.embeddingNearDupCandidates(e, "vec_id", "v", Seq("label"),
        numVectors = Some(nv)).count())
    time("embedding/full")(
      Dedup.embeddingNearDup(e, "vec_id", "v", Seq("label"),
        threshold = 0.35, numVectors = Some(nv)).count())

    // --- incremental minhash ------------------------------------------
    val stInc = st.withColumn("is_new",
      col("source").isin("src0", "src1", "src2", "src3"))
    time("incremental/candidates")(
      Dedup.minhashLshIncrementalCandidates(docsP, "doc_id", "text", "is_new",
        sigTable = Some(stInc)).count())
    time("incremental/distinct")(
      Dedup.minhashLshIncrementalCandidates(docsP, "doc_id", "text", "is_new",
        sigTable = Some(stInc)).distinct().count())
    time("incremental/verify_a")(
      Dedup.minhashLshIncrementalCandidates(docsP, "doc_id", "text", "is_new",
        sigTable = Some(stInc)).distinct()
        .join(stInc.filter(col("is_new"))
          .select(col("doc_id").as("doc_new"), col("s").as("s_a")), "doc_new")
        .count())
    time("incremental/full")(
      Dedup.minhashLshIncremental(docsP, "doc_id", "text", "is_new",
        sigTable = Some(stInc)).count())

    // --- substring runs (r14 tail split) --------------------------------
    // stage 1: the row-local k-gram first-position pass alone
    val occ = docs
      .select(col("doc_id"), explode(expr("graft_kgram_first_pos(text, 6)")).as("z"))
      .select(col("doc_id"), col("z.g").as("g"), col("z.i").as("i"))
    time("substr/kgrams")(occ.count())
    // stage 2: + the df window gate (the corpus-wide gram shuffle)
    time("substr/dfgate")(occ
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(col("df").between(2L, 20L)).count())
    // stage 3: + the inverted-index self-join (candidate volume)
    time("substr/candidates")(
      Dedup.substringRunCandidates(docs, "doc_id", "text").count())
    // stage 4: + the (pair, diagonal) island window and run aggregation
    time("substr/full")(
      Dedup.substringRuns(docs, "doc_id", "text").count())

    spark.stop()
  }
}
