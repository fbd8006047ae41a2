package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.functions._

/** Stage/job decomposition of `p5_upper_triangle_hier` (the r14 verdict
  * watch item: 1.46→1.59 s sf0.1 / 2.98→3.20 s sf1 across two rounds of
  * recordings on untouched code). Separates the query's one data-
  * proportional stage — the 4-table fact join into the 25-cell exact
  * aggregate — from everything downstream of the 25 rows (rank window,
  * two broadcast joins, pivot), so creep can be attributed to data work
  * vs job-scheduling floor. Not part of the driver contract; run:
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileP5"`. */
object ProfileP5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    import graft.operators.CacheScope
    import graft.Tables

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })

    def run(tag: String)(f: => Unit): Unit = {
      val (j0, s0) = (jobs.get(), stages.get())
      val t0 = System.nanoTime()
      CacheScope.withScope(f)
      println(f"PROF $tag%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
        s"jobs=${jobs.get() - j0} stages=${stages.get() - s0}")
    }

    def reg2(dim: org.apache.spark.sql.DataFrame, key: String, nk: String, out: String) =
      dim.join(Tables.nation(spark, sfDir), col(nk) === col("n_nationkey"))
        .join(Tables.region(spark, sfDir), col("n_regionkey") === col("r_regionkey"))
        .select(col(key), col("r_name").as(out))
    def cells = {
      val creg = reg2(Tables.customer(spark, sfDir), "c_custkey", "c_nationkey", "rc")
      val sreg = reg2(Tables.supplier(spark, sfDir), "s_suppkey", "s_nationkey", "rs")
      Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .join(creg, col("o_custkey") === col("c_custkey"))
        .join(sreg, col("l_suppkey") === col("s_suppkey"))
        .select(col("rc"), col("rs"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)").as("rev4"))
        .groupBy("rc", "rs")
        .agg(sum(col("rev4")).as("s4"), count(lit(1)).as("c"))
    }

    val full = graft.queries.Q.registry.find(_.name == "p5_upper_triangle_hier").get
    val fullStatic = graft.queries.Q.registry.find(_.name == "p5_upper_triangle_matrix").get
    // pipeline_region_cca's data stage alone: segment join + trial agg
    // (the same decomposition discipline — everything past this is
    // 5-row kernel/rollup work)
    val e2e = graft.queries.Q.registry.find(_.name == "pipeline_region_cca").get
    def e2eTrials = {
      val e = Tables.events(spark, sfDir).withColumn(
        "t", (unix_micros(col("ts")) / lit(1000000L)).cast("long"))
      val trg = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("trig_id"), col("user_id"), col("t").as("trig_t"))
      val ser = e.filter(col("event_type") =!= "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("t").as("obs_t"), col("value"))
      graft.operators.RangeJoin
        .segment(trg, ser, Seq("user_id"), "trig_t", "obs_t", 43200L, 28799L)
        .withColumn("rel_bin", floor(col("rel_off") / lit(14400.0)).cast("long"))
        .groupBy("trig_id", "user_id")
        .agg(count(lit(1)).as("n_obs"))
        .filter(col("n_obs") >= 2)
    }
    // ---- r16 fusion experiment: the stable-unit gate (F4) as
    // aggregate+semi-join (the shipped plan: trials persist → per-user
    // count → left-semi back) vs FUSED into one user-partitioned window
    // over the trial frame (one shuffle, no persist, no join). Both end
    // at the region moment aggregate — everything downstream (solve,
    // rollup) is identical 5-row work in either shape.
    def trialsFrame = {
      import graft.functions.Deterministic
      val e = Tables.events(spark, sfDir).withColumn(
        "t", (unix_micros(col("ts")) / lit(1000000L)).cast("long"))
      val trg = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("trig_id"), col("user_id"), col("t").as("trig_t"))
      val ser = e.filter(col("event_type") =!= "purchase" && col("value").isNotNull)
        .select(col("user_id"), col("t").as("obs_t"), col("value"))
      val seg = graft.operators.RangeJoin
        .segment(trg, ser, Seq("user_id"), "trig_t", "obs_t", 43200L, 28799L)
        .withColumn("rel_bin", floor(col("rel_off") / lit(14400.0)).cast("long"))
      def binMean(i: Int) = {
        val v = when(col("rel_bin") === (i - 3), col("value"))
        coalesce(Deterministic.stableSumGuarded(v) / count(v), lit(0.0)).as(s"bb$i")
      }
      seg.groupBy("trig_id", "user_id")
        .agg(count(lit(1)).as("n_obs"), (0 until 5).map(binMean): _*)
        .filter(col("n_obs") >= 2)
    }
    def regDim = Tables.customer(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey").as("user_id"), col("r_name").as("region"))
    def moments(kept: org.apache.spark.sql.DataFrame) = {
      import spark.implicits._
      val magg = udaf(new graft.functions.MomentsAgg(5),
        implicitly[org.apache.spark.sql.Encoder[Seq[Double]]])
      kept.join(regDim, "user_id").groupBy("region")
        .agg(magg(array((0 until 5).map(i => col(s"bb$i")): _*)).as("mm"))
    }
    def gateAggSemi = {
      val trialsP = graft.operators.CacheScope.persist(trialsFrame)
      val stable = trialsP.groupBy("user_id")
        .agg(count(lit(1)).as("nt")).filter(col("nt") >= 3).select("user_id")
      moments(trialsP.join(stable, Seq("user_id"), "left_semi"))
    }
    def gateWindow = {
      import org.apache.spark.sql.expressions.Window
      moments(trialsFrame
        .withColumn("nt", count(lit(1)).over(Window.partitionBy("user_id")))
        .filter(col("nt") >= 3).drop("nt"))
    }

    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      run("fact->cells only") { cells.collect() }
      run("p5h full") { full.build(spark, sfDir).collect() }
      run("p5 static full") { fullStatic.build(spark, sfDir).collect() }
      run("e2e seg+trials") { e2eTrials.collect() }
      run("e2e full") { e2e.build(spark, sfDir).collect() }
      run("gate agg+semi") { gateAggSemi.collect() }
      run("gate window") { gateWindow.collect() }
    }
    spark.stop()
  }
}
