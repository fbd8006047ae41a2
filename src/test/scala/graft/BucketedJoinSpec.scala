package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing is the engine's co-location story for repeated big-big
  * joins at 100 TB (SCALE.md §Joins): two tables bucketed the same way
  * on the join key must join WITHOUT a shuffle on either side. This
  * spec pins that property — if a Spark upgrade or a session-conf
  * change silently re-introduces the exchange, the test fails.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("same-bucketed tables join with zero Exchange operators") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val left = (1L to 5000L).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1L to 5000L).filter(_ % 3 == 0).map(k => (k, k * 2)).toDF("k", "rv")

    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    left.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$tmp/a").saveAsTable("graft_bkt_a")
    right.write.bucketBy(8, "k").sortBy("k")
      .option("path", s"$tmp/b").saveAsTable("graft_bkt_b")

    // force the sort-merge path (a broadcast would also be shuffle-free
    // but would not exercise bucket co-location, which is what a
    // big-big join at 100 TB relies on)
    val j = spark.table("graft_bkt_a").hint("merge")
      .join(spark.table("graft_bkt_b"), "k")
    val expected = left.join(right, "k").count()
    assert(j.count() == expected)

    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, plan was:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed SMJ should read co-located buckets with no shuffle, plan was:\n$plan")

    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
  }
}
