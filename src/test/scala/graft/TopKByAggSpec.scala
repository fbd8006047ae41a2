package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TopKByAgg, TopKKeysAgg, TopKRow}

/** Contract tests for the bounded-state top-k aggregate that replaces
  * `row_number() OVER (...) <= k` windows on corpus-scaling partitions:
  * equivalence with the window formulation on seeded random data
  * (including heavy value ties, which exercise the tie-break keys) and
  * bit-identity across partition layouts.
  */
class TopKByAggSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  private def topkDf(rows: Seq[(Int, Double, Long, Long)], k: Int, partitions: Int) = {
    import spark.implicits._
    val topk = udaf(new TopKByAgg(k),
      org.apache.spark.sql.Encoders.product[TopKRow])
    rows.toDF("g", "v", "k1", "k2").repartition(partitions)
      .groupBy("g").agg(topk(col("v"), col("k1"), col("k2")).as("top"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
  }

  private def windowTopK(rows: Seq[(Int, Double, Long, Long)], k: Int) = {
    import spark.implicits._
    val w = Window.partitionBy("g")
      .orderBy(col("v").desc, col("k1"), col("k2"))
    rows.toDF("g", "v", "k1", "k2")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .orderBy("g", "rk")
      .as[(Int, Double, Long, Long, Int)].collect()
      .groupBy(_._1).map { case (g, rs) => g -> rs.sortBy(_._5).map(_._2).toSeq }
      .toSeq.sortBy(_._1)
  }

  test("matches the row_number window formulation, with ties") {
    val rnd = new scala.util.Random(23L)
    // values drawn from a small set → many exact ties, tie-break decides
    val rows = Seq.tabulate(400)(i =>
      (rnd.nextInt(3), rnd.nextInt(12).toDouble, rnd.nextInt(50).toLong, i.toLong))
    for (k <- Seq(1, 3, 7)) {
      assert(topkDf(rows, k, 5) == windowTopK(rows, k), s"k=$k diverged")
    }
  }

  test("TopKKeysAgg sampling matches the windowed hrand selection exactly") {
    import spark.implicits._
    import graft.functions.Deterministic.hrand
    val rows = (1L to 500L).map(id => ((id % 7).toInt, id))
    val df = rows.toDF("g", "id").repartition(9)
    // window formulation (what the oracle replays)
    val w = Window.partitionBy("g").orderBy(col("hr"), col("id"))
    val want = df.withColumn("hr", hrand(col("id"), 777L))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("g", "id").as[(Int, Long)].collect().toSet
    // bounded-state formulation: rank by -hrand, keys out
    val sample = udaf(new TopKKeysAgg(5),
      org.apache.spark.sql.Encoders.product[TopKRow])
    val got = df.groupBy("g")
      .agg(sample(-hrand(col("id"), 777L).cast("double"), col("id"), lit(0L)).as("ks"))
      .select(col("g"), explode(col("ks")).as("id"))
      .as[(Int, Long)].collect().toSet
    assert(got == want)
    intercept[IllegalArgumentException](new TopKKeysAgg(0))
  }

  test("bit-identical across partition layouts; short groups return all rows") {
    val rnd = new scala.util.Random(31L)
    val rows = Seq.tabulate(100)(i =>
      (if (i < 98) 0 else 1, rnd.nextDouble() * 1e6, i.toLong, 0L)) // group 1 has 2 rows
    val base = topkDf(rows, 3, 1)
    assert(base.find(_._1 == 1).get._2.length == 2)
    for (p <- Seq(2, 8, 32)) {
      assert(topkDf(rnd.shuffle(rows), 3, p) == base, s"p=$p diverged")
    }
  }
}
