package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TopKByAgg, TopKRow}

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
