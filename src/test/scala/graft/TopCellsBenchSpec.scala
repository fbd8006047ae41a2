package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class TopCellsBenchSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(8)

  test("native topCells vs HOF form timing") {
    import spark.implicits._
    val rnd = new scala.util.Random(3L)
    val vecs = (1L to 20000L).map(id => (id, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "v").repartition(8).cache()
    df.count()
    val cent = df.filter(col("vec_id") <= 64).select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val withCents = df.crossJoin(broadcast(Similarity.centroidArray(cent)))
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      withCents.select(explode(c)).count()
      (System.nanoTime() - t0) / 1e9
    }
    time(Similarity.topCells("v", 4)); time(Similarity.topCellsSql("v", 4)) // warm
    val tN = (1 to 3).map(_ => time(Similarity.topCells("v", 4))).min
    val tH = (1 to 3).map(_ => time(Similarity.topCellsSql("v", 4))).min
    info(f"native $tN%.3f s, HOF $tH%.3f s, speedup ${tH / tN}%.2fx (20k vecs x 64 cells)")
  }
}
