package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

/** Multi-batch delivery contract of the streaming operators: the
  * registry queries replay bounded input in ONE micro-batch (oracle
  * gate), but the operators claim batch-split invariance — a live
  * source delivers the same rows across many micro-batches, carrying
  * state between them. These tests deliver the same events file-at-a-
  * time (`maxFilesPerTrigger = 1`, file order pinned by modification
  * time) and pin the results equal to single-batch delivery:
  * sessionize must carry open-session state across batches and its
  * change-log compaction must collapse the per-batch snapshots;
  * watermarked dedup must suppress duplicates arriving in later
  * batches inside the horizon. */
class StreamSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  /** Write each row group as its own parquet file (ordered mtimes) and
    * return a file-at-a-time readStream over the directory. */
  private def fileAtATimeStream(name: String, batches: Seq[Seq[(Long, Long, String)]]): DataFrame = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_streamspec_$name")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val f = dir.resolve(s"b$i.parquet")
      rows.toDF("user_id", "t", "event_type")
        .select(col("user_id"), expr("timestamp_micros(t * 1000000)").as("ts"),
          col("event_type"))
        .coalesce(1).write.mode("overwrite").parquet(f.toString)
      // FileStreamSource orders by modification time; pin it explicitly
      Files.walk(f).forEach(p =>
        p.toFile.setLastModified(1700000000000L + i * 60000L))
    }
    val schema = spark.read.parquet(dir.resolve("b0.parquet").toString).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString + "/*")
  }

  private def oneBatchStream(name: String, rows: Seq[(Long, Long, String)]): DataFrame =
    fileAtATimeStream(name, Seq(rows)) // single file ⇒ single batch

  // base time: seconds — two users, sessions split by the 1800 s gap,
  // with user 1's FIRST session spanning the batch boundary (forces
  // cross-batch state carry) and user 2 opening a new session in b1
  private val t0 = 1000000L
  private val batch0 = Seq(
    (1L, t0, "click"), (1L, t0 + 600, "click"),
    (2L, t0 + 100, "click"))
  private val batch1 = Seq(
    (1L, t0 + 1200, "click"),            // extends user 1's open session
    (1L, t0 + 1200 + 2000, "click"),     // > gap ⇒ second session
    (2L, t0 + 100 + 5000, "click"))      // > gap ⇒ second session
  private val allRows = batch0 ++ batch1

  test("sessionize: file-at-a-time delivery compacts to the single-batch answer") {
    def run(ev: DataFrame, name: String) =
      StreamOps.sessionizeCompact(
        StreamOps.runToMemory(spark, StreamOps.sessionizePlan(spark, ev),
          name, OutputMode.Append()))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    val multi = run(fileAtATimeStream("sess_multi", Seq(batch0, batch1)), "t_sess_multi")
    val single = run(oneBatchStream("sess_single", allRows), "t_sess_single")
    val expected = Seq(
      (1L, 0L, t0, t0 + 1200, 3L),                       // spans the batch split
      (1L, 1L, t0 + 3200, t0 + 3200, 1L),
      (2L, 0L, t0 + 100, t0 + 100, 1L),
      (2L, 1L, t0 + 5100, t0 + 5100, 1L))
    assert(multi == expected, s"multi-batch sessionize diverged: $multi")
    assert(single == expected, s"single-batch sessionize diverged: $single")
  }

  test("watermarked dedup suppresses in-horizon duplicates arriving in a later batch") {
    def run(ev: DataFrame, name: String) =
      StreamOps.runToMemory(spark, StreamOps.dedupPlan(ev), name, OutputMode.Append())
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // duplicates of (click, 1) and (click, 2) land in the second batch,
    // well inside the 1-hour horizon; (buy, 1) is a distinct key
    val b0 = Seq((1L, t0, "click"), (2L, t0 + 10, "click"))
    val b1 = Seq((1L, t0 + 600, "click"), (2L, t0 + 700, "click"), (1L, t0 + 800, "buy"))
    val multi = run(fileAtATimeStream("dedup_multi", Seq(b0, b1)), "t_dedup_multi")
    val single = run(oneBatchStream("dedup_single", b0 ++ b1), "t_dedup_single")
    assert(multi == Map("click" -> 2L, "buy" -> 1L), s"got $multi")
    assert(single == multi)
  }
}
