package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session factory with the engine's standard configuration.
  *
  * Local mode is a stand-in for a real cluster: shuffle partitions are
  * sized to the core count (not the 200 default), AQE is on so skewed
  * shuffles re-plan at runtime, and ANSI mode is off for Hive-style
  * null-on-error semantics (matches the DuckDB oracle's NULL handling
  * in the driver's correctness gate).
  *
  * The engine's native Catalyst expressions are injected through
  * `SparkSessionExtensions` (the supported extension point), so
  * `graft_cosine(...)` is available to SQL and `expr(...)` in every
  * session built here.
  */
object GraftSession {
  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder =
    b.withExtensions { ext =>
        ext.injectFunction((
          FunctionIdentifier("graft_cosine"),
          new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName,
            "graft_cosine"),
          (children: Seq[Expression]) =>
            graft.functions.CosineSimilarity(children(0), children(1))))
        ext.injectFunction((
          FunctionIdentifier("graft_lsh_bucket"),
          new ExpressionInfo(classOf[graft.functions.LshBucket].getName,
            "graft_lsh_bucket"),
          (children: Seq[Expression]) =>
            graft.functions.LshBucket(children(0), children(1))))
        ext.injectFunction((
          FunctionIdentifier("graft_top_cells"),
          new ExpressionInfo(classOf[graft.functions.TopCells].getName,
            "graft_top_cells"),
          (children: Seq[Expression]) =>
            graft.functions.TopCells(children(0), children(1), children(2))))
        ext.injectFunction((
          FunctionIdentifier("graft_minhash_sig"),
          new ExpressionInfo(classOf[graft.functions.MinhashSig].getName,
            "graft_minhash_sig"),
          (children: Seq[Expression]) =>
            graft.functions.MinhashSig(children(0), children(1), children(2))))
        ext.injectFunction((
          FunctionIdentifier("graft_simhash"),
          new ExpressionInfo(classOf[graft.functions.SimhashSig].getName,
            "graft_simhash"),
          (children: Seq[Expression]) =>
            graft.functions.SimhashSig(children(0))))
        ext.injectFunction((
          FunctionIdentifier("graft_repetition"),
          new ExpressionInfo(classOf[graft.functions.RepetitionSignals].getName,
            "graft_repetition"),
          (children: Seq[Expression]) =>
            graft.functions.RepetitionSignals(children(0))))
      }
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      // The driver's events table is TIMESTAMP(NANOS) parquet, which
      // Spark 4 otherwise rejects; read as raw nanos and normalize in
      // Tables.events (DuckDB truncates ns→µs the same way).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")

  /** Standalone session for tests / benchmarks. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      cores.toString
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
