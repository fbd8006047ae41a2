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
  /** Arity gate for the injected builders: a wrong-arity SQL call gets
    * the standard WRONG_NUM_ARGS AnalysisException (naming function and
    * counts) instead of a builder IndexOutOfBoundsException. */
  private def arity(name: String, expected: Int,
      children: Seq[Expression]): Seq[Expression] = {
    if (children.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    children
  }

  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder =
    b.withExtensions { ext =>
        ext.injectFunction((
          FunctionIdentifier("graft_cosine"),
          new ExpressionInfo(classOf[graft.functions.CosineSimilarity].getName,
            "graft_cosine"),
          (children: Seq[Expression]) => {
            val Seq(a, b) = arity("graft_cosine", 2, children)
            graft.functions.CosineSimilarity(a, b)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_lsh_bucket"),
          new ExpressionInfo(classOf[graft.functions.LshBucket].getName,
            "graft_lsh_bucket"),
          (children: Seq[Expression]) => {
            val Seq(a, b) = arity("graft_lsh_bucket", 2, children)
            graft.functions.LshBucket(a, b)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_top_cells"),
          new ExpressionInfo(classOf[graft.functions.TopCells].getName,
            "graft_top_cells"),
          (children: Seq[Expression]) => {
            val Seq(a, b, c) = arity("graft_top_cells", 3, children)
            graft.functions.TopCells(a, b, c)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_minhash_sig"),
          new ExpressionInfo(classOf[graft.functions.MinhashSig].getName,
            "graft_minhash_sig"),
          (children: Seq[Expression]) => {
            val Seq(a, b, c) = arity("graft_minhash_sig", 3, children)
            graft.functions.MinhashSig(a, b, c)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_kgram_first_pos"),
          new ExpressionInfo(classOf[graft.functions.KgramFirstPos].getName,
            "graft_kgram_first_pos"),
          (children: Seq[Expression]) => {
            val Seq(a, b) = arity("graft_kgram_first_pos", 2, children)
            graft.functions.KgramFirstPos(a, b)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_simhash"),
          new ExpressionInfo(classOf[graft.functions.SimhashSig].getName,
            "graft_simhash"),
          (children: Seq[Expression]) => {
            val Seq(a) = arity("graft_simhash", 1, children)
            graft.functions.SimhashSig(a)
          }))
        ext.injectFunction((
          FunctionIdentifier("graft_repetition"),
          new ExpressionInfo(classOf[graft.functions.RepetitionSignals].getName,
            "graft_repetition"),
          (children: Seq[Expression]) => {
            val Seq(a) = arity("graft_repetition", 1, children)
            graft.functions.RepetitionSignals(a)
          }))
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
      // µs timestamps with isAdjustedToUTC=false would otherwise load as
      // TIMESTAMP_NTZ (unusable with unix_micros); with the session tz
      // pinned to UTC above, reading them as TIMESTAMP keeps the stored
      // value = epoch-micros, exactly how DuckDB hashes the same column.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
