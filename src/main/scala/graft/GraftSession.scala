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

  def configure(b0: SparkSession.Builder, cores: String): SparkSession.Builder = {
    val b = localDirDefault.fold(b0)(d => b0.config("spark.local.dir", d))
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
      // Shuffle write path (r16, measured): the bypass merge writer
      // creates one file PER REDUCE PARTITION per map task (M·R file
      // opens + an M·R-way copy-merge); with 32 maps × 32 reducers per
      // shuffle, stack sampling showed task threads dominated by
      // FileOutputStream.open0/copyFileStreamNIO inside
      // BypassMergeSortShuffleWriter — fixed metadata IO, not data.
      // Threshold 1 routes every SQL shuffle through the serialized
      // sort writer (one spill file + index per map task regardless of
      // R — the same path Spark itself picks whenever R > 200). The
      // sort the bypass writer exists to avoid is over partition IDs of
      // in-memory serialized rows; its cost scales with the DATA, the
      // file-create cost with M·R on every filesystem — so the
      // serialized writer is the right default at both bench and
      // cluster scale (measured at sf0.1: summed task time of the two
      // worst shuffle-wave queries 39.3 s → 9.5 s and 21 s → 6.5 s).
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      // Deployment overrides, applied LAST so they win over every
      // default above: SPARK_GRAFT_CONF="k=v;k=v". This is how the
      // scale-dependent settings (shuffle width, local dirs, bypass
      // threshold, broadcast threshold) are re-pointed at cluster
      // values without a code change — and how the bench A/Bs a
      // candidate conf against the standard session.
      .applyOverrides
  }

  private implicit class BuilderOps(private val b: SparkSession.Builder)
      extends AnyVal {
    def applyOverrides: SparkSession.Builder =
      sys.env.get("SPARK_GRAFT_CONF").iterator
        .flatMap(_.split(";")).filter(_.contains("="))
        .foldLeft(b) { (acc, kv) =>
          val Array(k, v) = kv.split("=", 2)
          acc.config(k.trim, v)
        }
  }

  /** Shuffle/spill scratch space: prefer the memory-backed /dev/shm
    * when present (the bench's shuffle blocks are MBs; file create +
    * fsync latency on the sandbox overlay fs dominated small-stage task
    * time — same adjudication as the streaming checkpoint default in
    * StreamOps). Deployments keep full control: Spark's own precedence
    * honors the SPARK_LOCAL_DIRS env var over `spark.local.dir`, and
    * cluster managers (YARN/K8s) inject their own local dirs that win
    * outright, so this default only ever binds in bare local mode. */
  private def localDirDefault: Option[String] = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm))
      Some(shm.resolve("graft-spark-local").toString)
    else None
  }

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
