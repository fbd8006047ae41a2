package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic star schema (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All engine queries read
  * through here so partition/pushdown behavior is uniform: the scan is
  * a plain parquet source, so Catalyst's column pruning and filter
  * pushdown reach the file scan (verify with `.explain("formatted")` —
  * `PushedFilters` / `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `events.ts` is TIMESTAMP(NANOS) parquet → read as nanos LONG
    * (spark.sql.legacy.parquet.nanosAsLong) and truncated to a µs
    * timestamp here, matching DuckDB's ns→µs read conversion. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Sessions without GraftSession's inferTimestampNTZ=false read µs
        // parquet as NTZ; the cast is value-preserving under the UTC
        // session tz and restores unix_micros compatibility.
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Repartition to the session's default parallelism, used ahead of
    * CPU-bound per-row derivations (hash shingling, minhash banding,
    * per-vector math) whose compute dwarfs the scan. Without it a
    * too-coarse input split count — single-row-group files here,
    * skewed splits at cluster scale — serializes the whole stage onto
    * a few cores (measured: the sf0.1 shingle explode ran 7.3 s on one
    * core vs <0.5 s spread over 32). The shuffled payload is the pruned
    * projection, not the raw file, and AQE coalesces any over-split.
    */
  def parallel(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** `documents` / `embeddings` for compute-heavy operators. */
  def documentsP(s: SparkSession, d: String): DataFrame = parallel(documents(s, d))
  def embeddingsP(s: SparkSession, d: String): DataFrame = parallel(embeddings(s, d))

  private val rowCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Session-cached table row count — the corpus statistic the
    * data-driven quantizer sizing needs (Dedup.autoBucketBits,
    * Similarity.autoNList). Counted on the RAW parquet scan, never on a
    * derived/repartitioned frame: a bare `count()` over a parquet source
    * is a metadata-level job (zero columns read, no shuffle — the ANALYZE
    * shape), where the same count after [[parallel]] would full-shuffle
    * the corpus just to learn a number the footers already hold. Cached
    * per (sfDir, table) for the JVM lifetime, so repeated operator calls
    * in one session pay for it once. */
  def rowCount(s: SparkSession, sfDir: String, name: String): Long =
    rowCountCache.computeIfAbsent(s"$sfDir/$name.parquet",
      p => Long.box(s.read.parquet(p).count()))
}
