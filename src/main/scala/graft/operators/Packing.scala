package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Deterministic

/** Sequence packing for LM training-data construction: lay the corpus
  * out as one deterministic token stream and cut it into fixed-length
  * training sequences ("concat-and-chunk"), reporting for every
  * document the global token offset where it starts and the range of
  * sequences it lands in. This is the step that turns a curated corpus
  * into the actual `seq_len`-token examples a trainer consumes, and
  * the packing layout (which documents share a sequence, which cross a
  * boundary) is a first-class artifact — attention-masking and dedup
  * audits both read it.
  *
  * Scale design — the naive formulation is a running total over ONE
  * global document order, i.e. a corpus-wide unpartitioned window (one
  * task sorts 100 TB). Here the global order is instead DEFINED as
  * (bucket, id): each doc hashes to one of `numBuckets` buckets via the
  * partition-invariant [[Deterministic.hrand]], the running total runs
  * WITHIN each bucket (a partitioned window — every bucket sorts its
  * shard in parallel), and bucket-level token totals (numBuckets rows)
  * roll into prefix offsets on a single tiny task. tok_start =
  * bucket_offset + within_bucket_prefix reproduces exactly the cumsum
  * of the (bucket, id) global order — two parallel passes, no global
  * sort. `numBuckets` is the parallelism knob: ~10× the cluster's task
  * slots keeps every sort shard small; the hash spreads the corpus
  * uniformly, so shard skew is bounded by doc-length skew alone.
  *
  * The hash-bucketed order doubles as the SHUFFLE of standard packing
  * practice (documents are shuffled before packing so a sequence mixes
  * unrelated docs rather than adjacent crawl pages); keying it on the
  * stable id makes the layout reproducible across runs, cluster sizes
  * and partitionings, and exactly replayable by a SQL oracle.
  */
object Packing {

  /** Per-document packing layout. Output columns: `idCol`, `n_tok`
    * (copied through), `pack_bucket`, `tok_start` (global offset of the
    * doc's first token), `seq_first` / `seq_last` (0-based ids of the
    * fixed-length sequences the doc touches; a doc spanning a boundary
    * has seq_last > seq_first).
    *
    * `nTok` must be a non-null non-negative token count; a zero-length
    * doc occupies no tokens and reports seq_last = seq_first (the
    * sequence its offset falls in). Rows with a NULL count are the
    * caller's contract to filter (a NULL would poison every offset
    * after it in the bucket).
    */
  def packSequences(docs: DataFrame, idCol: String, nTok: Column,
      seqLen: Long, numBuckets: Int = 64, seed: Long = 0L): DataFrame = {
    require(seqLen >= 1, s"packSequences needs seqLen >= 1, got $seqLen")
    require(numBuckets >= 1, s"packSequences needs numBuckets >= 1, got $numBuckets")
    // hrand < 2^31 and numBuckets is an Int, so the product is exact in
    // BIGINT and `div` is plain integer arithmetic — bit-identical in
    // any engine (no double rounding anywhere in the layout math, which
    // also keeps 100 TB-scale token offsets exact).
    val base = docs.select(col(idCol), nTok.cast("long").as("n_tok"),
        Deterministic.hrand(col(idCol), seed).as("hr"))
      .withColumn("pack_bucket", expr(s"(hr * $numBuckets) div ${Deterministic.M}"))
      .drop("hr")
    // Within-bucket exclusive prefix: parallel across buckets.
    val w = Window.partitionBy("pack_bucket").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = base.withColumn("ws", coalesce(sum("n_tok").over(w), lit(0L)))
    // Bucket totals -> exclusive prefix offsets: numBuckets rows, one
    // tiny task; broadcast back onto the stream.
    val wb = Window.orderBy("pack_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("pack_bucket")
      .agg(sum("n_tok").as("bt"))
      .withColumn("boff", coalesce(sum("bt").over(wb), lit(0L)))
      .select("pack_bucket", "boff")
    within.join(broadcast(offsets), "pack_bucket")
      .withColumn("tok_start", col("boff") + col("ws"))
      .withColumn("seq_first", expr(s"tok_start div $seqLen"))
      .withColumn("seq_last",
        expr(s"(tok_start + greatest(n_tok, 1L) - 1) div $seqLen"))
      .select(col(idCol), col("n_tok"), col("pack_bucket"), col("tok_start"),
        col("seq_first"), col("seq_last"))
  }

  /** Token-budget corpus selection: keep the best-scoring documents
    * until a token budget is filled — the standard "we can afford N
    * training tokens, take the highest-quality prefix" curation cut.
    * Semantics: documents are totally ordered by (score DESC, id ASC)
    * and the kept set is the maximal PREFIX whose running token total
    * stays ≤ `budget` (greedy prefix, not knapsack: the first
    * over-budget doc and everything after it drop — deterministic and
    * engine-replayable).
    *
    * Scale design — the naive form is a running sum over one global
    * score order (a corpus-wide unpartitioned window). Like
    * [[packSequences]], the prefix decomposes into two parallel
    * passes: scores bucket into BANDS of width `bandWidth` (band =
    * floor(score / bandWidth) — score-contiguous, so band order
    * refines the global order), the running total runs WITHIN each
    * band (partitioned window), and band-level totals (a
    * band-count-sized frame) roll into prefix offsets on one tiny
    * task. `bandWidth` is the balance knob: narrower bands = more
    * parallel shards; shard skew is bounded by score concentration,
    * not corpus size.
    *
    * `scoreCol` must be non-null (NULL would poison its band's
    * prefix); ties are broken by `idCol` ascending. Output: the kept
    * rows as (idCol, score, n_tok, cum_tokens — the running total
    * INCLUDING the row), ordered (score DESC, id). */
  def tokenBudgetPrefix(docs: DataFrame, idCol: String, scoreCol: String,
      nTok: Column, budget: Long, bandWidth: Double): DataFrame = {
    require(budget >= 0, s"tokenBudgetPrefix needs budget >= 0, got $budget")
    require(bandWidth > 0, s"tokenBudgetPrefix needs bandWidth > 0, got $bandWidth")
    val base = docs.select(col(idCol), col(scoreCol).as("score"),
        nTok.cast("long").as("n_tok"))
      .withColumn("band", floor(col("score") / bandWidth).cast("long"))
    // inclusive within-band prefix, parallel across bands
    val w = Window.partitionBy("band")
      .orderBy(col("score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val within = base.withColumn("cw", sum("n_tok").over(w))
    // band totals -> exclusive prefix in band-DESC (best-first) order
    val wb = Window.orderBy(col("band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("band")
      .agg(sum("n_tok").as("bt"))
      .withColumn("boff", coalesce(sum("bt").over(wb), lit(0L)))
      .select("band", "boff")
    within.join(broadcast(offsets), "band")
      .withColumn("cum_tokens", col("boff") + col("cw"))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col("score"), col("n_tok"), col("cum_tokens"))
      .orderBy(col("score").desc, col(idCol))
  }

  /** Sliding-window chunking with overlap — the OTHER standard corpus
    * layout (long-context chunking, retrieval indexing, eval-window
    * construction): each document yields windows of up to `size` tokens
    * starting every `stride` tokens (`stride < size` ⇒ consecutive
    * chunks overlap by `size − stride`). Row-local explode — no
    * shuffle, no state; chunk counts per doc are ⌈n_tok / stride⌉, so
    * output volume is bounded by `1/stride` of the token stream.
    *
    * Chunk starts run 0, stride, 2·stride, … up to the FIRST window
    * that reaches the document's end (1 + ⌈max(0, n−size)/stride⌉
    * chunks) — every token is covered and no chunk is fully contained
    * in its predecessor (a doc of exactly `size` tokens yields ONE
    * chunk, not a redundant sub-window).
    *
    * Output: every input column (pass-through — project before calling
    * if the frame carries wide payloads like the raw text) plus
    * `n_tok`, `chunk_idx`, `chunk_start`, `chunk_len` with
    * `chunk_len = min(size, n_tok − chunk_start)` (the trailing chunk
    * is short, never dropped). Docs with `n_tok < 1` produce no
    * chunks; NULL counts are the caller's contract to filter. */
  def slidingChunks(docs: DataFrame, nTok: Column,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"slidingChunks needs size >= 1, got $size")
    require(stride >= 1 && stride <= size,
      s"slidingChunks needs 1 <= stride <= size, got stride=$stride size=$size")
    val base = docs.withColumn("n_tok", nTok.cast("long"))
      .filter(col("n_tok") >= 1)
    // last start = ⌈(n−size)/stride⌉·stride, clamped at 0; integer-exact
    // on both engines (the clamp swallows the truncate-vs-floor
    // difference on the negative n < size operand).
    val lastStart = expr(
      s"greatest(0L, (n_tok - $size + $stride - 1) div $stride) * $stride")
    base
      .select(base.columns.map(col) :+
        posexplode(sequence(lit(0L), lastStart, lit(stride.toLong)))
          .as(Seq("chunk_idx", "chunk_start")): _*)
      .withColumn("chunk_len",
        least(lit(size.toLong), col("n_tok") - col("chunk_start")))
  }
}
