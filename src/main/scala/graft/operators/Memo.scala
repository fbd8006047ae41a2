package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo for expensive DERIVED frames shared across
  * queries — the canonical case is PQ codebook training
  * ([[Similarity.pqTrainParts]]): `sim_pq_error` (2 Lloyd iterations)
  * and `sim_pq_adc_topk` (1) train the SAME seeded codebooks on the
  * same corpus, and iteration i's codebook/assignment is a strict
  * prefix of iteration i+1's — without a memo every query (and every
  * bench rep) re-pays the whole training chain.
  *
  * Contract: the KEY owns identity. Callers must fold everything that
  * determines the frame's content into the key (data identity — e.g.
  * the source directory — plus every parameter); the memo never
  * inspects the plan. Same key ⇒ the cached frame is returned even if
  * the caller rebuilt its input differently (that is the point: two
  * queries reaching the same logical frame through different
  * projections share one materialization).
  *
  * Lifecycle: entries persist at MEMORY_AND_DISK OUTSIDE any
  * [[CacheScope]] (they must outlive per-query scopes) and live until
  * the SparkContext they were built on goes away — the map clears
  * itself when it sees a different context, so frames from a stopped
  * context are never served. Memoized frames are small by construction
  * (codebooks, sub-vector slices of a bounded embedding table); a
  * 100 TB deployment memoizes the TRAINED frames (m·kCodes rows),
  * not corpus-sized ones — see the `memoKey` call sites.
  */
object Memo {

  private var ctxId: String = null
  private val entries = mutable.Map.empty[String, DataFrame]

  /** The frame for `key`, building (and persisting) it on first use. */
  def cached(key: String)(build: => DataFrame): DataFrame = synchronized {
    val df0 = entries.get(key)
    df0 match {
      case Some(df) if sameContext(df) =>
        // A hit whose cache was voided behind the memo's back must not
        // be served cache-less. The known path: a CacheScope close
        // unpersists a scoped frame whose plan CANONICALIZES to this
        // entry's (Spark's CacheManager keys on canonicalized plans, so
        // a rename-only Project over a scoped persist shares its cache
        // entry — the r11 LPA regression). Re-persisting here means the
        // next action rebuilds the cache once instead of silently
        // re-running the full lineage on every evaluation.
        if (df.storageLevel == StorageLevel.NONE)
          df.persist(StorageLevel.MEMORY_AND_DISK)
        df
      case _ =>
        val df = build
        val id = contextId(df)
        if (ctxId != id) { entries.clear(); ctxId = id }
        df.persist(StorageLevel.MEMORY_AND_DISK)
        entries.put(key, df)
        df
    }
  }

  /** The frame for `key` if (and only if) it is already memoized on
    * the live context — a read-only probe that never registers or
    * persists. For chain INTERMEDIATES: a builder that benefits from a
    * sibling's memoized final frame (pqTrainParts' asg_i, final for
    * the iters=i sharer, intermediate for iters>i) probes here, and on
    * a miss builds UN-persisted — a frame consumed exactly once must
    * not stay pinned for the session (the r3 cache-accumulation
    * regression class). */
  def lookup(key: String): Option[DataFrame] = synchronized {
    entries.get(key).filter(sameContext)
  }

  /** Corpus identity for memo keys: the source directory plus a
    * fingerprint of its parquet file listing (name, mtime, size). A
    * path-only key silently serves stale frames when data under the
    * same path is regenerated mid-session (this repo's /tmp/sf1
    * workflow does exactly that); folding the listing into the key
    * makes regeneration a clean miss. Driver-side metadata only —
    * never reads file contents. */
  def corpusKey(tag: String, dir: String): String = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.lastModified}:${f.length}")
    val fp = java.util.UUID.nameUUIDFromBytes(
      files.mkString("|").getBytes("UTF-8")).toString.take(8)
    s"$tag:$dir@$fp"
  }

  private def contextId(df: DataFrame): String = {
    val sc = df.sparkSession.sparkContext
    s"${sc.applicationId}@${sc.startTime}"
  }

  private def sameContext(df: DataFrame): Boolean =
    try contextId(df) == ctxId && !df.sparkSession.sparkContext.isStopped
    catch { case _: Throwable => false }

  /** Drop every entry (tests; a long-lived service rotating corpora). */
  def clear(): Unit = synchronized {
    entries.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
    entries.clear()
    ctxId = null
  }
}
