package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` plumbing for every PERSISTED derived artifact
  * (the minhash signature store, the IVF-PQ ANN index, parquet result
  * memos). One rule: any path a Spark job writes with
  * `df.write.parquet` must be discovered and gated through the SAME
  * filesystem abstraction Spark wrote it with — `java.io.File` /
  * `java.nio.file` resolve only local POSIX paths, so against an
  * `hdfs://` or `s3a://` store they return `null`/false and the caller
  * maps that to "nothing there yet": a serve silently drops every
  * admitted append, a skip-if-exists gate re-runs (or worse, trusts a
  * half-written store). That is a wrong-ANSWER shape with no error, in
  * exactly the cluster deployment the persisted stores exist for —
  * the one failure class a local bench and oracle can never catch.
  *
  * All methods are driver-side metadata calls (exists/listStatus/
  * rename): no job runs, nothing reads data. The `FileSystem` is
  * resolved per-path from the session's Hadoop configuration, so one
  * code path serves `file:`, `hdfs:` and object stores alike.
  */
object StoreFs {

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** True iff the dataset at `dir` is COMPLETE: its `_SUCCESS` commit
    * marker exists. The marker is what Spark's file output committer
    * writes last, so it is the only existence test a skip-if-exists
    * caller may trust — testing the directory alone accepts a crashed
    * half-write. (Deployments that disable the marker via
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` opt out
    * of this discipline store-wide; the stores here require it.) */
  def datasetComplete(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    fs(spark, dir).exists(p)
  }

  /** The COMPLETED child datasets of `dir`: subdirectories carrying a
    * `_SUCCESS` marker, as scheme-qualified path strings in
    * lexicographic order. Empty when `dir` does not exist yet — and,
    * unlike `java.io.File.listFiles`, empty-vs-unresolvable is not
    * conflated: a reachable remote filesystem with no appends lists
    * empty, an unreachable one throws instead of silently serving a
    * stale store. */
  def completedChildren(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(st => st.isDirectory && f.exists(new Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.toString).sorted
  }

  /** Delete `dir` (recursively) if present. Returns true when
    * something was deleted. */
  def delete(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).delete(new Path(dir), true)

  /** Atomically promote `src` over `dest`: remove any existing `dest`
    * and rename `src` into place. The delete+rename pair is the
    * standard committer promotion — the window where `dest` is absent
    * is a directory-level metadata operation, not a file-by-file
    * rewrite, and callers bracket it with a marker invalidation (see
    * [[Dedup.writeMinhashSigStore]]'s rewrite protocol) so an observer
    * can never mistake the mid-promotion state for a complete store. */
  def promote(spark: SparkSession, src: String, dest: String): Unit = {
    val f = fs(spark, dest)
    val d = new Path(dest)
    if (f.exists(d)) f.delete(d, true)
    val parent = d.getParent
    if (parent != null && !f.exists(parent)) f.mkdirs(parent)
    require(f.rename(new Path(src), d),
      s"promote failed: rename($src -> $dest) returned false")
  }

  /** (Re-)create a zero-length `_SUCCESS` marker under `dir` — the
    * closing half of a marker-bracketed rewrite. */
  def createMarker(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val m = new Path(dir, "_SUCCESS")
    if (!f.exists(m)) f.create(m, true).close()
  }

  /** Remove the `_SUCCESS` marker under `dir` — the opening half of a
    * marker-bracketed rewrite: with the marker gone, gate-checking
    * readers see the dataset as incomplete for the whole rewrite. */
  def deleteMarker(spark: SparkSession, dir: String): Unit =
    fs(spark, dir).delete(new Path(dir, "_SUCCESS"), false)
}
