package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Q
import graft.operators.Memo

/** Mechanized memo-tier audit (the broadcast-hint-audit pattern applied
  * to the session memo): building the full registry registers every
  * memoized frame, and each one must be a CONSCIOUS, annotated choice —
  * a new `Memo.cached`/`cachedCorpus` call site fails here until its
  * tag is allowlisted with the tier that matches its size contract.
  * The contract under audit (operators/Memo.scala tier doc):
  *
  *  - "bounded" entries ([[Memo.cached]]) are sized by model constants
  *    or operator output — trained models, graph finals, verified pair
  *    sets — never by corpus rows;
  *  - "corpus" entries ([[Memo.cachedCorpus]]) are per-DOCUMENT derived
  *    tables (the dedup signature tables): at most one row per corpus
  *    document — memoizing an EXPLODED stream (per-token/per-shingle
  *    rows) would blow the executor cache at scale and fails the row
  *    bound here;
  *  - every entry persists with a disk fallback (an OOM-safe storage
  *    level), since memo entries outlive per-query cache scopes.
  */
class MemoAuditSpec extends AnyFunSuite {

  private lazy val spark = GraftSession.local(4)

  test("memo entries: annotated tier allowlist, disk fallback, size contracts") {
    Memo.clear()
    val sf = s"${Q.testdataRoot}/sf0.001"
    // building a query is enough to REGISTER its memo entries (cached()
    // runs at plan-build time); streaming queries are excluded because
    // building them executes the stream (PlanAuditSpec convention)
    Q.registry.filterNot(_.name.startsWith("stream_")).foreach { q =>
      try q.build(spark, sf)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    val rep = Memo.report
    assert(rep.nonEmpty, "registry build must register memo entries")
    // tag → tier, each with its size rationale:
    val allow: Map[String, String] = Map(
      "tok" -> "corpus",     // dedup-family minhash signature table: 1 row/doc
      "sh" -> "corpus",      // simhash fingerprint table: 1 row/doc
      "mh" -> "bounded",     // verified minhash pair set: output-sized
      "ngp" -> "bounded",    // n-gram pair stats, C>=0.8 prefiltered: emitted-pair-sized
      "prcp" -> "bounded",   // co-purchase PageRank edges/ranks: graph-sized
      "prdir" -> "bounded",  // directed PageRank edges/ranks: graph-sized
      "prkr" -> "bounded",   // keep-rank PageRank edges/ranks: pair-graph-sized
      "tricp" -> "bounded",  // triangle counts: node-sized
      "lpa" -> "bounded",    // LPA labels/edges: graph-sized
      "km" -> "bounded",     // k-means centroids/assignment finals: k-bounded
      "pq" -> "bounded",     // PQ codebooks/assignments: m·kCodes-bounded
      "tfidf" -> "bounded",  // trained IDF table: vocabulary-sized
      "bglm" -> "bounded",   // trained bigram LM: bigram-vocabulary-sized
      "clf-thhe-v1" -> "bounded") // trained IRLS β: feature-count rows
    val docsN = spark.read.parquet(s"$sf/documents.parquet").count()
    val offenders = rep.flatMap { e =>
      val tag = e.key.takeWhile(_ != ':')
      allow.get(tag) match {
        case None => Some(s"${e.key}: tag '$tag' not on the memo allowlist")
        case Some(tier) if tier != e.tier =>
          Some(s"${e.key}: registered in tier '${e.tier}', allowlisted as '$tier'")
        case _ if !e.storage.contains("disk") =>
          Some(s"${e.key}: storage '${e.storage}' has no disk fallback")
        case _ => None
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
    // size contracts at the fixture scale. Corpus tier: at most one row
    // per document — the sharp check against memoizing an exploded
    // per-token stream. Bounded tier: a generous constant cap that
    // catches the same blow-up class (an exploded or candidate-join
    // frame sneaking into the memo); doc-proportionality of bounded
    // entries is guarded by the tier allowlist above, not by the cap
    // (at 50-doc fixture scale a row bound cannot separate the two).
    val sizeOffenders = rep.flatMap { e =>
      val rows = Memo.lookup(e.key).map(_.count()).getOrElse(-1L)
      if (e.tier == "corpus" && rows > docsN)
        Some(s"${e.key}: corpus-tier entry has $rows rows > $docsN documents")
      else if (e.tier == "bounded" && rows > 65536L)
        Some(s"${e.key}: bounded-tier entry has $rows rows (cap 65536)")
      else None
    }
    assert(sizeOffenders.isEmpty, sizeOffenders.mkString("\n"))
    Memo.clear()
  }
}
