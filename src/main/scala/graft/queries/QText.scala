package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Text-analysis registry entries — thin instantiations of the reusable
  * `graft.operators.TextOps` library over the `documents` table (token
  * counting, quality scoring, language-ID heuristic, shingle
  * fingerprinting), each with an exactly-equivalent DuckDB oracle built
  * from cross-engine-portable primitives (whitespace split,
  * replace-based substring counting, md5 hex).
  */
object QText {

  private def nOccSql(c: String, pat: String) =
    s"(length($c) - length(replace($c, '$pat', ''))) // ${pat.length}"

  // --------------------------------------------------------- token count
  /** Token counting per source — operators.TextOps.tokenStats. */
  val tokenCount = Q("text_token_count", Some("""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens,
           CAST(sum(length(text)) AS BIGINT) AS chars
    FROM documents GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    TextOps.tokenStats(Tables.documentsP(s, d), "source", "text")
      .orderBy("source"))

  // ------------------------------------------------------ quality score
  /** Quality scoring per language — operators.TextOps.qualityStats
    * (stopword ratio, mean word length, short-doc count). */
  val quality = Q("text_quality_score", Some("""
    WITH q AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_tok,
             len(list_filter(string_split(text, ' '),
                 w -> w IN ('the','a','and','of','to'))) AS n_stop,
             length(text) AS n_chars
      FROM documents)
    SELECT lang, count(*) AS n_docs,
           round(avg(CAST(n_stop AS DOUBLE) / n_tok), 6) AS stopword_ratio,
           round(avg(CAST(n_chars - n_tok + 1 AS DOUBLE) / n_tok), 6) AS mean_word_len,
           CAST(sum(CASE WHEN n_tok < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
    FROM q GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    TextOps.qualityStats(Tables.documentsP(s, d), "lang", "text")
      .orderBy("lang"))

  // ------------------------------------------------------------ lang ID
  /** Character-n-gram language-ID heuristic —
    * operators.TextOps.languageId — reported as a (lang, predicted)
    * confusion matrix. The markers are generic Latin bigrams: the point
    * is the operator shape (portable scoring + deterministic argmax),
    * not linguistic accuracy on synthetic text. */
  private val markers = Seq(
    "de" -> Seq("er", "ch"), "en" -> Seq("th", "he"),
    "es" -> Seq("os", "ar"), "fr" -> Seq("le", "ou"),
    "zh" -> Seq("sh", "ng"))

  val langId = Q("text_lang_id", {
    val scoreSql = markers.map { case (l, pats) =>
      pats.map(p => nOccSql("text", p)).mkString(" + ") + s" AS s_$l"
    }.mkString(", ")
    val langs = markers.map(_._1)
    // argmax with alphabetical tie-break = first lang with score == greatest
    val caseSql = "CASE " + langs.map(l =>
      s"WHEN s_$l = greatest(${langs.map("s_" + _).mkString(", ")}) THEN '$l'").mkString(" ") + " END"
    Some(s"""
    WITH sc AS (SELECT lang, $scoreSql FROM documents)
    SELECT lang, $caseSql AS predicted, count(*) AS n
    FROM sc GROUP BY 1, 2 ORDER BY 1, 2""")
  })((s, d) =>
    TextOps.languageId(Tables.documentsP(s, d), "text", markers)
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted"))

  // -------------------------------------------------------- fingerprint
  /** Document fingerprint — operators.TextOps.fingerprint: min-hash over
    * word 3-gram shingles, the deterministic core of MinHash dedup. */
  val fingerprint = Q("text_fingerprint", Some("""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id, md5(concat_ws(' ', w[i], w[i+1], w[i+2])) AS h
           FROM words, LATERAL unnest(generate_series(1, len(w)-2)) AS t(i))
    SELECT doc_id, count(*) AS n_shingles, min(h) AS fingerprint
    FROM sh GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    TextOps.fingerprint(Tables.documentsP(s, d), "doc_id", "text")
      .orderBy("doc_id"))

  val all: Seq[Q] = Seq(tokenCount, quality, langId, fingerprint)
}
