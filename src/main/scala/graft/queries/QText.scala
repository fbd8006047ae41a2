package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline extensions (project north star §M5): token
  * counting, quality scoring, language-ID heuristic, shingle
  * fingerprinting. Every operator is a pure Catalyst expression chain
  * (codegen-friendly, no UDFs) with an exactly-equivalent DuckDB oracle:
  * cross-engine-portable primitives only (whitespace split, replace-based
  * substring counting, md5 hex, array lambdas).
  */
object QText {

  /** Substring occurrence count via the replace trick — identical
    * semantics in Spark and DuckDB. */
  private def nOcc(colName: String, pat: String) =
    ((length(col(colName)) - length(expr(s"replace($colName, '$pat', '')"))) / pat.length).cast("long")
  private def nOccSql(c: String, pat: String) =
    s"(length($c) - length(replace($c, '$pat', ''))) // ${pat.length}"

  // --------------------------------------------------------- token count
  /** Token counting per source: whitespace tokens + BPE-ish regex tokens
    * (letter runs / digit runs / single other chars) + chars. */
  val tokenCount = Q("text_token_count", Some("""
    SELECT source,
           count(*) AS n_docs,
           sum(len(string_split(text, ' '))) AS ws_tokens,
           sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS bpe_tokens,
           sum(length(text)) AS chars
    FROM documents GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    Tables.documentsP(s, d)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("ws_tokens"),
        sum(size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).cast("long")).as("bpe_tokens"),
        sum(length(col("text")).cast("long")).as("chars"))
      .orderBy("source"))

  // ------------------------------------------------------ quality score
  /** Quality scoring: stopword ratio, mean word length, short-doc flag,
    * rolled up per language. Mirrors the length/punct/stopword family of
    * heuristic quality filters. */
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
           sum(CASE WHEN n_tok < 30 THEN 1 ELSE 0 END) AS n_short
    FROM q GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    val q = Tables.documentsP(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("lang"),
        size(col("toks")).as("n_tok"),
        size(expr("filter(toks, w -> w IN ('the','a','and','of','to'))")).as("n_stop"),
        length(col("text")).as("n_chars"))
    q.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_stop").cast("double") / col("n_tok")), 6).as("stopword_ratio"),
        round(avg((col("n_chars") - col("n_tok") + 1).cast("double") / col("n_tok")), 6).as("mean_word_len"),
        sum(when(col("n_tok") < 30, 1L).otherwise(0L)).as("n_short"))
      .orderBy("lang")
  })

  // ------------------------------------------------------------ lang ID
  /** Character-n-gram language-ID heuristic: per-language marker-bigram
    * scores, argmax with alphabetical tie-break, reported as a
    * (lang, predicted) confusion matrix. The markers are generic Latin
    * bigrams — the point is the operator shape (portable scoring +
    * deterministic argmax), not linguistic accuracy on synthetic text. */
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
  })((s, d) => {
    val langs = markers.map(_._1)
    val scored = markers.foldLeft(Tables.documentsP(s, d)) { case (df, (l, pats)) =>
      df.withColumn(s"s_$l", pats.map(p => nOcc("text", p)).reduce(_ + _))
    }
    val best = greatest(langs.map(l => col(s"s_$l")): _*)
    val pred = langs.foldRight(lit(null).cast("string")) { (l, acc) =>
      when(col(s"s_$l") === best, lit(l)).otherwise(acc)
    }
    // foldRight gives priority to the FIRST (alphabetical) match
    scored.withColumn("predicted", pred)
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  })

  // -------------------------------------------------------- fingerprint
  /** Document fingerprint: min-hash over word 3-gram shingles (md5 hex,
    * lexicographic min) — the deterministic, cross-engine core of
    * MinHash dedup (QSim builds the full band/bucket pipeline on the
    * same primitive). */
  val fingerprint = Q("text_fingerprint", Some("""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (SELECT doc_id, md5(concat_ws(' ', w[i], w[i+1], w[i+2])) AS h
           FROM words, LATERAL unnest(generate_series(1, len(w)-2)) AS t(i))
    SELECT doc_id, count(*) AS n_shingles, min(h) AS fingerprint
    FROM sh GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    // Row-wise md5 (explode indices, then codegen'd scalar md5) — the
    // transform(...) lambda form runs interpreted, ~7× slower.
    Tables.documentsP(s, d)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("w"),
        explode(expr("sequence(0, size(w) - 3)")).as("i"))
      .select(col("doc_id"),
        expr("md5(encode(concat_ws(' ', w[i], w[i+1], w[i+2]), 'UTF-8'))").as("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"), min("h").as("fingerprint"))
      .orderBy("doc_id"))

  val all: Seq[Q] = Seq(tokenCount, quality, langId, fingerprint)
}
