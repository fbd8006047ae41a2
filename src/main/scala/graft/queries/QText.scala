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
  val quality = Q("text_quality_score", Some(s"""
    WITH q AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_tok,
             len(list_filter(string_split(text, ' '),
                 w -> w IN ('the','a','and','of','to'))) AS n_stop,
             length(text) AS n_chars
      FROM documents)
    SELECT lang, count(*) AS n_docs,
           round(${graft.functions.Deterministic.stableSumSql("CAST(n_stop AS DOUBLE) / n_tok", 12)}
                 / count(*), 6) AS stopword_ratio,
           round(${graft.functions.Deterministic.stableSumSql("CAST(n_chars - n_tok + 1 AS DOUBLE) / n_tok", 12)}
                 / count(*), 6) AS mean_word_len,
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

  // ------------------------------------------------------------- BM25
  /** BM25 relevance ranking — operators.TextOps.bm25Rank — against a
    * fixed probe query ("dup spark join": one rare term, df≈5%, two
    * common ones — the idf spread that makes the ranking non-trivial).
    * The oracle interpolates the SAME Scala doubles (k1, b and their
    * derived constants) and mirrors the expression tree node for node,
    * so both engines round an identical IEEE chain at 4 dp; ties in the
    * rounded score break by doc_id on both sides. */
  private val bmTerms = Seq("dup", "spark", "join")
  private val bmK1 = 1.2
  private val bmB = 0.75
  private val bmTopK = 20

  /** The BM25 oracle CTE chain (everything after WITH, ending at the
    * ranked frame `bmr` = (doc_id, score, rank)) — shared verbatim
    * between text_bm25_rank and ret_hybrid_rrf so both replay the
    * identical tf/df/idf arithmetic. CTE names are bm-prefixed to
    * compose without collisions. */
  private[queries] lazy val bm25RankedCte: String = {
    val tfCols = bmTerms.indices.map(i =>
      s"len(list_filter(w, x -> x = '${bmTerms(i)}'))::DOUBLE AS tf$i").mkString(", ")
    val dfCols = bmTerms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i").mkString(", ")
    val scoreSum = bmTerms.indices.map(i =>
      s"ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * " +
        s"((tf$i * ${bmK1 + 1}) / (tf$i + $bmK1 * (${1 - bmB} + $bmB * (dl / avgdl))))")
      .mkString(" + ")
    s"""bmd AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bmt AS (SELECT doc_id, len(w)::DOUBLE AS dl, $tfCols FROM bmd),
    bmg AS (SELECT count(*)::DOUBLE AS n, sum(dl) / count(*) AS avgdl, $dfCols FROM bmt),
    bms AS (SELECT doc_id, round($scoreSum, 4) AS score FROM bmt, bmg),
    bmr AS (SELECT doc_id, score,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS rank FROM bms)"""
  }

  val bm25 = Q("text_bm25_rank", Some(s"""
    WITH $bm25RankedCte
    SELECT rank, doc_id, score FROM bmr WHERE rank <= $bmTopK ORDER BY rank"""
  ))((s, d) =>
    TextOps.bm25Rank(Tables.documentsP(s, d), "doc_id", "text",
      terms = bmTerms, k1 = bmK1, b = bmB, topK = bmTopK)
      .orderBy("rank"))

  // --------------------------------------------- hybrid retrieval (RRF)
  /** Reciprocal-rank fusion of the lexical and semantic retrieval legs
    * — operators.TextOps.rrfFuse (Cormack et al. 2009): the BM25
    * top-20 for the standing term query and the embedding-cosine
    * top-20 for query vector 0 fuse as Σ 1/(60 + rank), no score
    * calibration, absent-leg contributes 0. This is the serving-side
    * composition the two index families exist for — and the dedup
    * angle: a doc surfaced by BOTH legs is the strongest near-dup
    * candidate for the query. Both legs replay their existing proven
    * oracles (bm25RankedCte verbatim; the brute-cosine chain of
    * sim_cosine_topk); the fused frame is ≤ 40 rows, so the re-rank
    * window is bounded, never corpus-scaled. */
  private val rrfK = 60
  private val rrfOut = 10
  private val rrfQv = 0

  val hybridRrf = Q("ret_hybrid_rrf", Some {
    val cosAb = QSim.cosD("a.v", "b.v")
    s"""
    WITH $bm25RankedCte,
    lex AS (SELECT doc_id, rank AS lex_rank FROM bmr WHERE rank <= $bmTopK),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ssc AS (SELECT b.vec_id AS doc_id, round($cosAb, 6) AS c
            FROM e a JOIN e b ON a.vec_id = $rrfQv AND b.vec_id <> $rrfQv),
    sem AS (SELECT doc_id, sem_rank FROM (
              SELECT doc_id,
                     row_number() OVER (ORDER BY c DESC, doc_id) AS sem_rank
              FROM ssc) WHERE sem_rank <= $bmTopK),
    f AS (SELECT COALESCE(l.doc_id, m.doc_id) AS doc_id, l.lex_rank, m.sem_rank,
                 round(coalesce(CAST(1.0 AS DOUBLE) / CAST($rrfK + l.lex_rank AS DOUBLE),
                                CAST(0.0 AS DOUBLE))
                     + coalesce(CAST(1.0 AS DOUBLE) / CAST($rrfK + m.sem_rank AS DOUBLE),
                                CAST(0.0 AS DOUBLE)), 6) AS rrf
          FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.doc_id),
    fr AS (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank FROM f)
    SELECT rank, doc_id, rrf, lex_rank, sem_rank
    FROM fr WHERE rank <= $rrfOut ORDER BY rank"""
  })((s, d) => {
    val lex = TextOps.bm25Rank(Tables.documentsP(s, d), "doc_id", "text",
        terms = bmTerms, k1 = bmK1, b = bmB, topK = bmTopK)
      .select(col("doc_id"), col("rank"))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding").as("v"))
    val sem = graft.operators.Similarity
      .bruteTopK(e, e.filter(col("vec_id") === rrfQv), "vec_id", "v", k = bmTopK)
      .select(col("cand_id").as("doc_id"), col("rk").as("rank"))
    TextOps.rrfFuse(Seq("lex" -> lex, "sem" -> sem), "doc_id", "rank",
        k = rrfK, topK = rrfOut)
      .orderBy("rank")
  })

  // --------------------------------------------------- quality filter
  /** Gopher-style keep/drop gate — operators.TextOps.qualityFilter —
    * reported as a drop-reason summary (counts, token mass, first doc
    * per outcome). Thresholds are tuned so the synthetic corpus
    * exercises five outcome buckets (too_short / too_long /
    * words_too_short / no_stopwords / too_repetitive) plus `kept`;
    * first-failing-rule-wins makes the reason deterministic, and both
    * sides evaluate the identical CASE order. */
  val qualityGate = Q("text_quality_filter", Some("""
    WITH q AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             (length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
               / len(string_split(text, ' ')) AS mean_wlen,
             len(list_filter(string_split(text, ' '),
                 w -> w IN ('the','a','and','of','to'))) AS n_stop,
             len(list_distinct(string_split(text, ' ')))::DOUBLE
               / len(string_split(text, ' ')) AS distinct_ratio
      FROM documents),
    r AS (SELECT doc_id, n_tok,
            CASE WHEN n_tok < 20 THEN 'too_short'
                 WHEN n_tok > 90 THEN 'too_long'
                 WHEN mean_wlen < 4.0 THEN 'words_too_short'
                 WHEN mean_wlen > 12.0 THEN 'words_too_long'
                 WHEN n_stop < 1 THEN 'no_stopwords'
                 WHEN distinct_ratio < 0.3 THEN 'too_repetitive'
            END AS drop_reason FROM q)
    SELECT coalesce(drop_reason, 'kept') AS outcome,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc
    FROM r GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    TextOps.qualityFilter(Tables.documentsP(s, d), "text",
        minTokens = 20, maxTokens = 90, minMeanWlen = 4.0, maxMeanWlen = 12.0,
        minStopwords = 1, minDistinctRatio = 0.3)
      .groupBy(coalesce(col("drop_reason"), lit("kept")).as("outcome"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("outcome"))

  // ---------------------------------------------------- decontamination
  /** Benchmark decontamination — operators.TextOps.contamination:
    * `src0` plays the held-out eval set, every other source is training
    * corpus; a train doc is contaminated when it shares ≥ 1 distinct
    * word 5-gram with any eval doc. Reported per train source (doc
    * counts, contaminated counts, shared-shingle mass, rate). The eval
    * shingle set is broadcast; the corpus side never shuffles before
    * the per-doc distinct count of (rare) hits. */
  private val evalSource = "src0"
  private val decontamNgram = 5

  val decontaminate = Q("text_decontaminate", Some {
    val gram = (1 to decontamNgram).map(k => s"w[i+${k - 1}]").mkString(", ")
    s"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    esh AS (SELECT DISTINCT md5(concat_ws(' ', $gram)) AS sh
            FROM w, LATERAL unnest(generate_series(1, len(w) - ${decontamNgram - 1})) AS t(i)
            WHERE source = '$evalSource'),
    tsh AS (SELECT doc_id, md5(concat_ws(' ', $gram)) AS sh
            FROM w, LATERAL unnest(generate_series(1, len(w) - ${decontamNgram - 1})) AS t(i)
            WHERE source <> '$evalSource'),
    hits AS (SELECT doc_id, count(DISTINCT sh) AS n_shared
             FROM tsh JOIN esh USING (sh) GROUP BY 1)
    SELECT d.source, count(*) AS n_docs,
           CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST(sum(coalesce(h.n_shared, 0)) AS BIGINT) AS shared_shingles,
           round(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
             AS contamination_rate
    FROM documents d LEFT JOIN hits h USING (doc_id)
    WHERE d.source <> '$evalSource'
    GROUP BY 1 ORDER BY 1"""
  }, headline = true)((s, d) => {
    val docs = Tables.documentsP(s, d)
    val train = docs.filter(col("source") =!= evalSource)
    val flags = TextOps.contamination(train,
      docs.filter(col("source") === evalSource), "doc_id", "text", decontamNgram)
    train.join(flags, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_shared").isNotNull, 1L).otherwise(0L)).as("n_contaminated"),
        sum(coalesce(col("n_shared"), lit(0L))).as("shared_shingles"))
      .withColumn("contamination_rate",
        round(col("n_contaminated").cast("double") / col("n_docs"), 6))
      .orderBy("source")
  })

  // ------------------------------------------------- repetition signals
  /** Intra-document repetition signals — operators.TextOps
    * .repetitionSignals (Gopher-style boilerplate/spam detectors) —
    * rolled up per source with flag counts at fixed thresholds. The
    * per-doc fractions are exact small-integer ratios (identical IEEE
    * division on both engines); the per-source means go through the
    * DECIMAL stable-sum so accumulation order cannot perturb the 6-dp
    * rounding. */
  private val topBigramMax = 0.12
  private val dupTrigramMax = 0.10

  val repetition = Q("text_repetition_signals", Some(s"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
               FROM documents WHERE len(string_split(text, ' ')) >= 3),
    bi AS (SELECT doc_id, source, concat_ws(' ', w[i], w[i+1]) AS g
           FROM w, LATERAL unnest(generate_series(1, len(w) - 1)) AS t(i)),
    bic AS (SELECT doc_id, source, g, count(*) AS c FROM bi GROUP BY 1, 2, 3),
    bfrac AS (SELECT doc_id, source, max(c)::DOUBLE / sum(c) AS top_bigram_frac
              FROM bic GROUP BY 1, 2),
    tri AS (SELECT doc_id, concat_ws(' ', w[i], w[i+1], w[i+2]) AS g
            FROM w, LATERAL unnest(generate_series(1, len(w) - 2)) AS t(i)),
    tric AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
    tfrac AS (SELECT doc_id,
                     sum(CASE WHEN c >= 2 THEN c ELSE 0 END)::DOUBLE / sum(c) AS dup_trigram_frac
              FROM tric GROUP BY 1),
    j AS (SELECT b.source, b.top_bigram_frac, t.dup_trigram_frac
          FROM bfrac b JOIN tfrac t USING (doc_id))
    SELECT source, count(*) AS n_docs,
           round(CAST(SUM(CAST(top_bigram_frac AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
             AS avg_top_bigram_frac,
           round(CAST(SUM(CAST(dup_trigram_frac AS DECIMAL(28,6))) AS DOUBLE) / count(*), 6)
             AS avg_dup_trigram_frac,
           CAST(sum(CASE WHEN top_bigram_frac > $topBigramMax
                         OR dup_trigram_frac > $dupTrigramMax THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged
    FROM j GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    import graft.functions.Deterministic.stableSum
    TextOps.repetitionSignals(Tables.documentsP(s, d), "doc_id", "text",
        carry = Seq("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(stableSum(col("top_bigram_frac")) / count(lit(1)), 6)
          .as("avg_top_bigram_frac"),
        round(stableSum(col("dup_trigram_frac")) / count(lit(1)), 6)
          .as("avg_dup_trigram_frac"),
        sum(when(col("top_bigram_frac") > topBigramMax ||
          col("dup_trigram_frac") > dupTrigramMax, 1L).otherwise(0L)).as("n_flagged"))
      .orderBy("source")
  })

  // ------------------------------------------------ robust outliers
  /** Median/MAD length-outlier gate — operators.TextOps
    * .robustLengthOutliers: exact lower median and MAD of the token
    * count per source (f10 histogram form — rank windows over the
    * bounded value domain, all integer arithmetic), docs beyond
    * 3×MAD flagged. The oracle replays it with plain rank-over-rows
    * windows; both sides agree exactly because nothing is
    * interpolated. */
  val lengthOutliers = Q("text_length_outliers", Some("""
    WITH l AS (SELECT doc_id, source, len(string_split(text, ' ')) AS nt FROM documents),
    r1 AS (SELECT source, nt, row_number() OVER (PARTITION BY source ORDER BY nt, doc_id) AS rn,
                  count(*) OVER (PARTITION BY source) AS n
           FROM l),
    med AS (SELECT source, nt AS med FROM r1 WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)),
    d AS (SELECT l.doc_id, l.source, l.nt, m.med, abs(l.nt - m.med) AS dv
          FROM l JOIN med m USING (source)),
    r2 AS (SELECT source, dv, row_number() OVER (PARTITION BY source ORDER BY dv, doc_id) AS rn,
                  count(*) OVER (PARTITION BY source) AS n
           FROM d),
    mad AS (SELECT source, dv AS mad FROM r2 WHERE rn = CAST(ceil(0.5 * n) AS BIGINT))
    SELECT d.source, count(*) AS n_docs,
           max(d.med) AS median_tok, max(mad.mad) AS mad_tok,
           CAST(sum(CASE WHEN d.dv > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (source)
    GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    TextOps.robustLengthOutliers(Tables.documentsP(s, d), "source", "doc_id", "text")
      .orderBy("source"))

  // ------------------------------------------------------ vocabulary
  /** Corpus-composition report — operators.TextOps.vocabStats:
    * vocabulary size, token mass, hapax count and type-token ratio per
    * source. All-integer until the final exact division. */
  val vocab = Q("text_vocab_stats", Some("""
    WITH tc AS (SELECT source, tok, count(*) AS c
                FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY 1, 2)
    SELECT source,
           count(*) AS vocab,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           round(count(*)::DOUBLE / sum(c), 6) AS type_token_ratio
    FROM tc GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    TextOps.vocabStats(Tables.documentsP(s, d), "source", "text")
      .orderBy("source"))

  // -------------------------------------------------- normalization
  /** Canonical text normalization (operators.TextOps.normalize) as a
    * per-source audit: how many docs change under lowercase+whitespace
    * canonicalization, and how many additional exact-dup collapses the
    * normalization buys (distinct raw vs distinct normalized) — the
    * standard pre-dedup cleanup decision report. Row-local projection
    * + one aggregation. */
  val normalizeAudit = Q("text_normalize", Some("""
    WITH n AS (SELECT source, text,
                      trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
               FROM documents WHERE text IS NOT NULL)
    SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN nt <> text THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           count(DISTINCT text) AS n_distinct_raw,
           count(DISTINCT nt) AS n_distinct_norm,
           count(DISTINCT text) - count(DISTINCT nt) AS dedup_gain
    FROM n GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    TextOps.normalize(Tables.documentsP(s, d).filter(col("text").isNotNull), "text")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("norm_text") =!= col("text"), 1L).otherwise(0L)).as("n_changed"),
        countDistinct(col("text")).as("n_distinct_raw"),
        countDistinct(col("norm_text")).as("n_distinct_norm"))
      .withColumn("dedup_gain", col("n_distinct_raw") - col("n_distinct_norm"))
      .orderBy("source"))

  // ------------------------------------------------------ OOV rate
  /** Tokenizer-budget planning (operators.TextOps.oovRate): per-source
    * out-of-vocabulary token fraction under a top-16 frequency vocab
    * (16 of the corpus's ~31 tokens, so truncation is visible). Vocab
    * ranked (count desc, token asc) on the vocab-sized frame; scoring
    * is a broadcast LEFT join — the corpus is never shuffled by
    * token. */
  private val oovV = 16

  val oov = Q("text_oov_rate", Some(s"""
    WITH toks AS (SELECT source, unnest(string_split(text, ' ')) AS tok
                  FROM documents WHERE text IS NOT NULL),
    v AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
    top AS (SELECT tok FROM v
            QUALIFY row_number() OVER (ORDER BY cnt DESC, tok) <= $oovV)
    SELECT source, count(*) AS n_tokens,
           CAST(sum(CASE WHEN top.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN top.tok IS NULL THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS oov_rate
    FROM toks LEFT JOIN top ON toks.tok = top.tok
    GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    TextOps.oovRate(Tables.documentsP(s, d), "source", "text", oovV)
      .orderBy("source"))

  // ------------------------------------------------ n-gram novelty
  /** N-gram novelty score — operators.TextOps.ngramNovelty: the
    * fraction of each document's distinct word trigrams appearing in
    * NO other document. The positive complement of the dedup family
    * (what a doc ADDS, not what it repeats) and the crawl-saturation
    * signal when tracked over time. One shingle pass + gram-keyed df
    * window + doc roll-up; the oracle replays the identical md5
    * shingles (parity proven by the ngram-Jaccard gate) with a df
    * join. All-integer until the one rounded ratio. */
  val novelty = Q("text_ngram_novelty", Some("""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents WHERE len(string_split(text, ' ')) >= 3),
    g AS (SELECT DISTINCT doc_id, md5(array_to_string(w[t.i + 1 : t.i + 3], ' ')) AS sh
          FROM w, LATERAL unnest(generate_series(0, len(w) - 3)) AS t(i)),
    d AS (SELECT sh, count(*) AS df FROM g GROUP BY 1)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
             AS novelty
    FROM g JOIN d USING (sh) GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    TextOps.ngramNovelty(Tables.documentsP(s, d), "doc_id", "text", n = 3)
      .orderBy("doc_id"))

  // ------------------------------------------------ bigram perplexity
  /** CCNet-style perplexity filter signal — operators.TextOps
    * .bigramLogprob: per-document mean bigram NLL (add-½ smoothing
    * over corpus counts) and perplexity. Too-improbable → garble;
    * too-probable → template. The oracle replays the bigram stream,
    * both count tables, the corpus vocab size, the rounded-then-
    * DECIMAL-summed per-position NLLs and the exp-of-rounded-mean. */
  private[queries] val ppxAlpha = 0.5

  /** The bigram-NLL oracle CTE chain (everything after WITH, ending at
    * the per-doc frame `p` = (doc_id, n_bigrams, avg_nll)) — shared
    * verbatim between text_perplexity_bigram and QCuration's
    * curate_perplexity_prune so both replay the identical count
    * tables, smoothing and rounded-term DECIMAL sums. The 6-dp mean is
    * rounded in EXACT INTEGER arithmetic — (2K + n) // (2n) with
    * K = Σ nll·10⁶ — because rounding the double quotient splits
    * engines at multiply-created ties (DuckDB's value·10⁶ lands
    * exactly on .5 where Spark's exact-BigDecimal round sees …499…;
    * surfaced by sf1 doc family 885). Mirrors TextOps.bigramLogprob. */
  private[queries] lazy val pplDocCte: String = s"""w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
    bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
           FROM w, LATERAL unnest(generate_series(1, len(w) - 1)) AS t(i)),
    cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM cb GROUP BY 1),
    v AS (SELECT count(DISTINCT u) AS nv FROM (SELECT unnest(w) AS u FROM w)),
    s AS (SELECT bg.doc_id,
                 round(-ln((cb.c + $ppxAlpha) / (c1.c1 + $ppxAlpha * v.nv)), 6) AS nll
          FROM bg JOIN cb USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
    p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST((2 * CAST(SUM(CAST(nll AS DECIMAL(28,6))) * 1000000 AS BIGINT)
                       + count(*)) // (2 * count(*)) AS DOUBLE) / 1000000.0 AS avg_nll
          FROM s GROUP BY 1)"""

  val perplexity = Q("text_perplexity_bigram", Some(s"""
    WITH $pplDocCte
    SELECT doc_id, n_bigrams, avg_nll,
           round(exp(avg_nll), 4) AS ppl
    FROM p ORDER BY doc_id"""
  ))((s, d) =>
    TextOps.bigramLogprob(Tables.documentsP(s, d), "doc_id", "text", ppxAlpha,
        memoKey = Some(graft.operators.Memo.corpusKey("bglm", d)))
      .orderBy("doc_id"))

  // ------------------------------------------------------ BPE tokenizer
  /** Learned BPE merge list for the synthetic corpus — derived OFFLINE
    * with the reference Sennrich 2016 learner (iterative most-frequent
    * adjacent-pair merging over the sf0.01 word-frequency dict;
    * deterministic count-desc / pair-lexicographic tie-break), 24
    * merges. Committed as a constant the way a production pipeline
    * ships a tokenizer vocab file: tokenization must be frozen, not
    * re-learned per run, or token-denominated budgets drift between
    * runs. */
  private[queries] val bpeMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r", "s" -> "t",
    "m" -> "er", "a" -> "t", "l" -> "u", "a" -> "r", "p" -> "ar",
    "j" -> "o", "jo" -> "in", "a" -> "s", "as" -> "h", "h" -> "ash",
    "r" -> "ow", "at" -> "c", "atc" -> "h", "b" -> "atch", "a" -> "n",
    "c" -> "an", "s" -> "can", "c" -> "o", "c" -> "u")

  /** The DuckDB replay of [[TextOps.bpeEncoded]]'s merge chain over
    * `textExpr` — the same U+0001/U+0002 symbol encoding (E'\x01'/
    * E'\x02' literals), the same seeded regexp, the same replace per
    * merge in the same order. `replace` is non-overlapping
    * left-to-right in both engines, so the chains are byte-equal. */
  private[queries] def bpeEncDuck(textExpr: String,
      merges: Seq[(String, String)] = bpeMerges): String = {
    def w(x: String) = s"\\x01$x\\x02"
    // 's' (dotall) mirrors Spark's '(?s)(.)' seed: a newline character
    // must be wrapped as a symbol on BOTH engines (RE2's '.' skips it
    // without the flag — the one byte-equality hole in the replay)
    val seeded = s"regexp_replace($textExpr, '(.)', E'\\x01\\\\1\\x02', 'gs')"
    merges.foldLeft(seeded) { case (acc, (x, y)) =>
      s"replace($acc, E'${w(x)}${w(y)}', E'${w(x + y)}')"
    }
  }

  /** DuckDB replay of [[TextOps.bpeTokenCount]] — including the
    * empty-string edge: Spark's when-guard returns 0 there, while
    * len(string_split('', sep)) = 1, so the CASE mirrors the guard. */
  private[queries] def bpeCountDuck(textExpr: String,
      merges: Seq[(String, String)] = bpeMerges): String =
    s"(CASE WHEN length($textExpr) = 0 THEN 0 ELSE " +
      s"len(string_split(${bpeEncDuck(textExpr, merges)}, E'\\x02\\x01'))" +
      s" - (length($textExpr) - length(replace($textExpr, ' ', ''))) END)"

  /** Subword vocabulary audit — operators.TextOps.bpePieces over the
    * committed merge list: the corpus's 30 most frequent BPE pieces
    * with occurrence and document counts, the "is the tokenizer vocab
    * still a fit for this corpus" report. The whole tokenizer is a
    * flat codegen'd string chain (seed regexp + 24 replaces), so the
    * scan parallelizes embarrassingly; the aggregate shuffles only
    * distinct pieces (map-side combined) and the global top-30 is
    * TakeOrderedAndProject, never a full sort. */
  val bpeVocab = Q("text_bpe_vocab", Some(s"""
    WITH p AS (SELECT doc_id,
                 unnest(string_split(replace(${bpeEncDuck("text")}, E'\\x01', ''),
                        E'\\x02')) AS piece
               FROM documents WHERE text IS NOT NULL AND length(text) >= 1)
    SELECT piece, CAST(count(*) AS BIGINT) AS n_occ,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM p WHERE piece <> '' AND piece <> ' '
    GROUP BY 1 ORDER BY n_occ DESC, piece LIMIT 30"""
  ))((s, d) =>
    TextOps.bpePieces(Tables.documentsP(s, d), "doc_id", "text", bpeMerges)
      .groupBy("piece")
      .agg(count(lit(1)).as("n_occ"), countDistinct("doc_id").as("n_docs"))
      .orderBy(col("n_occ").desc, col("piece")).limit(30))

  /** Tokenizer fertility audit per language — pieces per word and
    * characters per piece under the committed merge list: the
    * multilingual-pipeline fairness check (a language whose fertility
    * is far above the corpus mean pays more sequence length per word
    * of content, skewing token-denominated budgets and pricing). All
    * sums are exact BIGINTs; ratios rounded once. */
  val bpeFertility = Q("text_bpe_fertility", Some(s"""
    WITH d AS (SELECT lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                 ${bpeCountDuck("text")} AS n_pieces,
                 CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars
               FROM documents WHERE text IS NOT NULL AND length(text) >= 1)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS words,
           CAST(sum(n_pieces) AS BIGINT) AS pieces,
           round(sum(n_pieces)::DOUBLE / sum(n_words), 6) AS fertility,
           round(sum(n_chars)::DOUBLE / sum(n_pieces), 6) AS chars_per_piece
    FROM d GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    Tables.documentsP(s, d)
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        TextOps.bpeTokenCount(col("text"), bpeMerges).as("n_pieces"),
        length(replace(col("text"), lit(" "), lit(""))).cast("long").as("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("words"), sum("n_pieces").as("pieces"),
        round(sum("n_pieces").cast("double") / sum("n_words"), 6).as("fertility"),
        round(sum("n_chars").cast("double") / sum("n_pieces"), 6).as("chars_per_piece"))
      .orderBy("lang"))

  // --------------------------------------- BPE compression curve
  /** Vocab-size planning curve: corpus compression at PREFIXES of the
    * committed merge chain (0, 6, 12, 18, 24 merges — BPE's merge
    * order IS its training order, so depth-d prefixes are exactly the
    * tokenizer at vocab size base+d). Reports token count, fertility
    * (pieces/word) and chars/piece per depth — where the curve
    * flattens is where additional vocab stops buying sequence length,
    * the number that sizes a production tokenizer BEFORE the expensive
    * full train. Depth 0 = character tokenization (pieces = chars)
    * anchors the curve.
    *
    * Plan: ONE corpus scan computes all five depth counts as sibling
    * codegen'd replace-chain columns (each depth's chain is a prefix
    * of the next — Spark evaluates them independently but all
    * row-local), one global aggregate, then a 5-element explode of the
    * 1-row totals into curve rows. No shuffle except the scalar
    * aggregate; depth fan-out never touches the corpus. */
  private val bpeDepths = Seq(0, 6, 12, 18, 24)

  val bpeCurve = Q("text_bpe_compression_curve", Some {
    val perDoc = bpeDepths.map(n =>
      s"${bpeCountDuck("text", bpeMerges.take(n))} AS p$n").mkString(", ")
    val sums = bpeDepths.map(n => s"CAST(sum(p$n) AS BIGINT) AS s$n").mkString(", ")
    val rows = bpeDepths.map(n => s"""
      SELECT CAST($n AS BIGINT) AS n_merges, s$n AS pieces,
             round(s$n::DOUBLE / w, 6) AS fertility,
             round(c::DOUBLE / s$n, 6) AS chars_per_piece FROM a""")
      .mkString(" UNION ALL ")
    s"""
    WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                      CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars,
                      $perDoc
               FROM documents WHERE text IS NOT NULL AND length(text) >= 1),
    a AS (SELECT CAST(sum(n_words) AS BIGINT) AS w,
                 CAST(sum(n_chars) AS BIGINT) AS c, $sums FROM d)
    SELECT * FROM ($rows) ORDER BY n_merges"""
  })((s, d) => {
    val base = Tables.documentsP(s, d)
      .filter(col("text").isNotNull && length(col("text")) >= 1)
      .select(Seq(
        size(split(col("text"), " ")).cast("long").as("n_words"),
        length(replace(col("text"), lit(" "), lit(""))).cast("long").as("n_chars")) ++
        bpeDepths.map(n =>
          TextOps.bpeTokenCount(col("text"), bpeMerges.take(n)).as(s"p$n")): _*)
    val agg = base.agg(
      sum("n_words").as("w"),
      sum("n_chars").as("c") +: bpeDepths.map(n => sum(s"p$n").as(s"s$n")): _*)
    agg.select(col("w"), col("c"),
        explode(array(bpeDepths.map(n =>
          struct(lit(n.toLong).as("n_merges"), col(s"s$n").as("pieces"))): _*)).as("e"))
      .select(col("e.n_merges").as("n_merges"), col("e.pieces").as("pieces"),
        round(col("e.pieces").cast("double") / col("w"), 6).as("fertility"),
        round(col("c").cast("double") / col("e.pieces"), 6).as("chars_per_piece"))
      .orderBy("n_merges")
  })

  // ---------------------------------------------- TF-IDF keywords
  /** Per-document keyword extraction (operators.TextOps.tfidfKeywords):
    * the top-3 smoothed-TF-IDF terms per document — the
    * metadata-tagging staple beside BM25's query-side ranking. Scores
    * round to 6 dp BEFORE the rank (the ln parity layer), the rank
    * window is document-partitioned, and ties break by term. */
  val keywords = Q("text_tfidf_keywords", Some("""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents WHERE text IS NOT NULL),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    n AS (SELECT count(*) AS nd FROM documents WHERE text IS NOT NULL),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    s AS (SELECT tf.doc_id, tf.term,
                 round(tf.tf * (ln((n.nd + 1.0) / (df.df + 1.0)) + 1.0), 6) AS score
          FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, rk, term, score FROM (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
      FROM s) WHERE rk <= 3 ORDER BY doc_id, rk"""
  ))((s, d) =>
    TextOps.tfidfKeywords(Tables.documentsP(s, d), "doc_id", "text", topK = 3,
        memoKey = Some(graft.operators.Memo.corpusKey("tfidf", d)))
      .orderBy("doc_id", "rk"))

  // ------------------------------------------------------ Zipf fit
  /** Frequency-spectrum health check (operators.TextOps.zipfFit):
    * per-source ln(count) ~ ln(rank) regression over the top-25
    * tokens (25 of the corpus's ~31, so truncation is exercised) —
    * the Zipf exponent a corpus-health dashboard watches next to the
    * type/token ratio. Rank is a source-PARTITIONED window (each sort
    * bounded by one source's vocabulary); regr outputs ride the l13
    * rounding convention (4 dp absorbs double accumulation order). */
  private val zipfN = 25

  val zipf = Q("text_zipf_fit", Some(s"""
    WITH tc AS (SELECT source, tok, count(*) AS c
                FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                      FROM documents WHERE text IS NOT NULL)
                GROUP BY 1, 2),
    top AS (SELECT source, c,
                   row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rnk
            FROM tc QUALIFY rnk <= $zipfN),
    m AS (SELECT source, count(*) AS n,
                 ${graft.functions.Deterministic.stableSumSql("ln(rnk)", 12)} AS sx,
                 ${graft.functions.Deterministic.stableSumSql("ln(c)", 12)} AS sy,
                 ${graft.functions.Deterministic.stableSumSql("ln(rnk) * ln(c)", 12)} AS sxy,
                 ${graft.functions.Deterministic.stableSumSql("ln(rnk) * ln(rnk)", 12)} AS sxx,
                 ${graft.functions.Deterministic.stableSumSql("ln(c) * ln(c)", 12)} AS syy
          FROM top GROUP BY 1),
    cc AS (SELECT source, n,
                  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_raw,
                  (n * sxy - sx * sy) * (n * sxy - sx * sy)
                    / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2_raw,
                  sx, sy
           FROM m)
    SELECT source, n AS n_types,
           round(slope_raw, 4) AS slope,
           round((sy - slope_raw * sx) / n, 4) AS intercept,
           round(r2_raw, 4) AS r2
    FROM cc ORDER BY 1"""
  ))((s, d) =>
    TextOps.zipfFit(Tables.documentsP(s, d), "source", "text", zipfN)
      .orderBy("source"))

  val all: Seq[Q] = Seq(tokenCount, quality, langId, fingerprint, bm25, hybridRrf,
    qualityGate, decontaminate, repetition, lengthOutliers, vocab, normalizeAudit,
    oov, novelty, bpeVocab, perplexity, bpeFertility, bpeCurve, zipf, keywords)
}
