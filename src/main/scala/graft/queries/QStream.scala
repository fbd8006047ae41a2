package graft.queries

import graft.streaming.StreamOps

/** Structured Streaming registry entries — bounded-replay deterministic,
  * so they pass through the same DuckDB oracle gate as the batch
  * operators (see graft.streaming.StreamOps for semantics).
  */
object QStream {

  /** Event-time tumbling window + 1-hour watermark, append mode: only
    * watermark-finalized windows are emitted. */
  val wm = Q("stream_watermark_window", Some("""
    WITH m AS (SELECT max(ts) AS mx FROM events)
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events, m
    GROUP BY 1, 2, m.mx
    HAVING window_start + INTERVAL '2 hour' <= m.mx
    ORDER BY 1, 2"""
  ))((s, d) => StreamOps.watermarkTumblingWindow(s, d))

  /** Stateful sessionization (flatMapGroupsWithState, 30-min gap) vs the
    * relational islands oracle. */
  val sess = Q("stream_sessionize_state", Some("""
    WITH e AS (SELECT user_id, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t FROM events),
    o AS (SELECT user_id, t,
                 CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
    g AS (SELECT user_id, t,
                 CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t
                                     ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
          FROM o)
    SELECT user_id, session_id, min(t) AS session_start, max(t) AS session_end,
           count(*) AS n_events
    FROM g GROUP BY 1, 2 ORDER BY 1, 2"""
  ))((s, d) => StreamOps.sessionize(s, d))

  /** Stream-stream interval join (watermarked both sides) vs the same
    * oracle as the batch range join j1 — identical window semantics,
    * streaming execution. */
  val ij = Q("stream_interval_join", Some(s"""
    WITH e AS (SELECT *, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t FROM events),
    trg AS (SELECT event_id AS trig_id, user_id, t AS trig_t FROM e WHERE event_type = 'purchase'),
    ser AS (SELECT user_id, t AS obs_t, value FROM e WHERE event_type = 'click')
    SELECT CAST(FLOOR((ser.obs_t - trg.trig_t) / 60.0) AS BIGINT) AS rel_bin,
           count(*) AS n,
           round(${graft.functions.Deterministic.stableSumSql("ser.value")} / count(ser.value), 4) AS avg_value,
           count(DISTINCT trg.trig_id) AS n_trials
    FROM ser JOIN trg ON ser.user_id = trg.user_id
      AND ser.obs_t >= trg.trig_t - 600 AND ser.obs_t <= trg.trig_t + 300
    GROUP BY 1 ORDER BY 1"""
  ))((s, d) => StreamOps.intervalJoin(s, d))

  /** Horizon-bounded streaming dedup (dropDuplicatesWithinWatermark)
    * vs the batch DISTINCT oracle — exact on bounded single-batch
    * replay; state bounded by the watermark horizon in live runs. */
  val dedup = Q("stream_dedup_watermark", Some("""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1 ORDER BY 1"""
  ))((s, d) => StreamOps.streamingDedup(s, d))

  /** LEFT-OUTER stream-stream interval join: the response-count
    * distribution over purchase triggers INCLUDING the zero bucket —
    * the null-padded rows only the watermark can emit. The oracle
    * replays the batch LEFT JOIN under the same closed-window guard
    * the streaming roll-up applies (see StreamOps.intervalJoinOuter). */
  val ijo = Q("stream_interval_join_outer", Some("""
    WITH e AS (SELECT *, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t FROM events),
    m AS (SELECT LEAST(
            (SELECT max(t) FROM e WHERE event_type = 'purchase'),
            (SELECT max(t) FROM e WHERE event_type = 'click')) AS mx),
    trg AS (SELECT event_id AS trig_id, user_id, t AS trig_t FROM e
            WHERE event_type = 'purchase'),
    ser AS (SELECT user_id, t AS obs_t FROM e WHERE event_type = 'click'),
    closed AS (SELECT trig_id, user_id, trig_t FROM trg, m
               WHERE trig_t + 301 <= mx - 3602),
    j AS (SELECT c.trig_id, CAST(count(s.obs_t) AS BIGINT) AS n_obs
          FROM closed c LEFT JOIN ser s ON s.user_id = c.user_id
            AND s.obs_t >= c.trig_t - 600 AND s.obs_t <= c.trig_t + 300
          GROUP BY 1)
    SELECT n_obs, count(*) AS n_trigs FROM j GROUP BY 1 ORDER BY 1"""
  ))((s, d) => StreamOps.intervalJoinOuter(s, d))

  /** Ingest-time near-dup: a documents STREAM (the arriving crawl
    * shard — sources src0–src3, the incremental-dedup increment)
    * band-joined against the STATIC old-corpus minhash index, Jaccard
    * verified in-stream — StreamOps.streamingNearDup. Stateless
    * stream-static equi-join: no watermark, no state store; the oracle
    * replays the identical signature/band chain restricted to new×old
    * pairs with the bucket-population guard applied to the OLD index
    * (index-build-time semantics), which on this corpus yields exactly
    * the new×old slice of dedup_incremental_minhash. */
  val nearDup = Q("stream_neardup_ingest", Some {
    import graft.operators.Dedup
    val newIn = QSim.incNewSources.map(s => s"'$s'").mkString(", ")
    val nHash = QSim.nHash
    val bandRows = QSim.bandRows
    val mhCols = (0 until nHash).map(i =>
      s"min((h1 * ${Dedup.mixA(i)} + ${Dedup.mixB(i)}) " +
        s"% ${Dedup.mixM}) AS mh$i").mkString(", ")
    val bandSel = (0 until nHash / bandRows).map { b =>
      val ks = (0 until bandRows).map(r => s"mh${b * bandRows + r}").mkString(", ")
      s"SELECT doc_id, is_new, $b AS band, concat_ws('_', $ks) AS bkey FROM sig"
    }.mkString(" UNION ALL ")
    s"""
    WITH w AS (SELECT doc_id, coalesce(source IN ($newIn), FALSE) AS is_new,
                      string_split(text, ' ') AS w
               FROM documents WHERE len(string_split(text, ' ')) >= 3),
    shs AS (SELECT doc_id, is_new, ${QSim.shinglesSqlDuck} AS s FROM w),
    ex AS (SELECT doc_id, is_new, unnest(s) AS sh FROM shs),
    hx AS (SELECT doc_id, is_new, ${QSim.h1Duck} AS h1 FROM ex),
    sig AS (SELECT doc_id, is_new, $mhCols FROM hx GROUP BY 1, 2),
    bands AS ($bandSel),
    oldb AS (SELECT doc_id, band, bkey FROM (
               SELECT doc_id, band, bkey,
                      count(*) OVER (PARTITION BY band, bkey) AS bc
               FROM bands WHERE NOT is_new)
             WHERE bc <= ${Dedup.defaultMaxBandBucket}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_old
             FROM bands a JOIN oldb b
               ON a.bkey = b.bkey AND a.band = b.band AND a.is_new),
    ver AS (SELECT c.doc_new, c.doc_old,
                   len(list_intersect(sa.s, sb.s))::DOUBLE
                     / len(list_distinct(sa.s || sb.s)) AS j
            FROM cand c JOIN shs sa ON c.doc_new = sa.doc_id
                        JOIN shs sb ON c.doc_old = sb.doc_id)
    SELECT doc_new, doc_old, round(j, 6) AS jaccard
    FROM ver WHERE j >= 0.5 ORDER BY 1, 2"""
  })((s, d) => StreamOps.streamingNearDup(s, d, QSim.incNewSources,
    nHash = QSim.nHash, bandRows = QSim.bandRows, threshold = 0.5,
    // static-index half served from the family-shared memoized
    // signature table (QSim.sigTab); the arriving stream side keeps
    // hashing inline — rows that have not arrived cannot be memoized
    sigTable = Some(QSim.sigTab(s, d))))

  val all: Seq[Q] = Seq(wm, sess, ij, dedup, ijo, nearDup)
}
