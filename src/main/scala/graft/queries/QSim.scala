package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deduplication + similarity-search operators — the LLM-training-data
  * pipeline extensions (north star §M5): exact dedup, MinHash+LSH,
  * SimHash, blocked n-gram Jaccard, embedding near-dup and ANN top-k
  * with an LSH-bucketed scale path.
  *
  * All scoring is pure Catalyst expression work (array lambdas + md5 —
  * no UDFs, codegen-friendly) built on cross-engine primitives so every
  * operator has an exact DuckDB oracle. Hash basis: md5 hex strings
  * (identical bytes→hex in Spark and DuckDB); pseudo-random projections:
  * the engine's deterministic LCG hash (functions.Deterministic), plain
  * arithmetic on both sides.
  *
  * Scale design (100 TB): every pairwise operator is *blocked* — banding
  * (MinHash), signature-prefix buckets (SimHash, ANN) or natural keys
  * (label, lang × length bucket) — so the self-join never goes quadratic
  * in the corpus, only within buckets. The brute-force variants exist as
  * correctness baselines for the bucketed ones.
  */
object QSim {

  private val shinglesSqlDuck =
    "list_distinct([md5(concat_ws(' ', w[i], w[i+1], w[i+2])) for i in generate_series(1, len(w)-2)])"

  /** Row-wise distinct word-3-gram shingles: explode the start indices,
    * md5 per ROW with ordinary (whole-stage-codegen'd) expressions, then
    * distinct. The equivalent `transform(sequence(...), i -> md5(...))`
    * lambda runs on Spark's interpreted higher-order-function path — no
    * codegen — measured 7× slower at sf0.1. Input must carry
    * (doc_id, w); output (doc_id, sh) distinct. */
  private def shingleRows(docs: org.apache.spark.sql.DataFrame,
      carry: Seq[String]): org.apache.spark.sql.DataFrame =
    docs
      .select((carry.map(col) :+ col("w") :+
        explode(expr("sequence(0, size(w) - 3)")).as("i")): _*)
      .select((carry.map(col) :+
        expr("md5(encode(concat_ws(' ', w[i], w[i+1], w[i+2]), 'UTF-8'))").as("sh")): _*)
      .distinct()

  // -------------------------------------------------------- exact dedup
  /** Exact dedup via content hash: per source, total vs distinct-text
    * counts and the surviving (min doc_id) representative count.
    * Spark shape: hash-groupBy — map-side partial agg, one shuffle. */
  val exact = Q("dedup_exact", Some("""
    WITH h AS (SELECT doc_id, source, md5(text) AS th FROM documents),
    k AS (SELECT source, th, count(*) AS copies, min(doc_id) AS keep_id FROM h GROUP BY 1, 2)
    SELECT source, sum(copies) AS n_docs, count(*) AS n_unique,
           sum(copies) - count(*) AS n_removed, min(keep_id) AS first_keep
    FROM k GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    Tables.documentsP(s, d)
      .select(col("doc_id"), col("source"), md5(encode(col("text"), "UTF-8")).as("th"))
      .groupBy("source", "th")
      .agg(count(lit(1)).as("copies"), min("doc_id").as("keep_id"))
      .groupBy("source")
      .agg(sum("copies").as("n_docs"), count(lit(1)).as("n_unique"),
        (sum("copies") - count(lit(1))).as("n_removed"), min("keep_id").as("first_keep"))
      .orderBy("source"))

  // -------------------------------------------------------- MinHash LSH
  /** MinHash + LSH banding near-dup detection, end to end:
    * shingle → 12 seeded minhashes → 6 bands of 2 → band-bucket join →
    * candidate pairs → exact Jaccard verify ≥ 0.5.
    * The band join keys on md5(band minhashes), so candidate generation
    * is an equi-join (shuffle on band key — never a cross join). */
  private val nHash = 12
  private val bandRows = 2

  val minhashLsh = Q("dedup_minhash_lsh", Some {
    val mhCols = (0 until nHash).map(i =>
      s"min(md5('$i:' || sh)) AS mh$i").mkString(", ")
    val bandSel = (0 until nHash / bandRows).map { b =>
      val ks = (0 until bandRows).map(r => s"mh${b * bandRows + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band, md5($ks) AS bkey FROM sig"
    }.mkString(" UNION ALL ")
    s"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE len(string_split(text, ' ')) >= 3),
    shs AS (SELECT doc_id, $shinglesSqlDuck AS s FROM w),
    ex AS (SELECT doc_id, unnest(s) AS sh FROM shs),
    sig AS (SELECT doc_id, $mhCols FROM ex GROUP BY 1),
    bands AS ($bandSel),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.band = b.band AND a.doc_id < b.doc_id),
    ver AS (SELECT c.doc_a, c.doc_b,
                   len(list_intersect(sa.s, sb.s))::DOUBLE / len(list_distinct(sa.s || sb.s)) AS j
            FROM cand c JOIN shs sa ON c.doc_a = sa.doc_id JOIN shs sb ON c.doc_b = sb.doc_id)
    SELECT doc_a, doc_b, round(j, 6) AS jaccard FROM ver WHERE j >= 0.5 ORDER BY 1, 2"""
  })((s, d) => {
    val w = Tables.documentsP(s, d)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
    // The shingle table feeds four consumers (both sides of the band
    // self-join and both sides of the Jaccard verify). Catalyst does
    // not CSE across join branches, so persist it — compute-once,
    // reuse (SURVEY §4); spills to disk if the corpus outgrows memory.
    val ex = shingleRows(w, Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // set-valued form for the Jaccard verify (order irrelevant: only
    // intersection/union sizes are consumed)
    val shs = ex.groupBy("doc_id").agg(collect_set(col("sh")).as("s"))
    val mhCols = (0 until nHash).map(i =>
      min(md5(encode(concat(lit(s"$i:"), col("sh")), "UTF-8"))).as(s"mh$i"))
    val sig = ex.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
    // Bands via one explode, not a 6-way union: a union of per-band
    // selects makes every branch recompute the whole shingle→minhash
    // pipeline; explode emits all bands in a single pass over sig.
    val bandStructs = (0 until nHash / bandRows).map { b =>
      val ks = (0 until bandRows).map(r => col(s"mh${b * bandRows + r}"))
      struct(lit(b).as("band"), md5(encode(concat(ks: _*), "UTF-8")).as("bkey"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bkey") === col("b.bkey") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val sa = shs.select(col("doc_id").as("doc_a"), col("s").as("s_a"))
    val sb = shs.select(col("doc_id").as("doc_b"), col("s").as("s_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("j",
        size(array_intersect(col("s_a"), col("s_b"))).cast("double") /
          size(array_distinct(concat(col("s_a"), col("s_b")))))
      .filter(col("j") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  })

  // ------------------------------------------------------------ SimHash
  /** Weighted 32-bit SimHash per document; near-dup pairs = same
    * top-16-bit bucket AND Hamming distance ≤ 2. Bit source: first 8 hex
    * chars of each token's md5; weight = token multiplicity. */
  private def simhashDuck = {
    // per (doc, bit): sum of +-weight, sign -> bit
    val bitSum = (0 until 32).map { b =>
      s"sum(CASE WHEN (strpos('0123456789abcdef', h[${b / 4 + 1}]) - 1) // ${Seq(8, 4, 2, 1)(b % 4)} % 2 = 1 THEN cnt ELSE -cnt END) AS b$b"
    }.mkString(", ")
    val hashVal = (0 until 32).map(b => s"(CASE WHEN b$b >= 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    tc AS (SELECT doc_id, t, count(*)::BIGINT AS cnt FROM tok GROUP BY 1, 2),
    th AS (SELECT doc_id, cnt, string_split(substr(md5(t), 1, 8), '') AS h FROM tc),
    bits AS (SELECT doc_id, $bitSum FROM th GROUP BY 1),
    sh AS (SELECT doc_id, $hashVal AS simhash FROM bits)"""
  }

  val simhash = Q("dedup_simhash", Some(s"""
    ${simhashDuck},
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 bit_count(xor(a.simhash, b.simhash)) AS hamming
          FROM sh a JOIN sh b
            ON a.simhash // 65536 = b.simhash // 65536 AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 2 ORDER BY 1, 2"""
  ))((s, d) => {
    val tc = Tables.documentsP(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
    val th = tc.withColumn("h", substring(md5(encode(col("t"), "UTF-8")), 1, 8))
    val bitSums = (0 until 32).map { b =>
      val bit = expr(
        s"(((locate(substring(h, ${b / 4 + 1}, 1), '0123456789abcdef') - 1) div ${Seq(8, 4, 2, 1)(b % 4)}) % 2)")
      sum(when(bit === 1, col("cnt")).otherwise(-col("cnt"))).as(s"b$b")
    }
    val bits = th.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    // Persisted: both sides of the bucket self-join reuse the signature.
    val sh = bits.select(col("doc_id"),
      (0 until 32).map(b => when(col(s"b$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.as("a").join(sh.as("b"),
        expr("(a.simhash div 65536) = (b.simhash div 65536)") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= 2)
      .orderBy("doc_a", "doc_b")
  })

  // ------------------------------------------------ blocked n-gram Jaccard
  /** Classic blocked near-dup: candidates share (lang, length bucket),
    * verify exact word-3-gram Jaccard ≥ 0.8. Complements MinHash: same
    * verify metric, different candidate generation.
    *
    * Physical plan: inverted-index join — explode distinct shingles,
    * equi-join on (shingle, lang, lb), count shared shingles per pair,
    * J = inter/(nA+nB−inter). Result-identical to the all-pairs-in-block
    * form (a J ≥ 0.8 pair shares ≥ 1 shingle) but the join output is
    * Σ df(shingle)² instead of Σ block² — near-linear in the corpus
    * because 3-gram document frequency is bounded, so it survives a
    * 100× scale-up where the naive block self-join (measured 74 s at
    * sf0.1, 47 % of the whole bench) goes quadratic. */
  val ngramJaccard = Q("dedup_ngram_jaccard", Some(s"""
    WITH w AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok,
                      string_split(text, ' ') AS w
               FROM documents WHERE len(string_split(text, ' ')) >= 3),
    shs AS (SELECT doc_id, lang, n_tok // 40 AS lb, $shinglesSqlDuck AS s FROM w),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) AS j
          FROM shs a JOIN shs b
            ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, round(j, 6) AS jaccard FROM p WHERE j >= 0.8 ORDER BY 1, 2"""
  ))((s, d) => {
    val docs = Tables.documentsP(s, d)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .withColumn("lb", (size(col("w")).cast("long").divide(lit(40))).cast("long"))
    // Persisted: the inverted index feeds both sides of the self-join
    // (broadcast build + probe are separate computations otherwise).
    // Per-doc distinct-shingle count n rides along via a doc-partitioned
    // window so the Jaccard denominator needs no second scan.
    val ex = shingleRows(docs, Seq("doc_id", "lang", "lb"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ex.as("a").join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.lang") === col("b.lang") &&
          col("a.lb") === col("b.lb") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("j"))
      .filter(col("j") >= 0.8)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  })

  // ---------------------------------------------- embedding near-dup
  /** Embedding-cosine near-dup, label-blocked: pairs within the same
    * label with cosine ≥ 0.35.
    *
    * The oracle's dot products are UNROLLED in the same left-to-right
    * order as the Spark expression (`dotExpr`): `list_sum` is free to
    * use a different summation algorithm (pairwise/SIMD), and a 1-ULP
    * difference flips a rounded digit when a cosine lands near a 6-dp
    * boundary (observed at sf0.001). With an identical addition chain
    * on identical exact float×float products, the doubles are
    * bit-identical by construction. */
  private def duckDot(x: String, y: String) =
    "(0" + (1 to 64).map(i => s" + ($x[$i] * $y[$i])").mkString + ")"

  private val cosDuck =
    s"""${duckDot("a.v", "b.v")} /
       (sqrt(${duckDot("a.v", "a.v")}) * sqrt(${duckDot("b.v", "b.v")}))"""

  /** 64-term dot product UNROLLED into a flat expression: ordinary
    * codegen'd arithmetic instead of the interpreted `aggregate`
    * higher-order lambda (measured ~7× on the pairwise queries).
    * `0D + t1 + t2 + …` reproduces the fold's left-to-right accumulation
    * exactly, so values stay bit-identical to the DuckDB `list_sum`. */
  private val dotExpr = (x: String, y: String) =>
    // outer parens are load-bearing: without them a following "/ norm"
    // binds to the LAST term only (caught via .explain at sf0.001)
    "(0D" + (1 to 64).map(i =>
      s" + (CAST(element_at($x, $i) AS DOUBLE) * CAST(element_at($y, $i) AS DOUBLE))").mkString + ")"

  private def cosSpark = {
    val dot = dotExpr("a.v", "b.v")
    val na = s"sqrt(${dotExpr("a.v", "a.v")})"
    val nb = s"sqrt(${dotExpr("b.v", "b.v")})"
    expr(s"$dot / ($na * $nb)")
  }

  val embedNearDup = Q("dedup_embedding_cosine", Some(s"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cosDuck AS c
          FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, round(c, 6) AS cos FROM p WHERE c >= 0.35 ORDER BY 1, 2"""
  ))((s, d) => {
    val e = Tables.embeddingsP(s, d).select(col("vec_id"), col("label"), col("embedding").as("v"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), cosSpark.as("c"))
      .filter(col("c") >= 0.35)
      .select(col("vec_a"), col("vec_b"), round(col("c"), 6).as("cos"))
      .orderBy("vec_a", "vec_b")
  })

  // ------------------------------------------------- brute-force ANN
  /** Brute-force cosine top-3 for a fixed query set (vec_id < 8) —
    * the exactness baseline for the LSH-bucketed path. Broadcast the
    * tiny query side; rank with (rounded cos DESC, vec_id) so the
    * cut is engine-independent. */
  val annTopk = Q("sim_cosine_topk", Some(s"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 8),
    sc AS (SELECT a.vec_id AS query_id, b.vec_id AS cand_id, round($cosDuck, 6) AS c
           FROM q a JOIN e b ON a.vec_id <> b.vec_id),
    r AS (SELECT query_id, cand_id, c,
                 row_number() OVER (PARTITION BY query_id ORDER BY c DESC, cand_id) AS rk
          FROM sc)
    SELECT query_id, rk, cand_id, c AS cos FROM r WHERE rk <= 3 ORDER BY 1, 2"""
  ), headline = true)((s, d) => {
    val e = Tables.embeddingsP(s, d).select(col("vec_id"), col("embedding").as("v"))
    val q = e.filter(col("vec_id") < 8)
    val sc = broadcast(q).as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("cand_id"),
        round(cosSpark, 6).as("c"))
    val w = Window.partitionBy("query_id").orderBy(col("c").desc, col("cand_id"))
    sc.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk"), col("cand_id"), col("c").as("cos"))
      .orderBy("query_id", "rk")
  })

  // ------------------------------------------------- LSH-bucketed ANN
  /** Scale path: 8-bit random-hyperplane LSH bucket per vector
    * (deterministic LCG projection signs), then top-1 within the query's
    * bucket. At 100 TB the bucket join replaces the full cross join;
    * recall is tunable via bits/tables. Emits per-query bucket size +
    * best in-bucket neighbor. */
  private val nBits = 8
  /** sign h(j,i) in {+1,-1}, from the engine's LCG hash of key j*64+i. */
  private def signSql(j: String, i: String, div: String) =
    s"(CASE WHEN (((($j * 64 + $i) * CAST(1103515245 AS BIGINT) + 104729) $div 131072) % 2) = 0 THEN 1.0 ELSE -1.0 END)"

  // Same unrolled ±-chain as the Spark side (bucketSpark below): the
  // hyperplane sign sequence is precomputed from the LCG, and the
  // addition order matches exactly so the projection double — and hence
  // the bucket — is bit-identical in both engines.
  private val bucketDuck = {
    val bits = (0 until nBits).map { j =>
      val proj = "0" + (1 to 64).map { i =>
        val op = if (signVal(j, i) > 0) "+" else "-"
        s" $op v[$i]"
      }.mkString
      s"(CASE WHEN ($proj) >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    s"($bits)"
  }

  /** Same hyperplane-sign sequence as the SQL CASE, precomputed (the
    * LCG is pure integer arithmetic), emitted as an unrolled ±-sum so
    * the projection is codegen'd instead of an interpreted fold. */
  private def signVal(j: Int, i: Int): Double =
    if ((((j * 64L + i) * 1103515245L + 104729L) / 131072L) % 2 == 0) 1.0 else -1.0

  private val bucketSpark = {
    val bits = (0 until nBits).map { j =>
      val proj = "0D" + (1 to 64).map { i =>
        val op = if (signVal(j, i) > 0) "+" else "-"
        s" $op CAST(element_at(v, $i) AS DOUBLE)"
      }.mkString
      s"(CASE WHEN ($proj) >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    expr(s"($bits)")
  }

  val annLsh = Q("sim_ann_lsh_bucket", Some(s"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bk AS (SELECT vec_id, v, $bucketDuck AS bucket FROM e),
    q AS (SELECT * FROM bk WHERE vec_id < 8),
    sc AS (SELECT a.vec_id AS query_id, a.bucket, b.vec_id AS cand_id, round($cosDuck, 6) AS c
           FROM q a JOIN bk b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
    r AS (SELECT query_id, bucket, count(*) OVER (PARTITION BY query_id) AS n_cand, cand_id, c,
                 row_number() OVER (PARTITION BY query_id ORDER BY c DESC, cand_id) AS rk
          FROM sc)
    SELECT query_id, bucket, n_cand, cand_id AS top1_id, c AS top1_cos
    FROM r WHERE rk = 1 ORDER BY 1"""
  ))((s, d) => {
    val e = Tables.embeddingsP(s, d).select(col("vec_id"), col("embedding").as("v"))
    val bk = e.withColumn("bucket", bucketSpark)
    val q = bk.filter(col("vec_id") < 8)
    val sc = broadcast(q).as("a").join(bk.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("a.bucket").as("bucket"),
        col("b.vec_id").as("cand_id"), round(cosSpark, 6).as("c"))
    val wN = Window.partitionBy("query_id")
    val wR = Window.partitionBy("query_id").orderBy(col("c").desc, col("cand_id"))
    sc.withColumn("n_cand", count(lit(1)).over(wN))
      .withColumn("rk", row_number().over(wR))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("bucket"), col("n_cand"),
        col("cand_id").as("top1_id"), col("c").as("top1_cos"))
      .orderBy("query_id")
  })

  // ----------------------------------------------------- IVF ANN
  /** IVF-style ANN, the second scale path besides LSH: a seeded coarse
    * quantizer (16 centroid vectors picked by the deterministic LCG
    * hash — one assignment pass, no Lloyd iterations, so the oracle can
    * replay it), every vector assigned to its nearest centroid, queries
    * probe their 2 nearest cells and rank candidates within them. At
    * scale the inverted lists turn the full cross join into a
    * cells-probed equi-join; recall is tunable via nlist/nprobe. */
  private def cosD(x: String, y: String) =
    s"""${duckDot(x, y)} /
       (sqrt(${duckDot(x, x)}) * sqrt(${duckDot(y, y)}))"""

  private def cosS(x: String, y: String) = {
    val dot = dotExpr(x, y)
    expr(s"$dot / (sqrt(${dotExpr(x, x)}) * sqrt(${dotExpr(y, y)}))")
  }

  private val nList = 16
  private val nProbe = 2
  private val ivfSeed = 2024L

  val annIvf = Q("sim_ann_ivf", Some(s"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
             ORDER BY ${graft.functions.Deterministic.hrandSql("vec_id", ivfSeed)}, vec_id
             LIMIT $nList),
    ac AS (SELECT e.vec_id, cent.cent_id, round(${cosD("e.v", "cent.cv")}, 6) AS c
           FROM e CROSS JOIN cent),
    asg AS (SELECT vec_id, cent_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
            FROM ac),
    a1 AS (SELECT vec_id AS cand_id, cent_id FROM asg WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cent_id FROM asg WHERE rn <= $nProbe AND vec_id < 8),
    cand AS (SELECT p.query_id, a.cand_id FROM probes p
             JOIN a1 a ON p.cent_id = a.cent_id AND a.cand_id <> p.query_id),
    sc AS (SELECT c.query_id, c.cand_id, round(${cosD("q.v", "x.v")}, 6) AS cs
           FROM cand c JOIN e q ON c.query_id = q.vec_id
                       JOIN e x ON c.cand_id = x.vec_id),
    r AS (SELECT query_id, cand_id, cs,
                 row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, cand_id) AS rk
          FROM sc)
    SELECT query_id, rk, cand_id, cs AS cos FROM r WHERE rk <= 3 ORDER BY 1, 2"""
  ))((s, d) => {
    val e = Tables.embeddingsP(s, d).select(col("vec_id"), col("embedding").as("v"))
    val cent = e
      .orderBy(graft.functions.Deterministic.hrand(col("vec_id"), ivfSeed), col("vec_id"))
      .limit(nList)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))
    val asg = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cent_id"), round(cosS("v", "cv"), 6).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c").desc, col("cent_id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a1 = asg.filter(col("rn") === 1)
      .select(col("vec_id").as("cand_id"), col("cent_id"))
    val probes = asg.filter(col("rn") <= nProbe && col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("cent_id"))
    val cand = broadcast(probes).join(a1, "cent_id")
      .filter(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id")
    val qv = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("q"))
    val xv = e.select(col("vec_id").as("cand_id"), col("v").as("x"))
    val sc = cand.join(broadcast(qv), "query_id").join(xv, "cand_id")
      .select(col("query_id"), col("cand_id"), round(cosS("q", "x"), 6).as("cs"))
    val w = Window.partitionBy("query_id").orderBy(col("cs").desc, col("cand_id"))
    sc.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("rk"), col("cand_id"), col("cs").as("cos"))
      .orderBy("query_id", "rk")
  })

  val all: Seq[Q] =
    Seq(exact, minhashLsh, simhash, ngramJaccard, embedNearDup, annTopk, annLsh, annIvf)
}
