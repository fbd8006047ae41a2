package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (north star §M5): media payloads travel
  * as opaque `BINARY` columns next to a typed metadata struct; decode /
  * feature-extract runs batched per partition via a typed
  * `Dataset.mapPartitions` (the Scala-side equivalent of an Arrow-batch
  * UDF boundary: one iterator pass per partition, no per-row lambda
  * dispatch, no driver collect).
  *
  * The decode step itself is a clearly-marked DETERMINISTIC STUB
  * (real image/audio codecs aren't in this container): it derives
  * "features" from the payload bytes. Everything around it — binary
  * schema, metadata struct, partition-batched iteration, downstream
  * relational aggregation — is real and oracle-checked: the testdata
  * text is ASCII, so byte arithmetic on the payload is replayable in
  * DuckDB as codepoint arithmetic on the source string.
  */
object QMedia {

  /** Typed media row: payload + metadata, as a 100 TB table would carry
    * (payload partition-pruned via the metadata-only projection). */
  final case class MediaRow(doc_id: Long, format: String, n_bytes: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
      first_byte: Long, checksum: Long, brightness: Double)

  // ------------------------------------------------------ decode stub
  /** STUB decode: in production this calls the codec on `payload`
    * (JPEG/PNG/PCM...). Here: deterministic byte statistics standing in
    * for decoded-image features. Batched: one pass per partition. */
  private def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
      MediaFeatures(
        r.doc_id, r.format, r.n_bytes,
        first_byte = if (r.payload.nonEmpty) (r.payload(0) & 0xff).toLong else -1L,
        checksum = sum % 65521L, // Adler-style mod
        brightness = if (r.payload.isEmpty) 0.0 else sum.toDouble / r.payload.length)
    }

  /** Media "ingest": documents re-cast as binary payload + metadata —
    * the schema a real multimodal table would have. */
  private def media(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    // Empty payloads are dropped at ingest (mirrored by length(text) > 0
    // in every oracle): ascii('')/integer-div semantics diverge between
    // engines on empty strings, and a zero-byte media payload is
    // undecodable anyway.
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(
        col("doc_id"),
        // deterministic fake format from the id — metadata column
        element_at(array(lit("jpeg"), lit("png"), lit("webp")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        length(col("text")).cast("long").as("n_bytes"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Decode + feature extraction + per-format aggregation. The payload
    * never reaches the driver; the stub runs inside mapPartitions and
    * only small features shuffle. */
  val decode = Q("mm_decode_features", Some("""
    WITH f AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
             length(text) AS n_bytes,
             ascii(substr(text, 1, 1)) AS first_byte,
             list_sum(list_transform(string_split(text, ''), c -> ascii(c))) % 65521 AS checksum,
             list_sum(list_transform(string_split(text, ''), c -> ascii(c)))::DOUBLE / length(text) AS brightness
      FROM documents WHERE length(text) > 0)
    SELECT format, count(*) AS n_media, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           round(avg(brightness), 6) AS avg_brightness,
           CAST(min(checksum) AS BIGINT) AS min_checksum,
           CAST(max(first_byte) AS BIGINT) AS max_first_byte
    FROM f GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    import s.implicits._
    media(s, d)
      .mapPartitions(decodeStub)
      .toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n_media"), sum("n_bytes").as("total_bytes"),
        round(avg("brightness"), 6).as("avg_brightness"),
        min("checksum").as("min_checksum"), max("first_byte").as("max_first_byte"))
      .orderBy("format")
  })

  // ---------------------------------------------------- frame sampling
  /** Frame sampling: each payload is treated as a frame sequence
    * (1 frame per 16 bytes); sample every 4th frame, emit a per-frame
    * feature (STUB: the frame's first byte), aggregate per doc bucket.
    * Exercises the explode/generator side of media processing with
    * bounded fan-out. */
  val frames = Q("mm_frame_sample", Some("""
    WITH fr AS (
      SELECT doc_id, i AS frame_no,
             ascii(substr(text, 1 + i * 16, 1)) AS frame_feat
      FROM documents, LATERAL unnest(generate_series(0, (length(text) - 1) // 16)) AS t(i)
      WHERE i % 4 = 0 AND length(text) > 0),
    agg AS (SELECT doc_id, count(*) AS n_sampled, sum(frame_feat) AS feat_sum FROM fr GROUP BY 1)
    SELECT doc_id % 10 AS bucket, count(*) AS n_docs,
           CAST(sum(n_sampled) AS BIGINT) AS n_frames,
           CAST(sum(feat_sum) AS BIGINT) AS feat_total
    FROM agg GROUP BY 1 ORDER BY 1"""
  ))((s, d) =>
    Tables.documents(s, d)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        expr("filter(sequence(0, CAST((length(text) - 1) div 16 AS INT)), i -> i % 4 = 0)").as("fs"))
      .select(col("doc_id"), col("text"), explode(col("fs")).as("frame_no"))
      .select(col("doc_id"),
        expr("ascii(substring(text, 1 + frame_no * 16, 1))").cast("long").as("frame_feat"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sampled"), sum("frame_feat").as("feat_sum"))
      .groupBy(pmod(col("doc_id"), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum("n_sampled").as("n_frames"),
        sum("feat_sum").as("feat_total"))
      .orderBy("bucket"))

  // --------------------------------------------------------- resize
  final case class ResizeStats(doc_id: Long, format: String, n_px: Long, px_sum: Long)

  /** STUB resize: payload viewed as an H×32 byte raster (H = bytes/32,
    * truncated), 2×2 average-pooled to (H/2)×16 with integer (floor)
    * pixel averaging — exact in both engines. In production the pool
    * body is the codec's resample; the Spark-side shape (binary in,
    * per-partition batch, only small stats shuffle) is the real part. */
  private def resizeStub(rows: Iterator[MediaRow]): Iterator[ResizeStats] =
    rows.map { r =>
      val h = r.payload.length / 32
      var s = 0L
      var n = 0L
      var rr = 0
      while (rr < h / 2) {
        var cc = 0
        while (cc < 16) {
          val p = rr * 2 * 32 + cc * 2
          val px = ((r.payload(p) & 0xff) + (r.payload(p + 1) & 0xff) +
            (r.payload(p + 32) & 0xff) + (r.payload(p + 33) & 0xff)) / 4
          s += px; n += 1
          cc += 1
        }
        rr += 1
      }
      ResizeStats(r.doc_id, r.format, n, s)
    }

  val resize = Q("mm_resize_pool", Some("""
    WITH d AS (SELECT doc_id,
                      CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
                      text, length(text) // 32 AS h
               FROM documents WHERE length(text) > 0),
    px AS (SELECT doc_id, format,
                  (ascii(substr(text, r * 2 * 32 + c * 2 + 1, 1))
                   + ascii(substr(text, r * 2 * 32 + c * 2 + 2, 1))
                   + ascii(substr(text, r * 2 * 32 + c * 2 + 33, 1))
                   + ascii(substr(text, r * 2 * 32 + c * 2 + 34, 1))) // 4 AS v
           FROM d,
                LATERAL unnest(generate_series(0, h // 2 - 1)) AS tr(r),
                LATERAL unnest(generate_series(0, 15)) AS tc(c)
           WHERE h >= 2),
    agg AS (SELECT doc_id, format, count(*) AS n_px, sum(v) AS px_sum FROM px GROUP BY 1, 2)
    SELECT a.format, count(*) AS n_media, CAST(sum(a.n_px) AS BIGINT) AS total_px,
           CAST(sum(a.px_sum) AS BIGINT) AS px_total,
           round(sum(a.px_sum)::DOUBLE / sum(a.n_px), 6) AS avg_px
    FROM agg a GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    import s.implicits._
    media(s, d)
      .mapPartitions(resizeStub)
      .toDF()
      .filter(col("n_px") > 0)
      .groupBy("format")
      .agg(count(lit(1)).as("n_media"), sum("n_px").as("total_px"),
        sum("px_sum").as("px_total"),
        round(sum("px_sum").cast("double") / sum("n_px"), 6).as("avg_px"))
      .orderBy("format")
  })

  // ------------------------------------------------- REAL codec: WAV
  final case class WavRow(doc_id: Long, payload: Array[Byte])
  final case class WavFeatures(doc_id: Long, sample_rate: Long, n_samples: Long,
      amp_sum: Long, sq_sum: Long, peak: Long)

  /** Build a VALID RIFF/WAVE file: 8-bit mono PCM, canonical 44-byte
    * header plus a LIST/INFO chunk inserted before `data` so the decoder
    * must genuinely walk the chunk structure (a fixed-offset "parser"
    * would read garbage). Sample payload = the document's bytes. */
  private def wavBytes(rate: Int, samples: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(44 + 12 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(4 + 24 + 12 + 8 + samples.length) // riff payload size
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(rate)
    bb.putInt(rate) // byte rate = rate * channels * bits/8
    bb.putShort(1)  // block align
    bb.putShort(8)  // bits per sample
    bb.put("LIST".getBytes("US-ASCII")); bb.putInt(4)
    bb.put("INFO".getBytes("US-ASCII"))
    bb.put("data".getBytes("US-ASCII")); bb.putInt(samples.length)
    bb.put(samples)
    bb.array()
  }

  /** REAL WAV decode — no codec library, but a genuine parser: verifies
    * the RIFF/WAVE magics, walks the chunk list (skipping unknown chunks
    * by their declared size), reads the fmt block (PCM, mono, 8-bit
    * enforced) and extracts the `data` PCM samples. Amplitude features
    * use the 8-bit PCM convention (unsigned, bias 128). Batched per
    * partition like the stub paths. */
  private def decodeWav(rows: Iterator[WavRow]): Iterator[WavFeatures] =
    rows.map { r =>
      val bb = java.nio.ByteBuffer.wrap(r.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      require(fourcc() == "RIFF", s"doc ${r.doc_id}: not a RIFF file")
      val riffLen = bb.getInt
      require(riffLen == r.payload.length - 8, s"doc ${r.doc_id}: truncated RIFF")
      require(fourcc() == "WAVE", s"doc ${r.doc_id}: not WAVE")
      var rate = -1
      var samples: Array[Byte] = null
      while (samples == null || rate < 0) {
        val id = fourcc()
        val len = bb.getInt
        id match {
          case "fmt " =>
            val fmt = bb.getShort; val ch = bb.getShort
            rate = bb.getInt; bb.getInt; bb.getShort
            val bits = bb.getShort
            require(fmt == 1 && ch == 1 && bits == 8,
              s"doc ${r.doc_id}: unsupported WAV layout fmt=$fmt ch=$ch bits=$bits")
            bb.position(bb.position() + len - 16)
          case "data" =>
            samples = new Array[Byte](len); bb.get(samples)
          case _ => // unknown chunk: skip by declared size (+pad to even)
            bb.position(bb.position() + len + (len & 1))
        }
      }
      var s = 0L; var sq = 0L; var pk = 0L
      var i = 0
      while (i < samples.length) {
        val a = (samples(i) & 0xff) - 128L // 8-bit PCM: unsigned, bias 128
        s += a; sq += a * a
        if (math.abs(a) > pk) pk = math.abs(a)
        i += 1
      }
      WavFeatures(r.doc_id, rate.toLong, samples.length.toLong, s, sq, pk)
    }

  /** End-to-end real-codec path: synthesize a valid WAV per document
    * (sample rate keyed by doc_id, PCM payload = the text bytes), decode
    * it with the genuine chunk-walking parser, aggregate amplitude
    * statistics per sample rate. All aggregates reduce exact integer
    * sums, so the DuckDB oracle reproduces every double bit-for-bit from
    * the source text without parsing WAV itself — the header fields the
    * parser extracts (rate, sample count) are cross-checked because they
    * must agree with the oracle's independently derived values. */
  val wav = Q("mm_wav_decode", Some("""
    WITH f AS (
      SELECT doc_id, 8000 * (1 + doc_id % 3) AS sample_rate,
             length(text) AS n_samples,
             -- see the byte/char note on the Spark side: the pipeline is
             -- defined over docs whose UTF-8 length equals char length
             list_sum(list_transform(string_split(text, ''), c -> ascii(c) - 128)) AS amp_sum,
             list_sum(list_transform(string_split(text, ''), c -> (ascii(c) - 128) * (ascii(c) - 128))) AS sq_sum,
             list_max(list_transform(string_split(text, ''), c -> abs(ascii(c) - 128))) AS peak
      FROM documents WHERE length(text) > 0 AND strlen(text) = length(text))
    SELECT sample_rate, count(*) AS n_clips,
           CAST(sum(n_samples) AS BIGINT) AS total_samples,
           round(sum(n_samples) * 1000.0 / sample_rate / count(*), 6) AS avg_duration_ms,
           CAST(max(peak) AS BIGINT) AS peak_amp,
           round(CAST(sum(amp_sum) AS DOUBLE) / sum(n_samples), 6) AS mean_amp,
           round(sqrt(CAST(sum(sq_sum) AS DOUBLE) / sum(n_samples)), 6) AS rms
    FROM f GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    import s.implicits._
    // Byte/char contract: the WAV payload is UTF-8 BYTES while the
    // oracle's ascii(c) battery walks CHARACTERS, so the pipeline is
    // restricted — on BOTH sides — to docs where the two coincide
    // (octet_length = char length, i.e. single-byte encodings only).
    // A multi-byte doc is a clip whose sample count differs from its
    // character count; it gets its features from the decoder alone and
    // is out of this oracle-gated aggregate by definition, not by an
    // unstated pure-ASCII corpus assumption.
    val ingest = Tables.documents(s, d)
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        WavRow(id, wavBytes(8000 * (1 + (id % 3)).toInt, raw))
      })
    ingest.mapPartitions(decodeWav).toDF()
      .groupBy("sample_rate")
      .agg(count(lit(1)).as("n_clips"),
        sum("n_samples").as("total_samples"),
        round(sum("n_samples") * lit(1000.0) / col("sample_rate") / count(lit(1)), 6)
          .as("avg_duration_ms"),
        max("peak").as("peak_amp"),
        round(sum("amp_sum").cast("double") / sum("n_samples"), 6).as("mean_amp"),
        round(sqrt(sum("sq_sum").cast("double") / sum("n_samples")), 6).as("rms"))
      .orderBy("sample_rate")
  })

  val all: Seq[Q] = Seq(decode, frames, resize, wav)
}
