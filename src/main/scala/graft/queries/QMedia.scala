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
  * Codecs: the image path (decode / resize-pool) and the audio path
  * (WAV) both run REAL binary-format parsers written here — no codec
  * library is in the container, but an uncompressed 24-bit BMP and a
  * RIFF/WAVE PCM file are fully specified public formats, so ingest
  * synthesizes VALID files from the document bytes and decode genuinely
  * parses headers, walks padded pixel strides / chunk lists, and
  * recovers the raster/samples. Only the frame-sampling query still
  * treats the payload as a raw byte raster (a codec-less stand-in for
  * video frame extraction). Everything around the parsers — binary
  * schema, metadata struct, partition-batched iteration, downstream
  * relational aggregation — is oracle-checked: the testdata text is
  * single-byte, so the decoded pixel/sample arithmetic is replayable in
  * DuckDB as codepoint arithmetic on the source string.
  */
object QMedia {

  /** Typed media row: payload + minimal metadata, as a 100 TB table
    * would carry (payload partition-pruned via metadata projections). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class BmpFeatures(doc_id: Long, width: Long, n_bytes: Long,
      n_px: Long, px_sum: Long, checksum: Long, first_px: Long)

  // ------------------------------------------------- REAL codec: BMP
  /** Build a VALID uncompressed 24-bit BMP: 14-byte file header +
    * 40-byte BITMAPINFOHEADER + BOTTOM-UP pixel rows, each padded to a
    * 4-byte stride. Grayscale input: pixel (r, c) ← gray(r*width + c)
    * (row-major, top-down) stored as B=G=R; trailing bytes beyond
    * height*width are not encoded. Widths whose 3-byte rows aren't a
    * multiple of 4 get 1-3 pad bytes per row, so a decoder must walk
    * the real stride — a fixed-offset reader produces garbage. */
  private[graft] def bmpBytes(width: Int, gray: Array[Byte]): Array[Byte] = {
    val h = gray.length / width
    val stride = (3 * width + 3) / 4 * 4
    val size = 14 + 40 + h * stride
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(size)
    bb.putShort(0); bb.putShort(0) // reserved
    bb.putInt(54)                  // pixel-array offset
    bb.putInt(40)                  // BITMAPINFOHEADER size
    bb.putInt(width); bb.putInt(h) // positive height ⇒ bottom-up rows
    bb.putShort(1)                 // planes
    bb.putShort(24)                // bits per pixel
    bb.putInt(0)                   // BI_RGB: uncompressed
    bb.putInt(h * stride)          // image size
    bb.putInt(2835); bb.putInt(2835) // 72 dpi
    bb.putInt(0); bb.putInt(0)     // palette sizes (none at 24 bpp)
    var r = h - 1
    while (r >= 0) {
      var c = 0
      while (c < width) {
        val v = gray(r * width + c)
        bb.put(v).put(v).put(v) // B, G, R
        c += 1
      }
      var p = 3 * width
      while (p < stride) { bb.put(0: Byte); p += 1 }
      r -= 1
    }
    bb.array()
  }

  /** REAL BMP decode — no codec library, but a genuine parser: verifies
    * the BM magic and declared file size, reads the pixel-array offset
    * from the file header (not assumed), enforces the supported layout
    * (40-byte info header, 1 plane, 24 bpp, BI_RGB, bottom-up), then
    * walks the padded row strides BOTTOM-UP to rebuild the top-down
    * raster, checking B=G=R per pixel. Returns (width, height, gray). */
  private[graft] def decodeBmpGray(docId: Long, payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, s"doc $docId: not a BMP")
    require(bb.getInt == payload.length, s"doc $docId: truncated BMP")
    bb.getShort; bb.getShort // reserved
    val pixOff = bb.getInt
    require(bb.getInt == 40, s"doc $docId: unsupported DIB header")
    val w = bb.getInt
    val h = bb.getInt
    require(w > 0 && h > 0, s"doc $docId: unsupported BMP geometry ${w}x$h")
    require(bb.getShort == 1, s"doc $docId: planes != 1")
    require(bb.getShort == 24, s"doc $docId: not 24 bpp")
    require(bb.getInt == 0, s"doc $docId: compressed BMP unsupported")
    val stride = (3 * w + 3) / 4 * 4
    require(pixOff >= 54 && pixOff + h.toLong * stride <= payload.length,
      s"doc $docId: pixel array out of bounds")
    val gray = new Array[Byte](w * h)
    var r = 0
    while (r < h) {
      val rowOff = pixOff + (h - 1 - r) * stride // bottom-up storage
      var c = 0
      while (c < w) {
        val b = payload(rowOff + 3 * c) & 0xff
        val g = payload(rowOff + 3 * c + 1) & 0xff
        val rd = payload(rowOff + 3 * c + 2) & 0xff
        require(b == g && g == rd, s"doc $docId: non-gray pixel at ($r, $c)")
        gray(r * w + c) = b.toByte
        c += 1
      }
      r += 1
    }
    (w, h, gray)
  }

  /** Media "ingest": each document becomes a VALID BMP image — width
    * keyed by doc_id (25..31, covering every stride-padding residue
    * including zero), raster = the text bytes. Byte/char contract as in
    * [[wav]]: pixels are UTF-8 BYTES while the oracle walks CHARACTERS,
    * so the pipeline restricts — on BOTH sides — to docs where the two
    * coincide, and docs shorter than their width (no full pixel row)
    * are out of scope on both sides. */
  private def bmpMedia(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(octet_length(col("text")) === length(col("text")) &&
        length(col("text")) >= lit(25) + pmod(col("doc_id"), lit(7)))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        MediaRow(id, bmpBytes(25 + (id % 7).toInt, raw))
      })
  }

  /** Decode + feature extraction + per-width aggregation. The payload
    * never reaches the driver; the parser runs inside mapPartitions and
    * only small features shuffle. The grouping key itself (width) comes
    * from the DECODED header, and total_bytes/total_px come from the
    * parsed geometry — the oracle recomputes all of them independently
    * from the source text, so a header or stride-walk bug hash-fails. */
  val decode = Q("mm_decode_features", Some("""
    WITH m AS (
      SELECT doc_id, 25 + doc_id % 7 AS w,
             length(text) // (25 + doc_id % 7) AS h, text
      FROM documents
      WHERE strlen(text) = length(text) AND length(text) >= 25 + doc_id % 7),
    f AS (
      SELECT w, 54 + h * ((3 * w + 3) // 4 * 4) AS n_bytes, w * h AS n_px,
             list_sum(list_transform(string_split(substr(text, 1, w * h), ''), c -> ascii(c))) AS px_sum,
             ascii(substr(text, 1, 1)) AS first_px
      FROM m)
    SELECT w AS width, count(*) AS n_media, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(n_px) AS BIGINT) AS total_px,
           round(CAST(sum(px_sum) AS DOUBLE) / sum(n_px), 6) AS avg_px,
           CAST(min(px_sum % 65521) AS BIGINT) AS min_checksum,
           CAST(max(first_px) AS BIGINT) AS max_first_px
    FROM f GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    import s.implicits._
    bmpMedia(s, d)
      .mapPartitions(_.map { r =>
        val (w, h, gray) = decodeBmpGray(r.doc_id, r.payload)
        var sum = 0L
        var i = 0
        while (i < gray.length) { sum += gray(i) & 0xff; i += 1 }
        BmpFeatures(r.doc_id, w.toLong, r.payload.length.toLong, w.toLong * h,
          sum, sum % 65521L, (gray(0) & 0xff).toLong)
      })
      .toDF()
      .groupBy("width")
      .agg(count(lit(1)).as("n_media"), sum("n_bytes").as("total_bytes"),
        sum("n_px").as("total_px"),
        round(sum("px_sum").cast("double") / sum("n_px"), 6).as("avg_px"),
        min("checksum").as("min_checksum"), max("first_px").as("max_first_px"))
      .orderBy("width")
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
  final case class ResizeStats(doc_id: Long, width: Long, n_px: Long, px_sum: Long)

  /** Resize-pool on REAL decoded pixels: the BMP parser rebuilds the
    * top-down H×W raster (stride walk + bottom-up flip), then a 2×2
    * average pool produces the (H/2)×(W/2) thumbnail with integer
    * (floor) pixel averaging — exact in both engines. In production the
    * pool body is the codec's resample; here both the decode AND the
    * pool are genuine, and only small stats shuffle. */
  private def poolBmp(rows: Iterator[MediaRow]): Iterator[ResizeStats] =
    rows.map { r =>
      val (w, h, gray) = decodeBmpGray(r.doc_id, r.payload)
      var s = 0L
      var n = 0L
      var rr = 0
      while (rr < h / 2) {
        var cc = 0
        while (cc < w / 2) {
          val p = rr * 2 * w + cc * 2
          val px = ((gray(p) & 0xff) + (gray(p + 1) & 0xff) +
            (gray(p + w) & 0xff) + (gray(p + w + 1) & 0xff)) / 4
          s += px; n += 1
          cc += 1
        }
        rr += 1
      }
      ResizeStats(r.doc_id, w.toLong, n, s)
    }

  val resize = Q("mm_resize_pool", Some("""
    WITH m AS (
      SELECT doc_id, 25 + doc_id % 7 AS w,
             length(text) // (25 + doc_id % 7) AS h, text
      FROM documents
      WHERE strlen(text) = length(text) AND length(text) >= 25 + doc_id % 7),
    px AS (SELECT doc_id, w,
                  (ascii(substr(text, r * 2 * w + c * 2 + 1, 1))
                   + ascii(substr(text, r * 2 * w + c * 2 + 2, 1))
                   + ascii(substr(text, (r * 2 + 1) * w + c * 2 + 1, 1))
                   + ascii(substr(text, (r * 2 + 1) * w + c * 2 + 2, 1))) // 4 AS v
           FROM m,
                LATERAL unnest(generate_series(0, h // 2 - 1)) AS tr(r),
                LATERAL unnest(generate_series(0, w // 2 - 1)) AS tc(c)
           WHERE h >= 2),
    agg AS (SELECT doc_id, w, count(*) AS n_px, sum(v) AS px_sum FROM px GROUP BY 1, 2)
    SELECT a.w AS width, count(*) AS n_media, CAST(sum(a.n_px) AS BIGINT) AS total_px,
           CAST(sum(a.px_sum) AS BIGINT) AS px_total,
           round(sum(a.px_sum)::DOUBLE / sum(a.n_px), 6) AS avg_px
    FROM agg a GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    import s.implicits._
    bmpMedia(s, d)
      .mapPartitions(poolBmp)
      .toDF()
      .filter(col("n_px") > 0)
      .groupBy("width")
      .agg(count(lit(1)).as("n_media"), sum("n_px").as("total_px"),
        sum("px_sum").as("px_total"),
        round(sum("px_sum").cast("double") / sum("n_px"), 6).as("avg_px"))
      .orderBy("width")
  })

  // ------------------------------------------- perceptual image dedup
  final case class DHashRow(doc_id: Long, hsh: Long)

  /** Difference-hash (dHash) of a decoded gray raster: the image is
    * average-pooled onto an 8×8 grid (pixel (pr, pc) belongs to cell
    * ((8·pr)/h, (8·pc)/w) — the exact integer partition both engines
    * can replay), and each of the 7 adjacent-cell comparisons per row
    * contributes one bit (right cell brighter ⇒ 1) — a 56-bit
    * brightness-GRADIENT signature that survives rescaling and uniform
    * brightness shifts, the standard first-pass perceptual near-dup
    * key for image corpora. Integer-only (cell value = sum / count
    * floored), so the signature is deterministic. */
  private[graft] def dhashBmp(rows: Iterator[MediaRow]): Iterator[DHashRow] =
    rows.map { r =>
      val (w, h, gray) = decodeBmpGray(r.doc_id, r.payload)
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var pr = 0
      while (pr < h) {
        val gr = 8 * pr / h
        var pc = 0
        while (pc < w) {
          val cell = gr * 8 + 8 * pc / w
          sums(cell) += (gray(pr * w + pc) & 0xff)
          cnts(cell) += 1
          pc += 1
        }
        pr += 1
      }
      var hsh = 0L
      var gr = 0
      while (gr < 8) {
        var gc = 0
        while (gc < 7) {
          val a = sums(gr * 8 + gc) / cnts(gr * 8 + gc)
          val b = sums(gr * 8 + gc + 1) / cnts(gr * 8 + gc + 1)
          if (b > a) hsh |= 1L << (gr * 7 + gc)
          gc += 1
        }
        gr += 1
      }
      DHashRow(r.doc_id, hsh)
    }

  /** Perceptual image near-dup via dHash + banded LSH — the VISUAL
    * member of the dedup family (simhash for pixels): each image's
    * 56-bit difference hash splits into 4 bands of 14 bits, images
    * sharing any band become candidates (equi-join — never all-pairs,
    * the same banding scale shape as minhash/simhash), and the 20 most
    * similar pairs by exact Hamming distance are reported. Top-k by
    * (hamming, pair) instead of a fixed threshold so the report is
    * never empty and never unbounded. The oracle re-derives every
    * pooled cell from the source text's codepoints — a stride/pooling
    * bug in the decoder shifts cells, flips gradient bits and
    * hash-fails. Images must span the 8-row grid (≥ 8 full pixel
    * rows), enforced identically on both sides. */
  val dhash = Q("mm_image_dhash", Some("""
    WITH m AS (SELECT doc_id, 25 + doc_id % 7 AS w,
                      length(text) // (25 + doc_id % 7) AS h, text
               FROM documents
               WHERE strlen(text) = length(text)
                 AND length(text) >= 8 * (25 + doc_id % 7)),
    px AS (SELECT doc_id, (8 * (t.i // w)) // h AS gr, (8 * (t.i % w)) // w AS gc,
                  ascii(substr(text, t.i + 1, 1)) AS v
           FROM m, LATERAL unnest(generate_series(0, w * h - 1)) AS t(i)),
    cell AS (SELECT doc_id, gr, gc, sum(v) // count(*) AS cv FROM px GROUP BY 1, 2, 3),
    bits AS (SELECT a.doc_id, a.gr, a.gc,
                    CASE WHEN b.cv > a.cv THEN 1 ELSE 0 END AS bit
             FROM cell a JOIN cell b
               ON a.doc_id = b.doc_id AND a.gr = b.gr AND b.gc = a.gc + 1),
    hash AS (SELECT doc_id, CAST(sum(bit * (1::BIGINT << (gr * 7 + gc))) AS BIGINT) AS hsh
             FROM bits GROUP BY 1),
    bands AS (SELECT doc_id, hsh, t.b, (hsh >> (t.b * 14)) & 16383 AS bkey
              FROM hash, LATERAL unnest(generate_series(0, 3)) AS t(b)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.hsh AS ha, b.hsh AS hb
             FROM bands a JOIN bands b
               ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
    FROM cand ORDER BY hamming, doc_a, doc_b LIMIT 20"""
  ))((s, d) => {
    import s.implicits._
    // only docs with >= 8 full pixel rows span the grid — filtered
    // BEFORE the hasher (an h < 8 raster leaves grid rows empty)
    val media = Tables.documents(s, d)
      .filter(octet_length(col("text")) === length(col("text")) &&
        length(col("text")) >= (lit(25) + pmod(col("doc_id"), lit(7))) * 8)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        MediaRow(id, bmpBytes(25 + (id % 7).toInt, raw))
      })
    val hashes = media.mapPartitions(dhashBmp).toDF()
    val bands = hashes.select(col("doc_id"), col("hsh"),
        explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("bkey", expr("shiftright(hsh, 14 * b)").bitwiseAND(lit(16383L)))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.hsh").as("ha"), col("b.hsh").as("hb"))
      .distinct()
    cand.select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .orderBy(col("hamming"), col("doc_a"), col("doc_b")).limit(20)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
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

  /** REAL WAV parse — no codec library, but a genuine parser: verifies
    * the RIFF/WAVE magics, walks the chunk list (skipping unknown chunks
    * by their declared size), reads the fmt block (PCM, mono, 8-bit
    * enforced) and extracts the `data` PCM samples. Shared by the
    * clip-level (decodeWav) and frame-level (frameEnergies) feature
    * extractors. */
  private def parseWav(docId: Long, payload: Array[Byte]): (Int, Array[Byte]) = {
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(fourcc() == "RIFF", s"doc $docId: not a RIFF file")
    val riffLen = bb.getInt
    require(riffLen == payload.length - 8, s"doc $docId: truncated RIFF")
    require(fourcc() == "WAVE", s"doc $docId: not WAVE")
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
            s"doc $docId: unsupported WAV layout fmt=$fmt ch=$ch bits=$bits")
          bb.position(bb.position() + len - 16)
        case "data" =>
          samples = new Array[Byte](len); bb.get(samples)
        case _ => // unknown chunk: skip by declared size (+pad to even)
          bb.position(bb.position() + len + (len & 1))
      }
    }
    (rate, samples)
  }

  /** Clip-level amplitude features off the parsed PCM. Amplitude uses
    * the 8-bit PCM convention (unsigned, bias 128). Batched per
    * partition like the stub paths. */
  private def decodeWav(rows: Iterator[WavRow]): Iterator[WavFeatures] =
    rows.map { r =>
      val (rate, samples) = parseWav(r.doc_id, r.payload)
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

  // --------------------------------- REAL codec: WAV frame features
  final case class WavFrameFeatures(doc_id: Long, sample_rate: Long,
      n_frames: Long, peak_energy: Long, peak_frame: Long, n_active: Long)

  private val wavFrameLen = 64
  private val wavActiveMeanSq = 2000L

  /** Frame-level energy extraction off the parsed PCM: fixed
    * 64-sample frames, per-frame integer energy Σa², the clip's peak
    * frame (first index on ties — deterministic), and the count of
    * "active" frames (mean-square ≥ 2000 — the voice-activity-style
    * gate, kept integer as e ≥ 2000·frame_len). */
  private def frameEnergies(rows: Iterator[WavRow]): Iterator[WavFrameFeatures] =
    rows.map { r =>
      val (rate, samples) = parseWav(r.doc_id, r.payload)
      val nFrames = (samples.length + wavFrameLen - 1) / wavFrameLen
      var peakE = -1L; var peakF = -1L; var active = 0L
      var f = 0
      while (f < nFrames) {
        val start = f * wavFrameLen
        val end = math.min(start + wavFrameLen, samples.length)
        var e = 0L; var i = start
        while (i < end) {
          val a = (samples(i) & 0xff) - 128L
          e += a * a; i += 1
        }
        if (e > peakE) { peakE = e; peakF = f }
        if (e >= wavActiveMeanSq * (end - start)) active += 1
        f += 1
      }
      WavFrameFeatures(r.doc_id, rate.toLong, nFrames.toLong, peakE, peakF, active)
    }

  /** Audio feature extraction (frame energy / activity detection) over
    * the REAL WAV path: same synth-ingest + genuine chunk-walking
    * parser as mm_wav_decode, but the decoder emits per-frame features
    * reduced to clip statistics, rolled up per sample rate. Everything
    * is exact integer arithmetic off the PCM bytes, so the oracle
    * re-derives identical values from the document characters (same
    * byte/char contract as mm_wav_decode). */
  val wavFrames = Q("mm_wav_frame_energy", Some(s"""
    WITH f AS (SELECT doc_id, 8000 * (1 + doc_id % 3) AS sample_rate,
                      string_split(text, '') AS cs
               FROM documents WHERE length(text) > 0 AND strlen(text) = length(text)),
    fr AS (SELECT doc_id, sample_rate, i,
                  list_slice(cs, (i - 1) * $wavFrameLen + 1, i * $wavFrameLen) AS fcs
           FROM f, LATERAL unnest(generate_series(1,
                  CAST(ceil(len(cs) / $wavFrameLen.0) AS BIGINT))) t(i)),
    fe AS (SELECT doc_id, sample_rate, i, len(fcs) AS fn,
                  list_sum(list_transform(fcs, c -> (ascii(c) - 128) * (ascii(c) - 128))) AS e
           FROM fr),
    mx AS (SELECT doc_id, max(e) AS me FROM fe GROUP BY 1),
    pd AS (SELECT fe.doc_id, mx.me, any_value(fe.sample_rate) AS sample_rate,
                  count(*) AS n_frames,
                  min(CASE WHEN fe.e = mx.me THEN fe.i - 1 END) AS peak_frame,
                  CAST(sum(CASE WHEN fe.e >= $wavActiveMeanSq * fe.fn THEN 1 ELSE 0 END) AS BIGINT) AS n_active
           FROM fe JOIN mx USING (doc_id) GROUP BY 1, 2)
    SELECT sample_rate, count(*) AS n_clips,
           CAST(sum(n_frames) AS BIGINT) AS total_frames,
           CAST(sum(n_active) AS BIGINT) AS total_active,
           round(CAST(sum(n_active) AS DOUBLE) / sum(n_frames), 6) AS active_frac,
           CAST(max(me) AS BIGINT) AS max_peak_energy,
           round(CAST(sum(peak_frame) AS DOUBLE) / count(*), 6) AS avg_peak_frame
    FROM pd GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    import s.implicits._
    val ingest = Tables.documents(s, d)
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        WavRow(id, wavBytes(8000 * (1 + (id % 3)).toInt, raw))
      })
    ingest.mapPartitions(frameEnergies).toDF()
      .groupBy("sample_rate")
      .agg(count(lit(1)).as("n_clips"),
        sum("n_frames").as("total_frames"),
        sum("n_active").as("total_active"),
        round(sum("n_active").cast("double") / sum("n_frames"), 6).as("active_frac"),
        max("peak_energy").as("max_peak_energy"),
        round(sum("peak_frame").cast("double") / count(lit(1)), 6).as("avg_peak_frame"))
      .orderBy("sample_rate")
  })

  // --------------------------------- REAL codec: WAV 2× downsample
  final case class WavResampled(doc_id: Long, rate_out: Long, n_out: Long,
      amp_sum: Long, sq_sum: Long, peak: Long)

  /** Decimate-by-2 with an anti-alias boxcar off the parsed PCM: each
    * output sample is the floor mean of an input pair on the UNSIGNED
    * byte scale ((u₂ᵢ + u₂ᵢ₊₁) >> 1 — the standard cheap low-pass
    * before dropping every other sample), an odd trailing sample
    * passes through (mean with itself). All integer; features then
    * use the same bias-128 amplitude convention as the other WAV
    * decoders. */
  private def resampleWav(rows: Iterator[WavRow]): Iterator[WavResampled] =
    rows.map { r =>
      val (rate, samples) = parseWav(r.doc_id, r.payload)
      val nOut = (samples.length + 1) / 2
      var s = 0L; var sq = 0L; var pk = 0L
      var i = 0
      while (i < nOut) {
        val a = samples(2 * i) & 0xff
        val b = if (2 * i + 1 < samples.length) samples(2 * i + 1) & 0xff else a
        val v = ((a + b) >> 1) - 128L
        s += v; sq += v * v
        if (math.abs(v) > pk) pk = math.abs(v)
        i += 1
      }
      WavResampled(r.doc_id, rate.toLong / 2, nOut.toLong, s, sq, pk)
    }

  /** Audio downsampling over the REAL WAV path — the standard
    * storage/throughput cut before feature extraction at scale (half
    * the sample rate, half the bytes): same synth-ingest + genuine
    * chunk-walking parser as mm_wav_decode, then the decimator above,
    * rolled up per OUTPUT rate with the post-resample amplitude
    * battery (the numbers that tell you whether the cut kept the
    * signal). Row-local decode + one aggregate; everything integer
    * until the final ratios, so the oracle re-derives every value
    * exactly from the document characters (same byte/char contract as
    * the sibling WAV queries). */
  val wavResample = Q("mm_wav_resample", Some("""
    WITH f AS (SELECT doc_id, 8000 * (1 + doc_id % 3) AS rate,
                      string_split(text, '') AS cs
               FROM documents WHERE length(text) > 0 AND strlen(text) = length(text)),
    p AS (SELECT doc_id, rate, i, ascii(cs[2 * i - 1]) AS a,
                 CASE WHEN 2 * i <= len(cs) THEN ascii(cs[2 * i]) END AS b
          FROM f, LATERAL unnest(generate_series(1,
                 CAST(ceil(len(cs) / 2.0) AS BIGINT))) t(i)),
    v AS (SELECT doc_id, rate, ((a + coalesce(b, a)) // 2) - 128 AS v FROM p),
    c AS (SELECT doc_id, rate // 2 AS rate_out, count(*) AS n_out,
                 CAST(sum(v) AS BIGINT) AS amp_sum,
                 CAST(sum(v * v) AS BIGINT) AS sq_sum,
                 CAST(max(abs(v)) AS BIGINT) AS peak
          FROM v GROUP BY 1, 2)
    SELECT rate_out, count(*) AS n_clips,
           CAST(sum(n_out) AS BIGINT) AS total_samples,
           CAST(max(peak) AS BIGINT) AS peak_amp,
           round(CAST(sum(amp_sum) AS DOUBLE) / sum(n_out), 6) AS mean_amp,
           round(sqrt(CAST(sum(sq_sum) AS DOUBLE) / sum(n_out)), 6) AS rms
    FROM c GROUP BY 1 ORDER BY 1"""
  ))((s, d) => {
    import s.implicits._
    val ingest = Tables.documents(s, d)
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("raw"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, raw) =>
        WavRow(id, wavBytes(8000 * (1 + (id % 3)).toInt, raw))
      })
    ingest.mapPartitions(resampleWav).toDF()
      .groupBy("rate_out")
      .agg(count(lit(1)).as("n_clips"),
        sum("n_out").as("total_samples"),
        max("peak").as("peak_amp"),
        round(sum("amp_sum").cast("double") / sum("n_out"), 6).as("mean_amp"),
        round(sqrt(sum("sq_sum").cast("double") / sum("n_out")), 6).as("rms"))
      .orderBy("rate_out")
  })

  val all: Seq[Q] = Seq(decode, frames, resize, dhash, wav, wavFrames, wavResample)
}
