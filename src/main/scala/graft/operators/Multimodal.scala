package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with a decode/feature-extract stage.
  *
  * Real pipelines carry images/audio/video as `binary` columns with a
  * metadata struct; decode runs in batched partition-parallel workers.
  * The image/audio codecs are NOT in this container, so the decode is a
  * clearly-marked deterministic fake — but the Spark-side plumbing
  * (schema, binary column, partition-parallel typed map, batch shape) is
  * real and is exactly what a libjpeg/ffmpeg-backed decoder would plug
  * into.
  *
  * Scale: decode is mapPartitions-style per-row work after an optional
  * repartition to match worker parallelism; no shuffle otherwise.
  */
object Multimodal {

  type Q = (SparkSession, String) => DataFrame

  /** STUB decode: deterministic pseudo-metadata from payload bytes.
    * A real implementation decodes the image header here.
    */
  private def fakeDims(nBytes: org.apache.spark.sql.Column) = (
    (lit(320) + nBytes % 320).as("width"),
    (lit(240) + nBytes % 240).as("height"),
    (lit(1) + nBytes % 8).as("n_frames"))

  val queries: Seq[(String, Q)] = Seq(
    // Binary payload + metadata projection (oracle-checked: byte lengths
    // and derived dims are engine-agnostic).
    "q80_multimodal_meta" -> ((s, d) => {
      val bin = col("text").cast("binary")
      val n = octet_length(bin)
      val (w, h, f) = fakeDims(n)
      t(s, d, "documents").select(
        col("doc_id"),
        n.as("n_bytes"),
        w, h, f,
        // Spark's base64 MIME-chunks long payloads with \r\n; strip to
        // the canonical unwrapped form (matches the oracle's to_base64).
        regexp_replace(base64(bin), "[\\r\\n]", "").as("payload_b64"))
    }),

    // Partition-parallel typed decode stage (Dataset map over binary
    // payloads → fixed-shape feature batch). Oracle-checked: the mean
    // byte + 4-bin histogram are exactly computable in SQL, so the
    // whole decode path gets a hash gate (histogram emitted as scalar
    // h0..h3 columns — array columns crash the harness's pandas sort).
    "q81_multimodal_decode" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val payloads = t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      payloads.mapPartitions { it =>
        it.map { case (id, bytes) =>
          // real codec decoder goes here (libjpeg/ffmpeg — not in
          // this container); deterministic stand-in: mean byte value +
          // 4-bin byte histogram. q82/q83 exercise a REAL header
          // decode + pixel resize on self-generated BMP bytes.
          val mean =
            if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
          val hist = new Array[Long](4)
          bytes.foreach(b => hist((b & 0xff) / 64) += 1)
          (id, bytes.length, mean, hist(0), hist(1), hist(2), hist(3))
        }
      }.toDF("doc_id", "n_bytes", "mean_byte", "h0", "h1", "h2", "h3")
    }),

    // Frame-sampling stage (the video path's keyframe extraction): the
    // binary payload is a sequence of fixed-size frames; take every
    // k-th complete frame, emit count + a first-byte checksum over the
    // sampled frames. Same mapPartitions batch shape as q81 — a real
    // ffmpeg-backed sampler swaps in per frame unchanged.
    "q155_multimodal_framesample" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val frameSize = 16
      val stride = 4
      val payloads = t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
      payloads.mapPartitions { it =>
        it.map { case (id, bytes) =>
          val nFrames = bytes.length / frameSize
          val sampled = 0 until nFrames by stride
          val checksum = sampled.map(i =>
            (bytes(i * frameSize) & 0xff).toLong).sum
          (id, nFrames, sampled.length, checksum)
        }
      }.toDF("doc_id", "n_frames", "n_sampled", "checksum")
    }),

    // Scene-cut detection over the frame stream (the shot-boundary
    // pass of a video curation pipeline, here over the same 16-byte
    // synthetic frames as q155): a cut fires where the sum of absolute
    // per-position byte diffs between consecutive frames exceeds the
    // threshold. All-integer per-row work in mapPartitions — the
    // ffmpeg-backed variant swaps the frame source, not the plumbing.
    "q305_video_scene_cuts" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val frameSize = 16
      val th = 640L
      t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val nFrames = bytes.length / frameSize
            val diffs = (0 until nFrames - 1).map { f =>
              (0 until frameSize).map { p =>
                math.abs((bytes(f * frameSize + p) & 0xff) -
                  (bytes((f + 1) * frameSize + p) & 0xff)).toLong
              }.sum
            }
            val cuts = diffs.zipWithIndex.filter(_._1 > th)
            (id, nFrames, cuts.length,
              cuts.headOption.map(_._2 + 1).getOrElse(-1),
              diffs.sum)
          }
        }.toDF("doc_id", "n_frames", "n_cuts", "first_cut_frame",
          "total_diff")
    }),

    // Voice-activity detection over the PCM frame stream (the segment
    // extraction pass before ASR transcription in a speech-data
    // pipeline): a frame is speech when its mean-square energy exceeds
    // the threshold; segments merge across non-speech gaps of <= 2
    // frames (the standard hangover smoothing that stops a breath pause
    // from splitting an utterance). Binary decode + per-frame energy is
    // per-row mapPartitions work (q199's framing at 32 samples); the
    // segmentation is declarative gaps-and-islands with every window
    // partitioned by doc_id — decode where Spark SQL can't, windows
    // where it can.
    "q310_audio_vad" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val Frame = 32
      val MsTh = 120000000L
      val feat = t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            val n = bytes.length / 2
            val pcm = Array.tabulate(n) { i =>
              ((bytes(2 * i) & 0xFF) |
                ((bytes(2 * i + 1) & 0xFF) << 8)) - 16384
            }
            pcm.grouped(Frame).zipWithIndex.map { case (fr, fi) =>
              var ss = 0L
              var i = 0
              while (i < fr.length) { ss += fr(i).toLong * fr(i); i += 1 }
              (id, fi.toLong, ss / fr.length)
            }
          }
        }.toDF("doc_id", "fi", "ms")
      val staged = graft.Stage(feat, "q310_frames")
      val nf = staged.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("fi"))
      val seg = staged.filter(col("ms") > MsTh)
        .withColumn("pfi", lag(col("fi"), 1).over(w))
        .withColumn("newseg",
          when(col("pfi").isNull || col("fi") - col("pfi") - 1 > 2, 1L)
            .otherwise(0L))
        .withColumn("seg", sum(col("newseg")).over(w))
      val perSeg = seg.groupBy(col("doc_id"), col("seg"))
        .agg(min(col("fi")).as("st"), max(col("fi")).as("en"),
          count(lit(1)).as("nsp"))
      val perDoc = perSeg.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_segments"), sum(col("nsp")).as("n_speech"),
        max(col("en") - col("st") + 1).as("longest_seg"),
        min(col("st")).as("first_seg_start"))
      nf.join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_frames"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("n_speech"), lit(0L)).as("n_speech"),
          coalesce(col("longest_seg"), lit(0L)).as("longest_seg"),
          coalesce(col("first_seg_start"), lit(-1L))
            .as("first_seg_start"))
    }),

    // Keyframe selection downstream of q305's shot boundaries: the
    // representative frame of every shot is its FIRST frame (frame 0
    // plus the frame after each cut) — the thumbnail/embedding
    // candidates a video curation pipeline feeds to the expensive
    // encoder, reducing per-video work from n_frames to n_shots. Same
    // all-integer per-row framing as q305; the checksum over selected
    // frame bytes pins exactly WHICH frames were chosen.
    "q311_video_keyframes" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val frameSize = 16
      val th = 640L
      t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, bytes) =>
            val nFrames = bytes.length / frameSize
            def frameSum(f: Int): Long =
              (0 until frameSize).map(p =>
                (bytes(f * frameSize + p) & 0xff).toLong).sum
            val cuts = (0 until nFrames - 1).filter { f =>
              (0 until frameSize).map { p =>
                math.abs((bytes(f * frameSize + p) & 0xff) -
                  (bytes((f + 1) * frameSize + p) & 0xff)).toLong
              }.sum > th
            }
            val kfs = if (nFrames == 0) Seq.empty[Int]
                      else 0 +: cuts.map(_ + 1)
            (id, nFrames, kfs.length, kfs.map(frameSum).sum,
              kfs.lastOption.getOrElse(-1))
          }
        }.toDF("doc_id", "n_frames", "n_keyframes", "kf_checksum",
          "last_kf_frame")
    }),

    // REAL decode path: deterministic BMP images are produced and then
    // decoded by parsing the actual binary header (no fake) — the
    // partition-parallel encode→binary column→decode pipeline a
    // libjpeg/ffmpeg-backed variant would use unchanged. Oracle checks
    // the decoded dims and byte sizes against the closed-form BMP layout.
    "q82_multimodal_bmp_decode" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val images = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          (id, bmpBytes((16 + id % 32).toInt, (8 + nc % 16).toInt))
        }
        .toDF("doc_id", "payload")
      images.as[(Long, Array[Byte])].map { case (id, bytes) =>
        val (w, h, bpp) = parseBmpHeader(bytes)
        (id, w, h, bpp, bytes.length)
      }.toDF("doc_id", "width", "height", "bpp", "n_bytes")
    }),

    // Resize stage: real pixel-level 2×2 block averaging over the blue
    // channel of the decoded BMP (byte-offset arithmetic over rows with
    // stride padding — the actual work a thumbnailing pipeline does).
    // Invariant: the mean of complete equal-size block means equals the
    // global channel mean.
    "q83_multimodal_resize" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          // Even dims so 2×2 blocks tile exactly.
          val (w, h) = ((16 + 2 * (id % 16)).toInt, (8 + 2 * (nc % 8)).toInt)
          val bytes = bmpBytes(w, h)
          val rowSize = ((w * 3 + 3) / 4) * 4
          def px(x: Int, y: Int): Int = bytes(54 + y * rowSize + x * 3) & 0xff
          var full = 0.0
          for (y <- 0 until h; x <- 0 until w) full += px(x, y)
          full /= (w.toLong * h)
          var down = 0.0
          for (y <- 0 until h / 2; x <- 0 until w / 2)
            down += (px(2 * x, 2 * y) + px(2 * x + 1, 2 * y) +
              px(2 * x, 2 * y + 1) + px(2 * x + 1, 2 * y + 1)) / 4.0
          down /= (w.toLong * h / 4)
          (id, w / 2, h / 2, math.abs(down - full) < 1e-6)
        }
        .toDF("doc_id", "down_w", "down_h", "mean_preserved")
    }),

    // Image near-dup via perceptual hash: aHash over the decoded BMPs,
    // then exact-dedup on the hash (the image-side q40/q43). The BMP
    // generator is deterministic in (w, h), so every image with the
    // same dims is byte-identical — the oracle's ground truth is that
    // each (w, h) class collapses to exactly ONE hash, closed-form from
    // the id/n_chars arithmetic. Same mapPartitions decode shape as
    // q81; the dedup itself is one shuffle on the 64-bit hash.
    "q170_image_ahash" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
        .as[(Long, Long)]
        .map { case (id, nc) =>
          val w = (16 + id % 32).toInt
          val h = (8 + nc % 16).toInt
          (id, w, h, aHash(bmpBytes(w, h)))
        }
        .toDF("doc_id", "w", "h", "ahash")
        .groupBy(col("w"), col("h"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("ahash")).as("n_hashes"),
          min(col("doc_id")).as("keep_id"))
    }),

    // Audio-modality feature extraction: interpret the binary payload as
    // 16-bit little-endian PCM (raw PCM needs no codec — this is a REAL
    // decode, not a stub), frame into 64-sample windows, and emit the
    // per-frame features an audio curation pipeline filters on: RMS
    // energy and zero-crossing rate (the classic silence/voicing
    // heuristics). Same partition-parallel typed-map shape as the image
    // decodes (q81/q82). All-integer accumulation (max 64·32767² ≈ 2^36,
    // exact in BIGINT and in an IEEE double) + correctly-rounded
    // division/sqrt keep every emitted value engine-identical, so the
    // oracle replays byte→sample→frame→feature in plain SQL.
    "q199_audio_pcm_frames" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val Frame = 64
      t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            val n = bytes.length / 2
            // ASCII-range payloads never reach the 16-bit signed
            // threshold, so DC-offset removal (center the unsigned
            // stream) stands in for signedness and gives the
            // zero-crossing feature real sign changes to count.
            val pcm = Array.tabulate(n) { i =>
              ((bytes(2 * i) & 0xFF) | ((bytes(2 * i + 1) & 0xFF) << 8)) -
                16384
            }
            pcm.grouped(Frame).zipWithIndex.map { case (fr, fi) =>
              var sumSq = 0L
              var zc = 0L
              var i = 0
              while (i < fr.length) {
                sumSq += fr(i).toLong * fr(i)
                if (i > 0 && (fr(i - 1) < 0) != (fr(i) < 0)) zc += 1
                i += 1
              }
              (id, fi.toLong, fr.length.toLong, sumSq,
                math.sqrt(sumSq.toDouble / fr.length), zc)
            }
          }
        }
        .toDF("doc_id", "frame_idx", "n_samples", "sum_sq", "rms",
          "n_zero_cross")
    })
  )

  /** Minimal valid 24-bit BMP: 14-byte file header + 40-byte BITMAPINFO
    * header + padded pixel rows. Deterministic gradient payload.
    */
  /** aHash perceptual hash (public average-hash algorithm): block-
    * average the blue channel onto an 8×8 grid, threshold each cell at
    * the grid mean → 64-bit hash. Identical images hash identically;
    * small pixel perturbations flip at most the cells they touch, so
    * Hamming distance on the hash IS the image near-dup measure — the
    * image-modality counterpart of the text simhash operator (q43).
    */
  private[operators] def aHash(bytes: Array[Byte]): Long = {
    val (w, h, _) = parseBmpHeader(bytes)
    val rowSize = ((w * 3 + 3) / 4) * 4
    def px(x: Int, y: Int): Int = bytes(54 + y * rowSize + x * 3) & 0xff
    val block = new Array[Double](64)
    for (j <- 0 until 8; i <- 0 until 8) {
      val x0 = i * w / 8
      val x1 = math.max(x0 + 1, (i + 1) * w / 8)
      val y0 = j * h / 8
      val y1 = math.max(y0 + 1, (j + 1) * h / 8)
      var sum = 0.0
      var n = 0
      for (y <- y0 until y1; x <- x0 until x1) { sum += px(x, y); n += 1 }
      block(j * 8 + i) = sum / n
    }
    val mean = block.sum / 64
    var hash = 0L
    for (k <- 0 until 64) if (block(k) >= mean) hash |= (1L << k)
    hash
  }

  private[operators] def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putInt(0).putInt(54)                     // reserved, pixel offset
    b.putInt(40).putInt(w).putInt(h)            // DIB: size, width, height
      .putShort(1).putShort(24)                 // planes, bpp
      .putInt(0).putInt(dataSize)               // compression, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // dpi, palette
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        b.put(((x * 7 + y * 13) & 0xff).toByte)
          .put(((x * 3 + y * 5) & 0xff).toByte)
          .put(((x + y) & 0xff).toByte)
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y += 1
    }
    b.array()
  }

  /** Parse width/height/bpp out of a BMP header (little-endian). */
  private[operators] def parseBmpHeader(bytes: Array[Byte])
      : (Int, Int, Int) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP payload")
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (b.getInt(18), b.getInt(22), b.getShort(28).toInt)
  }

  val oracles: Seq[(String, String)] = Seq(
    "q80_multimodal_meta" ->
      """SELECT doc_id,
                octet_length(encode(text))::INT AS n_bytes,
                (320 + octet_length(encode(text)) % 320)::INT AS width,
                (240 + octet_length(encode(text)) % 240)::INT AS height,
                (1 + octet_length(encode(text)) % 8)::INT AS n_frames,
                replace(replace(to_base64(encode(text)), chr(13), ''),
                        chr(10), '') AS payload_b64
         FROM documents""",
    // Byte-level decode contract is exactly SQL-expressible: mean byte
    // value and a 4-bin histogram recomputed from the hex dump.
    "q81_multimodal_decode" ->
      """WITH b AS (
           SELECT doc_id, lower(hex(encode(text))) AS hx,
                  octet_length(encode(text)) AS nb
           FROM documents
         ), e AS (
           SELECT doc_id, nb,
                  (strpos('0123456789abcdef', substring(hx, 2*i-1, 1)) - 1) * 16
                  + strpos('0123456789abcdef', substring(hx, 2*i, 1)) - 1 AS byte
           FROM b, unnest(range(1, nb + 1)) AS t(i)
         )
         SELECT doc_id, nb::INT AS n_bytes, avg(byte) AS mean_byte,
                sum(CASE WHEN byte // 64 = 0 THEN 1 ELSE 0 END)::BIGINT AS h0,
                sum(CASE WHEN byte // 64 = 1 THEN 1 ELSE 0 END)::BIGINT AS h1,
                sum(CASE WHEN byte // 64 = 2 THEN 1 ELSE 0 END)::BIGINT AS h2,
                sum(CASE WHEN byte // 64 = 3 THEN 1 ELSE 0 END)::BIGINT AS h3
         FROM e GROUP BY doc_id, nb""",
    "q82_multimodal_bmp_decode" ->
      """SELECT doc_id,
                (16 + doc_id % 32)::INT AS width,
                (8 + n_chars % 16)::INT AS height,
                24::INT AS bpp,
                (54 + (((16 + doc_id % 32) * 3 + 3) // 4) * 4
                    * (8 + n_chars % 16))::INT AS n_bytes
         FROM documents""",
    "q83_multimodal_resize" ->
      """SELECT doc_id,
                (8 + doc_id % 16)::INT AS down_w,
                (4 + n_chars % 8)::INT AS down_h,
                true AS mean_preserved
         FROM documents""",
    "q305_video_scene_cuts" ->
      """WITH b AS (
           SELECT doc_id, lower(hex(encode(text))) AS hx,
                  octet_length(encode(text)) // 16 AS n_frames
           FROM documents),
         bytes AS (
           SELECT doc_id, i AS idx, n_frames,
                  (strpos('0123456789abcdef',
                     substring(hx, 2*i + 1, 1)) - 1) * 16
                  + strpos('0123456789abcdef',
                     substring(hx, 2*i + 2, 1)) - 1 AS byte
           FROM b, unnest(range(0, n_frames * 16)) AS t(i)),
         diffs AS (
           SELECT a.doc_id, a.idx // 16 AS frame, a.n_frames,
                  sum(abs(a.byte - c.byte)) AS diffsum
           FROM bytes a JOIN bytes c
             ON c.doc_id = a.doc_id AND c.idx = a.idx + 16
           GROUP BY 1, 2, 3),
         cuts AS (
           SELECT doc_id, max(n_frames) AS n_frames,
                  sum(CASE WHEN diffsum > 640 THEN 1 ELSE 0 END) AS n_cuts,
                  min(CASE WHEN diffsum > 640 THEN frame + 1 END)
                    AS first_cut,
                  sum(diffsum) AS total_diff
           FROM diffs GROUP BY doc_id)
         SELECT d.doc_id,
                coalesce(c.n_frames,
                  octet_length(encode(d.text)) // 16)::INT AS n_frames,
                coalesce(c.n_cuts, 0)::INT AS n_cuts,
                coalesce(c.first_cut, -1)::INT AS first_cut_frame,
                coalesce(c.total_diff, 0)::BIGINT AS total_diff
         FROM documents d LEFT JOIN cuts c USING (doc_id)""",
    "q310_audio_vad" ->
      """WITH d AS (
           SELECT doc_id, text FROM documents WHERE length(text) >= 2),
         samples AS (
           SELECT doc_id,
                  list_transform(generate_series(1, length(text) // 2),
                    i -> ord(substr(text, 2*i - 1, 1))
                         + 256 * ord(substr(text, 2*i, 1)) - 16384)
                    AS pcm
           FROM d),
         frames AS (
           SELECT doc_id, (f - 1)::BIGINT AS fi,
                  pcm[(f-1)*32 + 1 : f*32] AS fr
           FROM (SELECT doc_id, pcm,
                        unnest(generate_series(1, (len(pcm) + 31) // 32))
                          AS f
                 FROM samples)),
         feat AS (
           SELECT doc_id, fi,
                  list_sum(list_transform(fr, v -> v::BIGINT * v))
                    // len(fr) AS ms
           FROM frames),
         nf AS (SELECT doc_id, count(*) AS n_frames FROM feat GROUP BY 1),
         sp AS (SELECT doc_id, fi FROM feat WHERE ms > 120000000),
         seg0 AS (
           SELECT doc_id, fi,
                  CASE WHEN lag(fi) OVER w IS NULL
                         OR fi - lag(fi) OVER w - 1 > 2
                       THEN 1 ELSE 0 END AS newseg
           FROM sp WINDOW w AS (PARTITION BY doc_id ORDER BY fi)),
         seg AS (
           SELECT doc_id, fi,
                  sum(newseg) OVER (PARTITION BY doc_id ORDER BY fi)
                    AS seg
           FROM seg0),
         pseg AS (
           SELECT doc_id, seg, min(fi) AS st, max(fi) AS en,
                  count(*) AS nsp
           FROM seg GROUP BY 1, 2),
         pdoc AS (
           SELECT doc_id, count(*) AS n_segments, sum(nsp) AS n_speech,
                  max(en - st + 1) AS longest_seg,
                  min(st) AS first_seg_start
           FROM pseg GROUP BY 1)
         SELECT n.doc_id, n.n_frames::BIGINT AS n_frames,
                coalesce(p.n_segments, 0)::BIGINT AS n_segments,
                coalesce(p.n_speech, 0)::BIGINT AS n_speech,
                coalesce(p.longest_seg, 0)::BIGINT AS longest_seg,
                coalesce(p.first_seg_start, -1)::BIGINT
                  AS first_seg_start
         FROM nf n LEFT JOIN pdoc p USING (doc_id)""",
    "q311_video_keyframes" ->
      """WITH b AS (
           SELECT doc_id, lower(hex(encode(text))) AS hx,
                  octet_length(encode(text)) // 16 AS n_frames
           FROM documents),
         bytes AS (
           SELECT doc_id, i AS idx, n_frames,
                  (strpos('0123456789abcdef',
                     substring(hx, 2*i + 1, 1)) - 1) * 16
                  + strpos('0123456789abcdef',
                     substring(hx, 2*i + 2, 1)) - 1 AS byte
           FROM b, unnest(range(0, n_frames * 16)) AS t(i)),
         diffs AS (
           SELECT a.doc_id, a.idx // 16 AS frame,
                  sum(abs(a.byte - c.byte)) AS diffsum
           FROM bytes a JOIN bytes c
             ON c.doc_id = a.doc_id AND c.idx = a.idx + 16
           GROUP BY 1, 2),
         kf AS (
           SELECT doc_id, 0 AS frame FROM b WHERE n_frames > 0
           UNION ALL
           SELECT doc_id, frame + 1 FROM diffs WHERE diffsum > 640),
         sums AS (
           SELECT k.doc_id, count(*) AS n_keyframes,
                  max(k.frame) AS last_kf,
                  sum(fs.s) AS checksum
           FROM kf k JOIN (
             SELECT doc_id, idx // 16 AS frame, sum(byte) AS s
             FROM bytes GROUP BY 1, 2) fs
             ON fs.doc_id = k.doc_id AND fs.frame = k.frame
           GROUP BY 1)
         SELECT d.doc_id,
                coalesce(b.n_frames, 0)::INT AS n_frames,
                coalesce(s.n_keyframes, 0)::INT AS n_keyframes,
                coalesce(s.checksum, 0)::BIGINT AS kf_checksum,
                coalesce(s.last_kf, -1)::INT AS last_kf_frame
         FROM documents d
         LEFT JOIN b ON b.doc_id = d.doc_id
         LEFT JOIN sums s ON s.doc_id = d.doc_id""",
    "q155_multimodal_framesample" ->
      """WITH b AS (
           SELECT doc_id, lower(hex(encode(text))) AS hx,
                  octet_length(encode(text)) // 16 AS n_frames
           FROM documents),
         s AS (
           SELECT doc_id,
                  (strpos('0123456789abcdef',
                     substring(hx, 32*i + 1, 1)) - 1) * 16
                  + strpos('0123456789abcdef',
                     substring(hx, 32*i + 2, 1)) - 1 AS byte
           FROM b, unnest(range(0, n_frames)) AS t(i)
           WHERE i % 4 = 0),
         agg AS (
           SELECT doc_id, count(*) AS cnt, sum(byte) AS cs
           FROM s GROUP BY doc_id)
         SELECT b.doc_id, b.n_frames::INT AS n_frames,
                coalesce(agg.cnt, 0)::INT AS n_sampled,
                coalesce(agg.cs, 0)::BIGINT AS checksum
         FROM b LEFT JOIN agg ON agg.doc_id = b.doc_id""",
    "q170_image_ahash" ->
      """SELECT (16 + doc_id % 32)::INT AS w,
                (8 + n_chars % 16)::INT AS h,
                count(*) AS n_docs,
                1::BIGINT AS n_hashes,
                min(doc_id) AS keep_id
         FROM documents GROUP BY 1, 2""",
    // Byte→sample→frame→feature replay: ASCII text bytes ARE the
    // little-endian byte stream (strlen == octet_length pinned above),
    // so ord() recovers each byte and the PCM interpretation is exact
    // integer math in both engines.
    "q199_audio_pcm_frames" ->
      """WITH d AS (
           SELECT doc_id, text FROM documents WHERE length(text) >= 2),
         samples AS (
           SELECT doc_id,
                  list_transform(generate_series(1, length(text) // 2),
                    i -> ord(substr(text, 2*i - 1, 1))
                         + 256 * ord(substr(text, 2*i, 1)) - 16384)
                    AS pcm
           FROM d),
         frames AS (
           SELECT doc_id, (f - 1)::BIGINT AS frame_idx,
                  pcm[(f-1)*64 + 1 : f*64] AS fr
           FROM (SELECT doc_id, pcm,
                        unnest(generate_series(1, (len(pcm) + 63) // 64))
                          AS f
                 FROM samples)),
         feat AS (
           SELECT doc_id, frame_idx,
                  len(fr)::BIGINT AS n_samples,
                  list_sum(list_transform(fr, v -> v::BIGINT * v))
                    ::BIGINT AS sum_sq,
                  coalesce(list_sum(list_transform(
                    generate_series(1, len(fr) - 1),
                    i -> CASE WHEN (fr[i] < 0) <> (fr[i+1] < 0)
                         THEN 1 ELSE 0 END)), 0)::BIGINT AS n_zero_cross
           FROM frames)
         SELECT doc_id, frame_idx, n_samples, sum_sq,
                sqrt(sum_sq::DOUBLE / n_samples) AS rms, n_zero_cross
         FROM feat"""
  )
}
