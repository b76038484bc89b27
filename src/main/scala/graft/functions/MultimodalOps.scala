package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads travel as opaque `binary` columns with a typed metadata
  * struct, processed distributed via mapPartitions in fixed-size record
  * batches.
  *
  * Codec tiers (all pluggable via [[MediaCodec]]):
  *   - [[JdkCodec]] — REAL decode for everything the JDK ships codecs for:
  *     PNG/JPEG/GIF/BMP geometry via ImageIO, WAV/AIFF/AU timing via
  *     AudioSystem (oracle-gated round-trip: q92);
  *   - [[HeaderCodec]] — real container-header parsing (BMP/WAV) without
  *     any codec stack;
  *   - [[StubCodec]] — deterministic fake decodes from byte content, for
  *     formats with no JDK codec (MP3, MP4, WebP...) and for the
  *     feature/frame paths, which need pixel/sample decoding a production
  *     deployment would back with a JNI library.
  */
object MultimodalOps {

  // ImageIO defaults to a DISK-backed stream cache: every decode of an
  // in-memory payload creates (and deletes) a temp file, which both
  // costs a file round-trip per row and serializes concurrent decode
  // tasks on the filesystem (measured as bimodal q227/q92 wall times
  // once the decode ran 32-way). The payloads here are byte arrays —
  // a memory-backed stream is strictly cheaper and bit-identical.
  // JVM-global, executor-side: runs once per executor classload.
  javax.imageio.ImageIO.setUseCache(false)

  /** Metadata carried alongside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // e.g. jpeg, wav, mp4
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_bytes", LongType)))

  /** A pluggable decoder: bytes → (meta, feature vector). */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte], mediaType: String): Row // mediaMetaSchema
    def features(bytes: Array[Byte], dim: Int): Array[Float]
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** Deterministic fake codec — byte-content-derived values so tests are
    * reproducible across runs and partitionings. Swap for a real codec.
    * Decode metadata derives from the engine-portable [[graft.expr.Hash60]]
    * so the whole decode path is verifiable against an independent SQL
    * engine (see the q49 DuckDB oracle); features/frames use a local
    * polynomial (spec-verified only — they never cross engines). */
  object StubCodec extends MediaCodec {
    private def h(bytes: Array[Byte], salt: Long): Long = {
      var acc = 1125899906842597L ^ salt
      var i = 0
      while (i < bytes.length) { acc = acc * 31 + bytes(i); i += 1 }
      acc
    }
    def decode(bytes: Array[Byte], mediaType: String): Row = {
      val k = graft.expr.Hash60.hash(bytes) // positive 60-bit
      Row(mediaType, if (mediaType == "image") "jpeg" else "wav",
        (k % 1920 + 1).toInt, ((k >> 16) % 1080 + 1).toInt,
        (k >> 32) % 60000, bytes.length.toLong)
    }
    def features(bytes: Array[Byte], dim: Int): Array[Float] =
      Array.tabulate(dim)(i => (math.floorMod(h(bytes, i), 2000001L) / 1000000.0f) - 1.0f)
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val step = math.max(bytes.length / math.max(n, 1), 1)
      (0 until math.min(n, bytes.length)).map(i =>
        bytes.slice(i * step, math.min(i * step + step, bytes.length)))
    }
  }

  /** REAL decoder for self-describing container formats — no media
    * library required, because BMP and WAV carry their geometry/timing in
    * plain little-endian header fields. Payloads that are neither fall
    * back to the deterministic [[StubCodec]] (compressed codecs — JPEG,
    * PNG, MP3 — still need a library in production). This is the honest
    * split of "stubbed": the container parsing is real and spec-verified
    * against hand-built files; only entropy-coded pixel/sample DECODING
    * is faked. */
  object HeaderCodec extends MediaCodec {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
      b.length >= o + s.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

    def decode(bytes: Array[Byte], mediaType: String): Row = {
      if (ascii(bytes, 0, "BM") && bytes.length >= 26) {
        // BITMAPINFOHEADER: int32 width @18, int32 height @22 (negative =
        // top-down row order; geometry is the magnitude)
        Row(mediaType, "bmp", math.abs(le32(bytes, 18)), math.abs(le32(bytes, 22)),
          0L, bytes.length.toLong)
      } else if (ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE")) {
        // walk RIFF chunks for fmt (byte rate) and data (payload size);
        // chunk sizes come from untrusted bytes, so a negative or
        // non-advancing size (sz == -8 keeps off fixed; any negative sz
        // moves it backwards) must abort the walk, not spin the executor
        var off = 12
        var byteRate = 0
        var dataLen = -1L
        var corrupt = false
        while (!corrupt && off + 8 <= bytes.length && (byteRate == 0 || dataLen < 0)) {
          val sz = le32(bytes, off + 4)
          if (sz < 0) corrupt = true
          else {
            if (ascii(bytes, off, "fmt ") && off + 8 + 16 <= bytes.length)
              byteRate = le32(bytes, off + 16)
            else if (ascii(bytes, off, "data"))
              dataLen = sz.toLong
            // advance in Long: a near-Int.MaxValue sz would wrap the Int
            // sum negative and re-enter the loop with a bogus offset
            val next = off.toLong + 8L + sz.toLong + (sz & 1)
            if (next > bytes.length.toLong) off = bytes.length // walk done
            else off = next.toInt // chunks are word-aligned
          }
        }
        if (corrupt) StubCodec.decode(bytes, mediaType)
        else {
          val durationMs = if (byteRate > 0 && dataLen >= 0) dataLen * 1000L / byteRate else 0L
          Row(mediaType, "wav", 0, 0, durationMs, bytes.length.toLong)
        }
      } else StubCodec.decode(bytes, mediaType)
    }
    // feature extraction / frame sampling still go through the stub —
    // real ones need pixel/sample decoding
    def features(bytes: Array[Byte], dim: Int): Array[Float] = StubCodec.features(bytes, dim)
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = StubCodec.sampleFrames(bytes, n)
  }

  /** REAL decoder backed by the JDK's own media stacks — no external
    * library: `javax.imageio.ImageIO` parses PNG/JPEG/GIF/BMP geometry
    * (reader metadata only — pixels are never decoded, so this is a header
    * read even for multi-MB images) and `javax.sound.sampled.AudioSystem`
    * parses WAV/AIFF/AU timing. Anything neither stack recognizes falls
    * back to [[HeaderCodec]] (which itself falls back to the deterministic
    * stub), so the codec is total. This retires the "entropy-coded decode
    * is stubbed" caveat for every format the JDK ships a codec for;
    * feature extraction / frame sampling still need pixel decoding and
    * remain stubbed. */
  object JdkCodec extends MediaCodec {
    def decode(bytes: Array[Byte], mediaType: String): Row = {
      imageMeta(bytes, mediaType)
        .orElse(audioMeta(bytes, mediaType))
        .getOrElse(HeaderCodec.decode(bytes, mediaType))
    }

    private def imageMeta(bytes: Array[Byte], mediaType: String): Option[Row] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            Some(Row(mediaType, r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0),
              0L, bytes.length.toLong))
          } finally r.dispose()
        }
      } catch { case _: Exception => None } finally iis.close()
    }

    private def audioMeta(bytes: Array[Byte], mediaType: String): Option[Row] = {
      // one SPI parse on the common path: the file format carries type,
      // frame length AND the audio format. Some SPIs report
      // NOT_SPECIFIED (-1) at the file-format level while the decoded
      // stream knows the count — only then pay the second parse, so
      // durationMs can't silently regress to 0 for those formats
      try {
        val aff = javax.sound.sampled.AudioSystem
          .getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
        val fmt = aff.getFormat
        val frames0 = aff.getFrameLength
        val frames =
          if (frames0 >= 0) frames0
          else {
            val ais = javax.sound.sampled.AudioSystem
              .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
            try ais.getFrameLength finally ais.close()
          }
        val durationMs =
          if (frames >= 0 && fmt.getFrameRate > 0) (frames * 1000L) / fmt.getFrameRate.toLong
          else 0L
        val name = aff.getType.getExtension.toLowerCase
        Some(Row(mediaType, name, 0, 0, durationMs, bytes.length.toLong))
      } catch { case _: Exception => None }
    }

    def features(bytes: Array[Byte], dim: Int): Array[Float] = StubCodec.features(bytes, dim)
    def sampleFrames(bytes: Array[Byte], n: Int): Seq[Array[Byte]] = StubCodec.sampleFrames(bytes, n)
  }

  /** Deterministic real-media generators for tests and oracle-gated
    * instances: genuine PNG (via ImageIO) and PCM WAV payloads whose
    * decoded geometry/timing is a pure function of the inputs — so an
    * independent SQL engine can predict what a REAL decode must return
    * without being able to decode the bytes itself. */
  object MediaGen {
    /** Deterministic 8×8 grayscale PNG for the q222 perceptual-dedup
      * gate: row y of group g = id/10 takes its 8 pixel values from the
      * first 16 hex chars of md5("g:y") (full 64-pixel entropy per
      * group — an earlier scalar-offset-mod-256 pattern had only 256
      * distinct base images, so duplicate clusters grew with the corpus
      * and the pair set went quadratic), with ONE noise pixel at
      * position id mod 64 brightened by +128 mod 256 — ids sharing
      * id/10 are near-duplicate images differing in one pixel. The
      * closed pixel form is what the SQL oracle recomputes (PNG is
      * lossless, so decode returns exactly these values — the q92
      * convention; DuckDB's md5 hex matches). */
    def pngGray8x8(id: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val md = java.security.MessageDigest.getInstance("MD5")
      var y = 0
      while (y < 8) {
        val hex = md.digest(s"${id / 10}:$y".getBytes("UTF-8"))
          .take(8).map(b => f"${b & 0xff}%02x").mkString
        var x = 0
        while (x < 8) {
          val base = Integer.parseInt(hex.substring(2 * x, 2 * x + 2), 16)
          val g = if (y * 8 + x == id % 64) (base + 128) % 256 else base
          img.setRGB(x, y, g * 0x010101)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def pngBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) { // deterministic pixel pattern (payload content is irrelevant)
        var x = 0
        while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** 8-bit mono PCM at `sampleRate` Hz with `nSamples` samples —
      * duration_ms = nSamples * 1000 / sampleRate exactly. */
    def wavBytes(sampleRate: Int, nSamples: Int): Array[Byte] = {
      val b = new Array[Byte](44 + nSamples)
      def put(o: Int, s: String): Unit = s.indices.foreach(i => b(o + i) = s.charAt(i).toByte)
      def le32(o: Int, v: Int): Unit = (0 until 4).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
      def le16(o: Int, v: Int): Unit = (0 until 2).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
      put(0, "RIFF"); le32(4, 36 + nSamples); put(8, "WAVE")
      put(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */); le16(22, 1 /* mono */)
      le32(24, sampleRate); le32(28, sampleRate /* byteRate */); le16(32, 1); le16(34, 8)
      put(36, "data"); le32(40, nSamples)
      var i = 0
      while (i < nSamples) { b(44 + i) = ((i * 7) & 0x7f).toByte; i += 1 }
      b
    }

    /** Deterministic 512-sample 8-bit mono WAV for the q225 audio-dedup
      * gate: block b = j/16 of group g = id/10 takes its 16 sample
      * values from the 32 hex chars of md5("g:b") (full entropy per
      * group — the q222 fixture lesson), with the 8 samples of ONE
      * noise segment (segment id mod 64) shifted by +128 mod 256 — ids
      * sharing id/10 are near-duplicate clips differing in one segment.
      * The closed sample form is what the SQL oracle recomputes (PCM is
      * raw bytes, so the decode returns exactly these values). */
    def wavSeeded(id: Long): Array[Byte] = {
      val n = 512
      val b = wavBytes(8000, n)
      val md = java.security.MessageDigest.getInstance("MD5")
      var j = 0
      var hex = ""
      while (j < n) {
        if (j % 16 == 0)
          hex = md.digest(s"${id / 10}:${j / 16}".getBytes("UTF-8"))
            .map(x => f"${x & 0xff}%02x").mkString
        val base = Integer.parseInt(hex.substring(2 * (j % 16), 2 * (j % 16) + 2), 16)
        val v = if (j / 8 == id % 64) (base + 128) % 256 else base
        b(44 + j) = v.toByte
        j += 1
      }
      b
    }
  }

  /** Decode media payloads: adds a `meta` struct column. Runs distributed
    * via mapPartitions in `batchSize` record batches (the batch shape a
    * vectorized codec would want). */
  def decode(df: DataFrame, bytesCol: String, mediaTypeCol: String,
             codec: MediaCodec = StubCodec, batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("meta", mediaMetaSchema)
    val bytesIdx = inSchema.fieldIndex(bytesCol)
    val typeIdx = inSchema.fieldIndex(mediaTypeCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          // null payload (failed upstream fetch) → null meta, not an NPE
          // that kills the task for one bad row
          val bytes = row.getAs[Array[Byte]](bytesIdx)
          val meta = if (bytes == null) null else codec.decode(bytes, row.getString(typeIdx))
          Row.fromSeq(row.toSeq :+ meta)
        }
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** 8×8 AVERAGE-HASH perceptual image fingerprint (the classic aHash:
    * downsample to an 8×8 grayscale grid, bit i = cell i brighter than
    * the grid mean) — the image near-dup signature that survives
    * re-encoding, resizing, and small edits, where byte-exact hashing
    * sees distinct files. Pair with [[graft.functions.DedupOps
    * .hammingNearDupPairs]] for the blocked candidate join — the image
    * leg of the dedup family (exact q15, MinHash q21, SimHash q22,
    * embedding q25, now perceptual).
    *
    * Deterministic INTEGER arithmetic end to end: grayscale is
    * (r+g+b)/3 integer division, pooling is per-cell integer mean over
    * the exact pixel partition (x·8 div w, y·8 div h), the threshold is
    * the integer mean of the 64 cell values, strict `>` — so the hash
    * is reproducible on any engine and the q222 oracle recomputes it
    * from the generator's closed pixel form (lossless PNG round-trip,
    * the q92 convention).
    *
    * Scale shape: one [[decode]]-style batched mapPartitions pass (the
    * JDK pixel decode is per-row imperative work no Expression can
    * host); output is 16 bytes a row. Undecodable payloads drop with a
    * null-skip, never a task failure.
    *
    * @return (idCol, ahash): bit y·8+x set iff cell (x, y) > mean */
  def averageHash(df: DataFrame, idCol: String, bytesCol: String,
                  batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("__ah_id", LongType), StructField("ahash", LongType)))
    val in = df.select(col(idCol).cast("long"), col(bytesCol))
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { row =>
        val bytes = if (row.isNullAt(1)) null else row.getAs[Array[Byte]](1)
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth; val h = img.getHeight
          val sums = new Array[Long](64); val cnts = new Array[Long](64)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val gray = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
              val cell = (y * 8 / h) * 8 + (x * 8 / w)
              sums(cell) += gray; cnts(cell) += 1
              x += 1
            }
            y += 1
          }
          val cells = Array.tabulate(64)(i => if (cnts(i) == 0) 0L else sums(i) / cnts(i))
          val mean = cells.sum / 64
          var hash = 0L; var i = 0
          while (i < 64) { if (cells(i) > mean) hash |= (1L << i); i += 1 }
          Iterator.single(Row(row.getLong(0), hash))
        }
      })
    }(Encoders.row(outSchema)).toDF()
      .select(col("__ah_id").as(idCol), col("ahash"))
  }

  /** 64-SEGMENT ENERGY HASH audio fingerprint — the audio leg of the
    * perceptual-dedup family ([[averageHash]] for images): decode the
    * clip with the REAL JDK audio stack (AudioSystem, 8-bit mono PCM),
    * split the samples into 64 equal time segments, energy(s) =
    * Σ |v − 128| over the segment's samples (all-integer), bit s set
    * iff energy(s) > the integer mean of the 64 energies. Re-encoded,
    * trimmed-silence, or lightly-edited copies keep most bits, where
    * byte hashing sees distinct files; pair with
    * [[graft.functions.DedupOps.hammingNearDupPairs]] for the blocked
    * candidate join.
    *
    * Same determinism contract as [[averageHash]]: integer arithmetic
    * end to end, strict `>`, segment s of n samples covers indices with
    * j·64 div n = s — reproducible on any engine, so the q225 oracle
    * recomputes the hash from the generator's closed sample form.
    * Undecodable or non-8-bit payloads drop with a null-skip.
    *
    * @return (idCol, ehash): bit s set iff segment s is above-mean */
  def audioEnergyHash(df: DataFrame, idCol: String, bytesCol: String,
                      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("__eh_id", LongType), StructField("ehash", LongType)))
    val in = df.select(col(idCol).cast("long"), col(bytesCol))
    in.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { row =>
        val bytes = if (row.isNullAt(1)) null else row.getAs[Array[Byte]](1)
        val samples: Array[Int] =
          if (bytes == null) null
          else
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 8 || fmt.getChannels != 1) null
              else ais.readAllBytes().map(b => b & 0xff)
            } catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException => null
              case _: java.io.IOException => null
            }
        if (samples == null || samples.isEmpty) Iterator.empty
        else {
          val n = samples.length
          val energy = new Array[Long](64)
          var j = 0
          while (j < n) {
            energy((j.toLong * 64 / n).toInt) += math.abs(samples(j) - 128)
            j += 1
          }
          val mean = energy.sum / 64
          var hash = 0L; var s = 0
          while (s < 64) { if (energy(s) > mean) hash |= (1L << s); s += 1 }
          Iterator.single(Row(row.getLong(0), hash))
        }
      })
    }(Encoders.row(outSchema)).toDF()
      .select(col("__eh_id").as(idCol), col("ehash"))
  }

  /** Feature-extract: adds an `embedding` Array[Float] column. */
  def featureExtract(df: DataFrame, bytesCol: String, dim: Int = 64,
                     codec: MediaCodec = StubCodec, batchSize: Int = 64): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("embedding", ArrayType(FloatType))
    val bytesIdx = inSchema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.map { row =>
        val bytes = row.getAs[Array[Byte]](bytesIdx)
        val feats = if (bytes == null) null else codec.features(bytes, dim).toSeq
        Row.fromSeq(row.toSeq :+ feats)
      })
    }(Encoders.row(outSchema)).toDF()
  }

  /** Frame-sample: one output row per sampled frame (id columns carried). */
  def sampleFrames(df: DataFrame, bytesCol: String, n: Int,
                   codec: MediaCodec = StubCodec): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields.filter(_.name != bytesCol))
      .add("frame_idx", IntegerType).add("frame", BinaryType)
    val bytesIdx = inSchema.fieldIndex(bytesCol)
    val keepIdx = inSchema.fields.zipWithIndex.collect { case (f, i) if f.name != bytesCol => i }
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](bytesIdx)
        if (bytes == null) Nil
        else codec.sampleFrames(bytes, n).zipWithIndex.map {
          case (frame, i) => Row.fromSeq(keepIdx.map(row.get).toSeq ++ Seq(i, frame))
        }
      }
    }(Encoders.row(outSchema)).toDF()
  }

  /** Pure-expression resize marker: records the requested size in the meta
    * struct (a real implementation rewrites bytes; the plumbing —
    * projection through a struct column — is identical). */
  def withTargetSize(df: DataFrame, metaCol: String, w: Int, hgt: Int): DataFrame =
    df.withColumn(metaCol, struct(
      col(s"$metaCol.media_type"), col(s"$metaCol.format"),
      lit(w).as("width"), lit(hgt).as("height"),
      col(s"$metaCol.duration_ms"), col(s"$metaCol.n_bytes")))
}
