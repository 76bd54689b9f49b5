package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, flowing through Spark with real schema,
  * partitioning and batch shape.
  *
  * Image and audio decode are REAL JDK codecs ([[MediaCodecs]]):
  * `javax.imageio` PNG and `javax.sound.sampled` WAV/PCM16 — features come
  * from actually-decoded pixels and samples, no external jars. Only the
  * VIDEO face keeps the clearly-marked deterministic STUB ([[FakeDecoder]],
  * a tiny self-describing header): no video codec ships with the JDK. The
  * surrounding contract — schema, `mapPartitions` batch execution (one
  * decoder instantiation per partition, the same shape a JNI/codec binding
  * needs), partition sizing, and the feature output — is identical across
  * the three kinds, so swapping the video stub for a real codec changes
  * nothing downstream.
  */
object BinaryPipeline {

  /** Typed metadata carried alongside the payload. */
  case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],  // opaque encoded bytes
      source: String)

  /** Per-media features, populated from the REAL decode of each kind:
    *   - image: `width`/`height` from the decoded PNG, `frames` = 1,
    *     `decoded_bytes` = w*h*3 (RGB24 raster), `content_sum` = Σ(r+g+b)
    *     over every decoded pixel;
    *   - audio: `frames` = PCM frame count from the WAV header,
    *     `decoded_bytes` = 2*frames (16-bit mono), `content_sum` = Σ of the
    *     decoded signed samples (can be negative);
    *   - video (stub codec): `width`/`height` from the GRFT header,
    *     `decoded_bytes` = content length, `content_sum` = 0 — loudly NOT a
    *     real decode, see [[FakeDecoder]].
    * `n_bytes`/`checksum` are over the raw encoded payload for all kinds.
    */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      frames: Long,
      decoded_bytes: Long,
      content_sum: Long,
      checksum: Long)        // rolling checksum over payload bytes

  /** Real JDK codecs for the image and audio kinds. PNG via `javax.imageio`
    * (lossless, so solid-color fixtures decode to exactly the encoded RGB);
    * WAV via `javax.sound.sampled` (PCM16 mono little-endian; the JDK
    * writer emits the canonical 44-byte RIFF header, so encoded size is
    * exactly 44 + 2*frames — spec-pinned). Decoders take and return plain
    * byte arrays so they drop into the per-partition batch shape unchanged.
    */
  object MediaCodecs {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    val SampleRateHz = 8000f

    /** Decode image bytes to a raster, or fail loudly (ImageIO.read
      * returns null on an unrecognized payload). */
    def readImage(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      img
    }

    /** Encode a raster as PNG bytes. */
    def writePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Encode a solid-RGB PNG (fixture generator; any PNG decodes). */
    def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      writePng(img)
    }

    /** Pixel features over an ALREADY-DECODED raster: (width, height,
      * Σ(r+g+b) over pixels). Factored from [[decodeImage]] so a fused
      * features→resize stage can reuse one decode ([[featuresAndResize]],
      * r11 verdict task 7).
      */
    def rasterFeatures(img: BufferedImage): (Int, Int, Long) = {
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      (w, h, sum)
    }

    /** Decode an image payload: (width, height, Σ(r+g+b) over pixels). */
    def decodeImage(payload: Array[Byte]): (Int, Int, Long) = {
      val (w, h, sum) = rasterFeatures(readImage(payload))
      (w, h, sum)
    }

    /** Bilinear-rescale a decoded raster to fit `maxDim` preserving aspect
      * ratio (never upscales). Shared by [[resizeMedia]] and the fused
      * [[featuresAndResize]] so the two paths are byte-identical.
      */
    def resizeRaster(img: BufferedImage, maxDim: Int): BufferedImage = {
      val (w, h) = (img.getWidth, img.getHeight)
      val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
      val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
      val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, nw, nh, null)
      g.dispose()
      out
    }

    /** Encode PCM16 mono samples as a WAV file. */
    def encodeWav(samples: Array[Short]): Array[Byte] = {
      val pcm = new Array[Byte](2 * samples.length)
      var i = 0
      while (i < samples.length) {
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(SampleRateHz, 16, 1, true, false)
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode an audio payload: (frame count, Σ of decoded signed samples). */
    def decodeWav(payload: Array[Byte]): (Long, Long) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"unexpected WAV shape: $fmt")
        val frames = ais.getFrameLength
        val bytes = ais.readAllBytes()
        var sum = 0L
        var i = 0
        while (i + 1 < bytes.length) {
          sum += ((bytes(i) & 0xff) | (bytes(i + 1).toInt << 8)).toShort
          i += 2
        }
        (frames, sum)
      } finally ais.close()
    }
  }

  /** STUB decoder for the VIDEO kind only (no JDK video codec exists).
    *
    * Payload layout (written by [[encodeFake]]): 4 bytes magic "GRFT",
    * 4 bytes width, 4 bytes height (big-endian), then raw content bytes.
    * A real implementation would replace `decode` with an image/audio
    * library call; the surrounding pipeline would not change.
    */
  object FakeDecoder {
    val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")

    def decode(payload: Array[Byte]): (Int, Int) = {
      require(payload.length >= 12 && payload.take(4).sameElements(Magic),
        "not a GRFT payload")
      def be32(off: Int): Int =
        ((payload(off) & 0xff) << 24) | ((payload(off + 1) & 0xff) << 16) |
          ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
      (be32(4), be32(8))
    }

    /** Deterministic polynomial rolling checksum (mod 2^31-1). */
    def checksum(payload: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < payload.length) {
        h = (h * 31 + (payload(i) & 0xff)) % 2147483647L
        i += 1
      }
      h
    }
  }

  /** Build a fake encoded payload (test/fixture helper). */
  def encodeFake(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
    def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    FakeDecoder.Magic ++ be32(width) ++ be32(height) ++ content
  }

  /** Decode + feature-extract over a media Dataset. Image and audio rows go
    * through the REAL JDK codecs ([[MediaCodecs]]); video through the stub.
    *
    * `mapPartitions` so decoder state is instantiated once per partition
    * (not per row) — the standard shape for codec/model handles.
    * Repartitions to `targetPartitions` first: media payloads are large and
    * skewed, so partition count is sized by byte budget, not row count.
    */
  def extractFeatures(media: Dataset[MediaRecord],
      targetPartitions: Int = 0): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val sized = if (targetPartitions > 0) media.repartition(targetPartitions) else media
    sized.mapPartitions { it =>
      // per-partition decoder init (ImageIO scans its reader SPI registry
      // lazily on first use; one scan per partition, then cached)
      it.map { r =>
        val base = (r.media_id, r.kind, r.payload.length.toLong,
          FakeDecoder.checksum(r.payload))
        r.kind match {
          case "image" =>
            val (w, h, pixelSum) = MediaCodecs.decodeImage(r.payload)
            MediaFeatures(base._1, base._2, base._3, w, h,
              frames = 1L, decoded_bytes = w.toLong * h * 3,
              content_sum = pixelSum, checksum = base._4)
          case "audio" =>
            val (frames, sampleSum) = MediaCodecs.decodeWav(r.payload)
            MediaFeatures(base._1, base._2, base._3, 0, 0,
              frames = frames, decoded_bytes = 2L * frames,
              content_sum = sampleSum, checksum = base._4)
          case _ =>
            val (w, h) = FakeDecoder.decode(r.payload)
            MediaFeatures(base._1, base._2, base._3, w, h,
              frames = 0L, decoded_bytes = (r.payload.length - 12).toLong,
              content_sum = 0L, checksum = base._4)
        }
      }
    }
  }

  /** Re-encoded media after a resize — same record shape so stages chain. */
  case class ResizedMedia(
      media_id: Long,
      kind: String,
      payload: Array[Byte],
      source: String,
      orig_width: Int,
      orig_height: Int)

  /** Resize stage. For the image kind this is a REAL resize: decode the PNG,
    * rescale the raster with `Graphics2D.drawImage` (bilinear) to fit
    * `maxDim` preserving aspect ratio, re-encode as PNG — the output payload
    * decodes to the new dimensions. Non-image kinds keep the stub transform
    * (header rewrite, content unchanged) so the stage chains uniformly.
    */
  def resizeMedia(media: Dataset[MediaRecord], maxDim: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition codec/scaler init would go here
      it.map { r =>
        if (r.kind == "image") {
          val img = MediaCodecs.readImage(r.payload)
          val (w, h) = (img.getWidth, img.getHeight)
          val out = MediaCodecs.resizeRaster(img, maxDim)
          ResizedMedia(r.media_id, r.kind, MediaCodecs.writePng(out), r.source, w, h)
        } else {
          val (w, h) = FakeDecoder.decode(r.payload)
          val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
          val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          val content = r.payload.drop(12) // stub "rescale": content unchanged
          ResizedMedia(r.media_id, r.kind, encodeFake(nw, nh, content), r.source, w, h)
        }
      }
    }
  }

  /** The fused features→resize row: every [[MediaFeatures]] column plus the
    * resize outputs, produced from ONE decode of the payload.
    */
  case class MediaPipelineRow(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      frames: Long,
      decoded_bytes: Long,
      content_sum: Long,
      checksum: Long,
      new_width: Int,
      new_height: Int,
      resized_payload: Array[Byte])

  /** Fused feature-extraction + resize — the single-decode chain (r11
    * verdict task 7). Composing [[extractFeatures]] andThen [[resizeMedia]]
    * decodes every image payload TWICE; at the 100× replica decode is ~half
    * of the 102.9 s media face, so the fusion halves the chained cost. Here
    * each image decodes once: features come from the raster
    * ([[MediaCodecs.rasterFeatures]]) and the resized payload from the SAME
    * raster ([[MediaCodecs.resizeRaster]] — literally the code
    * [[resizeMedia]] runs, so the two paths stay byte-identical;
    * BinaryPipelineSpec pins it). Audio has no resize: the payload passes
    * through with new dims 0 (unlike [[resizeMedia]]'s non-image branch,
    * which presumes GRFT stub payloads, this face takes each kind on its
    * own terms). Video keeps the stub header rescale.
    */
  def featuresAndResize(media: Dataset[MediaRecord], maxDim: Int,
      targetPartitions: Int = 0): Dataset[MediaPipelineRow] = {
    import media.sparkSession.implicits._
    val sized = if (targetPartitions > 0) media.repartition(targetPartitions) else media
    sized.mapPartitions { it =>
      it.map { r =>
        val nBytes = r.payload.length.toLong
        val csum = FakeDecoder.checksum(r.payload)
        r.kind match {
          case "image" =>
            val img = MediaCodecs.readImage(r.payload) // the ONLY decode
            val (w, h, pixelSum) = MediaCodecs.rasterFeatures(img)
            val out = MediaCodecs.resizeRaster(img, maxDim)
            MediaPipelineRow(r.media_id, r.kind, nBytes, w, h,
              frames = 1L, decoded_bytes = w.toLong * h * 3,
              content_sum = pixelSum, checksum = csum,
              new_width = out.getWidth, new_height = out.getHeight,
              resized_payload = MediaCodecs.writePng(out))
          case "audio" =>
            val (frames, sampleSum) = MediaCodecs.decodeWav(r.payload)
            MediaPipelineRow(r.media_id, r.kind, nBytes, 0, 0,
              frames = frames, decoded_bytes = 2L * frames,
              content_sum = sampleSum, checksum = csum,
              new_width = 0, new_height = 0, resized_payload = r.payload)
          case _ =>
            val (w, h) = FakeDecoder.decode(r.payload)
            val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
            val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
            MediaPipelineRow(r.media_id, r.kind, nBytes, w, h,
              frames = 0L, decoded_bytes = (r.payload.length - 12).toLong,
              content_sum = 0L, checksum = csum,
              new_width = nw, new_height = nh,
              resized_payload = encodeFake(nw, nh, r.payload.drop(12)))
        }
      }
    }
  }

  /** One sampled frame of a video payload. */
  case class Frame(media_id: Long, frame_no: Int, offset: Long, frame_bytes: Array[Byte])

  /** Frame sampling (STUB codec, real dataflow): emit every `stride`-th
    * fixed-size chunk of the content as a "frame" — the 1:N generator shape
    * (flatMap over partitions) a real video decoder produces. Frames carry
    * (media_id, frame_no, byte offset) so downstream feature extraction can
    * key on them.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int = 64,
      stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        val content = r.payload.drop(12)
        content.grouped(frameSize).zipWithIndex.collect {
          case (chunk, i) if i % stride == 0 =>
            Frame(r.media_id, i, 12L + i.toLong * frameSize, chunk)
        }
      }
    }
  }

  /** Perceptual-hash-style near-duplicate MEDIA pairs: decode each payload
    * (per-partition decoder shape, headers validated), fingerprint the
    * decoded CONTENT with a 60-bit SimHash over its character 4-grams, and
    * find pairs within hamming ≤ `maxHamming` via the capped quarter-band
    * machinery shared with text SimHash ([[graft.operators.Dedup]]).
    *
    * This is the dedup face the multimodal tier was missing (r8 verdict
    * task 6): the same banding/verification a real perceptual hash (pHash/
    * dHash over downsampled pixels) plugs into — a real codec would swap
    * the gram extraction for DCT-coefficient signs and nothing downstream
    * changes. The stub decode makes content = the synthetic payload's
    * UTF-8 text, which is what keeps the face oracle-checkable: DuckDB
    * recomputes the identical fingerprints from the documents table.
    */
  def mediaNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int = 6)
      : DataFrame = {
    import media.sparkSession.implicits._
    val decoded = media.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { r =>
        FakeDecoder.decode(r.payload) // header validation, same as features
        (r.media_id,
          new String(r.payload.drop(12), java.nio.charset.StandardCharsets.UTF_8))
      }
    }.toDF("media_id", "content")
    val grams = expr(
      "CASE WHEN length(content) >= 4 " +
        "THEN transform(sequence(1, length(content) - 3), i -> substring(content, i, 4)) " +
        "ELSE CAST(array() AS ARRAY<STRING>) END")
    val fps = graft.operators.Dedup
      .simhashLongOver(decoded, "media_id", grams)
      .withColumnRenamed("media_id", "id")
    graft.operators.Dedup
      .simhashNearDupPairs(fps, "mediaNearDupPairs", maxHamming)
      .withColumnRenamed("doc_a", "media_a")
      .withColumnRenamed("doc_b", "media_b")
  }

  /** Driver face over the synthetic media table. */
  def mediaNearDup(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame =
    mediaNearDupPairs(syntheticMediaFromDocuments(s, d), maxHamming)

  /** Synthesize a media table with REAL encoded payloads (deterministic from
    * doc_id, no external data):
    *   - image (doc_id % 3 == 0): a genuine PNG, (id%61+4) × (id%37+4) px,
    *     solid RGB (id*37 % 256, id*59 % 256, id*83 % 256) — so the decoded
    *     pixel features are closed-form in doc_id and the DuckDB oracle can
    *     recompute them without a codec;
    *   - audio (doc_id % 3 == 1): a genuine WAV, (id%800+50) PCM16 frames of
    *     constant sample value (id%2000 − 1000);
    *   - video (doc_id % 3 == 2): the GRFT stub payload over the document
    *     text (no JDK video codec), dims (id%640+1) × (id%480+1).
    */
  def syntheticRealMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] =
    syntheticRealMedia(spark, dir, None)

  /** `onlyKind` prunes the SOURCE SCAN to one kind's doc_id residue before
    * any payload is synthesized. This closed the r12 verdict's
    * q_media_features-vs-pipeline gap (task 5): the frame-sampling leg used
    * to take the FULL synthesized table and filter `_.kind == "video"`
    * AFTER the typed map — a second full synthesis pass whose PNG/WAV
    * encodes (the dominant cost; encode ≳ decode for PNG) were built only
    * to be dropped. A kind-pruned second pass synthesizes ⅓ of the rows,
    * all of them the cheap stub payloads — and with a REAL media table the
    * same predicate is a partition/pushdown filter on the `kind` column,
    * which is why the knob belongs on the source, not after the codec.
    */
  def syntheticRealMedia(spark: SparkSession, dir: String,
      onlyKind: Option[String]): Dataset[MediaRecord] = {
    import spark.implicits._
    val residue = onlyKind.map {
      case "image" => 0L
      case "audio" => 1L
      case "video" => 2L
      case other => throw new IllegalArgumentException(s"unknown kind: $other")
    }
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
    residue.map(r => docs.filter(col("doc_id") % 3 === r)).getOrElse(docs)
      .as[(Long, String, String)]
      .mapPartitions { it =>
        // per-partition: ImageIO SPI registry warms once, then row loop
        it.map { case (id, text, source) =>
          (id % 3) match {
            case 0 =>
              val rgb = (((id * 37) % 256).toInt << 16) |
                (((id * 59) % 256).toInt << 8) | ((id * 83) % 256).toInt
              MediaRecord(id, "image",
                MediaCodecs.encodePng((id % 61).toInt + 4, (id % 37).toInt + 4, rgb),
                source)
            case 1 =>
              val v = ((id % 2000) - 1000).toShort
              MediaRecord(id, "audio",
                MediaCodecs.encodeWav(Array.fill((id % 800).toInt + 50)(v)), source)
            case _ =>
              MediaRecord(id, "video",
                encodeFake((id % 640).toInt + 1, (id % 480).toInt + 1,
                  text.getBytes("UTF-8")), source)
          }
        }
      }
  }

  /** Synthesize an all-GRFT media table from `documents` text bytes — the
    * fixture for the perceptual near-dup face, whose "decoded content" must
    * be the document text so DuckDB can recompute identical fingerprints.
    */
  def syntheticMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val content = text.getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRecord(id, kind,
          encodeFake((id % 640).toInt + 1, (id % 480).toInt + 1, content), source)
      }
  }
}
