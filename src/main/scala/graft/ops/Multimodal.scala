package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque binary payload + typed metadata —
  * the storage shape for image/audio/video columns at scale (payload
  * stays a parquet `binary`; metadata is columnar and prunable).
  */
case class MediaRecord(
    doc_id: Long,
    mime: String,
    payload: Array[Byte],
    declared_len: Int
)

case class MediaFeatures(
    doc_id: Long,
    n_bytes: Int,
    first_byte: Int,
    checksum: Long,
    feature: Seq[Float]
)

/** Image features from a REAL decode: dimensions + per-channel pixel
  * means. `width = -1` marks an undecodable payload (kept, not
  * dropped — at corpus scale you want the failure rate observable).
  */
case class ImageFeatures(
    doc_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    mean: Seq[Float]
)

/** Audio features from a REAL decode of a PCM container (WAV/AIFF):
  * format metadata + root-mean-square amplitude. `sample_rate = -1`
  * marks an undecodable payload.
  */
case class AudioFeatures(
    doc_id: Long,
    sample_rate: Int,
    channels: Int,
    frames: Long,
    rms: Double
)

/** A resized image: source + output dimensions and the re-encoded
  * payload (PNG). `src_w = -1` marks an undecodable input (sentinel
  * row kept, empty payload) — same contract as [[ImageFeatures]].
  */
case class ResizedImage(
    doc_id: Long,
    n_bytes: Int,
    src_w: Int, src_h: Int,
    out_w: Int, out_h: Int,
    out_bytes: Int,
    payload: Array[Byte]
)

/** One sampled frame of a multi-frame container (animated GIF,
  * multi-page TIFF — the formats the JDK's ImageIO readers page
  * through). `n_frames = -1` marks a payload no reader recognizes;
  * such inputs still emit exactly ONE sentinel row so the failure
  * rate stays observable per document.
  */
case class FrameSample(
    doc_id: Long,
    n_bytes: Int,
    n_frames: Int,
    frame_idx: Int,
    width: Int, height: Int,
    mean0: Double
)

/** Multimodal-column plumbing: binary payloads flow through typed
  * Datasets; decode / feature-extract runs per-partition in batches
  * (the Scala analog of `mapInPandas` — one iterator pass, no
  * per-row UDF dispatch, arrow-style batch amortization left to the
  * vectorized reader).
  *
  * Decode is REAL for the formats the JDK itself ships codecs for —
  * javax.imageio (PNG/JPEG/BMP/GIF) and javax.sound.sampled (WAV/AIFF
  * PCM) — no external native libraries involved: [[decodeImage]] /
  * [[decodeAudio]] run the actual decoders inside `mapPartitions`
  * tasks. Formats beyond the JDK's codecs (video, opus, webp, ...)
  * still fall back to [[decodeStub]]'s deterministic byte features,
  * which also remain the small-scale ORACLE surface (a SQL engine can
  * replay byte arithmetic but not a PNG inflater).
  */
object Multimodal {

  /** Wrap a text column as a binary payload (UTF-8) with metadata —
    * stands in for image/audio bytes in tests.
    */
  def toMedia(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      lit("application/octet-stream").as("mime"),
      encode(col(textCol), "UTF-8").as("payload"),
      octet_length(col(textCol)).as("declared_len"))

  /** STUB decoder — deterministic fake standing in for a real codec.
    * Replace with the real image/audio decode when codecs exist; the
    * signature (bytes in, fixed-length feature vector out) is the
    * real contract.
    */
  def decodeStub(payload: Array[Byte]): MediaFeatures = {
    var checksum = 0L
    var i = 0
    while (i < payload.length) { checksum = (checksum * 31 + (payload(i) & 0xff)) & 0xffffffffL; i += 1 }
    val feat = Array.tabulate(4)(j =>
      if (payload.isEmpty) 0f else (payload(j % payload.length) & 0xff).toFloat / 255f)
    MediaFeatures(-1L, payload.length,
      if (payload.isEmpty) -1 else payload(0) & 0xff, checksum,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(feat))
  }

  /** Per-partition batch feature extraction over the binary column.
    * `mapPartitions` so any per-partition decoder state (a real codec
    * context) is initialized once per task, not per row.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-task decoder init would go here (codec context, model, ...)
        it.map { case (id, bytes) => decodeStub(bytes).copy(doc_id = id) }
      }
  }

  /** REAL image decode (JDK javax.imageio — PNG/JPEG/BMP/GIF):
    * dimensions, band count, and per-channel pixel means. Returns the
    * `width = -1` sentinel on undecodable bytes instead of throwing —
    * a web-scale corpus always contains corrupt payloads, and a
    * poisoned task would kill the whole extract job.
    */
  def decodeImage(payload: Array[Byte]): ImageFeatures = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) ImageFeatures(-1L, -1, -1, 0, Seq.empty)
      else {
        val raster = img.getRaster
        val w = img.getWidth; val h = img.getHeight
        val bands = raster.getNumBands
        val sums = new Array[Long](bands)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < bands) { sums(b) += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageFeatures(-1L, w, h, bands,
          scala.collection.immutable.ArraySeq.unsafeWrapArray(
            sums.map(s => (s.toDouble / n).toFloat)))
      }
    } catch { case scala.util.control.NonFatal(_) => ImageFeatures(-1L, -1, -1, 0, Seq.empty) }
  }

  /** REAL audio decode (JDK javax.sound.sampled — WAV/AIFF PCM):
    * format metadata + RMS amplitude normalized to [0, 1]. Same
    * sentinel-not-throw contract as [[decodeImage]].
    */
  def decodeAudio(payload: Array[Byte]): AudioFeatures = {
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        val data = in.readAllBytes()
        val nSamples = data.length / math.max(1, bytesPerSample)
        var sumSq = 0.0
        var i = 0
        val big = fmt.isBigEndian
        while (i + bytesPerSample <= data.length && bytesPerSample == 2) {
          val lo = data(if (big) i + 1 else i) & 0xff
          val hi = data(if (big) i else i + 1)
          val v = ((hi << 8) | lo).toShort / 32768.0
          sumSq += v * v
          i += bytesPerSample
        }
        val rms = if (nSamples == 0 || bytesPerSample != 2) 0.0
          else math.sqrt(sumSq / nSamples)
        AudioFeatures(-1L, fmt.getSampleRate.toInt, fmt.getChannels,
          in.getFrameLength, rms)
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => AudioFeatures(-1L, -1, 0, -1L, 0.0)
    }
  }

  /** Real-decode feature extraction for image payloads (mime
    * image types), per-partition batches. Non-image rows are not
    * silently skipped — they surface with the sentinel shape.
    */
  def extractImageFeatures(media: DataFrame): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeImage(bytes).copy(doc_id = id) })
  }

  /** Real-decode feature extraction for PCM audio payloads. */
  def extractAudioFeatures(media: DataFrame): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeAudio(bytes).copy(doc_id = id) })
  }

  /** REAL image resize (JDK java.awt + imageio, no native libs):
    * decode, bilinear-downscale so max(w, h) == maxDim (never
    * upscales), re-encode as PNG. Sentinel-not-throw on undecodable
    * bytes. The aspect ratio is preserved with integer rounding;
    * output dimensions are never below 1.
    */
  def resizeImage(docId: Long, payload: Array[Byte], maxDim: Int): ResizedImage = {
    val sentinel = ResizedImage(docId, payload.length, -1, -1, -1, -1, -1, Array.emptyByteArray)
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) sentinel
      else {
        val w = img.getWidth; val h = img.getHeight
        val scale = maxDim.toDouble / math.max(w, h)
        val (ow, oh) =
          if (scale >= 1.0) (w, h)
          else (math.max(1, math.round(w * scale).toInt),
                math.max(1, math.round(h * scale).toInt))
        val out = new java.awt.image.BufferedImage(ow, oh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, ow, oh, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        val bytes = bos.toByteArray
        ResizedImage(docId, payload.length, w, h, ow, oh, bytes.length, bytes)
      }
    } catch { case scala.util.control.NonFatal(_) => sentinel }
  }

  /** Per-partition batch resize over the binary column — the thumbnail
    * / model-input-normalization stage of an image pipeline. One task
    * initializes AWT once; rows stream through.
    */
  def resizeImages(media: DataFrame, maxDim: Int): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => resizeImage(id, bytes, maxDim) })
  }

  /** REAL frame sampling over multi-frame containers (animated GIF /
    * multi-page TIFF — the JDK's ImageIO readers page through both):
    * picks k frames uniformly by integer arithmetic
    * (frame j -> index floor(j * n / k'), k' = min(k, n)), decodes
    * only the sampled frames (ImageIO readers seek by index — the
    * whole point of sampling is NOT decoding the rest), and emits
    * width/height + the first band's pixel mean per sampled frame.
    * Unrecognized payloads emit one sentinel row.
    */
  def sampleFrames(docId: Long, payload: Array[Byte], k: Int): Seq[FrameSample] = {
    val sentinel = Seq(FrameSample(docId, payload.length, -1, -1, -1, -1, 0.0))
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) sentinel
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            if (n <= 0) sentinel
            else {
              val kk = math.min(math.max(1, k), n)
              (0 until kk).map { j =>
                val idx = (j.toLong * n / kk).toInt
                val img = r.read(idx)
                val raster = img.getRaster
                val w = img.getWidth; val h = img.getHeight
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
                  y += 1
                }
                FrameSample(docId, payload.length, n, idx, w, h,
                  sum.toDouble / (w.toLong * h))
              }
            }
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => sentinel }
  }

  /** Per-partition frame sampling: one input row fans out to its k
    * sampled frames (flatMap — the explode happens inside the task,
    * never materializing unsampled frames).
    */
  def sampleFramesOf(media: DataFrame, k: Int): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => sampleFrames(id, bytes, k) })
  }
}
