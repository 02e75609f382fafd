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

/** Multimodal-column plumbing: binary payloads flow through typed
  * Datasets; decode / feature-extract runs per-partition in batches
  * (the Scala analog of `mapInPandas` — one iterator pass, no
  * per-row UDF dispatch, arrow-style batch amortization left to the
  * vectorized reader).
  *
  * The actual media decode is STUBBED (this environment has no
  * image/audio codecs): `decodeStub` produces deterministic fake
  * features purely from the bytes, so the Spark-side plumbing —
  * schema, batch shape, partition-wise execution, metadata pruning —
  * is real and testable, and swapping in a real codec changes one
  * function.
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
}
