package graft.stream

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Change-log retention — the engine-side half of R4.
  *
  * The reference can ask the server for the oldest retained log position
  * and refuses to stream from an offset older than that
  * (`InformixConnection.java:105-120`). For a file-based change log the
  * equivalent server state is a retention marker maintained by whoever
  * garbage-collects old segments: `_retention.json` carries
  * `minRetainedLsn` = every record with lsn < minRetainedLsn may have
  * been deleted.
  */
object LogRetention {

  private val mapper = new ObjectMapper()

  private def markerPath(logDir: String) = Paths.get(logDir, "_retention.json")

  /** Min retained LSN of the log (0 when never truncated). */
  def minRetainedLsn(logDir: String): Long = {
    val p = markerPath(logDir)
    if (!Files.exists(p)) 0L
    else mapper.readTree(Files.readAllBytes(p)).get("minRetainedLsn").asLong()
  }

  /** Garbage-collect log segments fully below `beforeLsn` (every record
    * in the file has lsn < beforeLsn) and advance the retention marker.
    * Returns the number of deleted segment files.
    *
    * `beforeLsn` is additionally BOUNDED by the oldest open transaction
    * still in the log (a tx with records but no COMMIT/ROLLBACK yet):
    * such records precede the applied commit watermark, so a caller
    * passing the watermark would otherwise GC change records the engine
    * still needs when that transaction's COMMIT finally arrives — the
    * reference's restart LSN is likewise the oldest position needed
    * INCLUDING open transactions, not the last committed one
    * (`InformixStreamingChangeEventSource.java:264-267`,
    * `DbzTransactionEngine.java:194-196`).
    */
  def truncate(spark: SparkSession, logDir: String, beforeLsn: Long): Int = {
    val files = graft.util.Fs.listParquet(logDir)
    if (files.isEmpty) return 0
    val log = spark.read.parquet(files: _*)
    val openRow = log.select(col("tx_id"), col("op"), col("lsn"))
      .groupBy(col("tx_id"))
      .agg(min(col("lsn")).as("first_lsn"),
        max(when(col("op").isin("C", "R"), lit(1))).as("closed"))
      .where(col("closed").isNull)
      .agg(min(col("first_lsn")))
      .collect()(0)
    val bound =
      if (openRow.isNullAt(0)) beforeLsn
      else math.min(beforeLsn, openRow.getLong(0))
    // per-segment maxes come from the writer-side manifest when present;
    // only foreign segments pay the content aggregation
    def norm(p: String): String = Paths.get(p).toAbsolutePath.normalize.toString
    val manifest = LsnManifest.readNative(logDir)
    val unknown = files.filterNot(f => manifest.contains(norm(f)))
    val scanned: Map[String, Long] =
      if (unknown.isEmpty) Map.empty
      else spark.read.parquet(unknown: _*)
        .groupBy(input_file_name().as("f"))
        .agg(max(col("lsn")).as("maxLsn"))
        .collect()
        .map { r =>
          // input_file_name yields a URI; strip the scheme for local paths
          val raw = r.getString(0)
          val p = if (raw.startsWith("file:")) raw.stripPrefix("file:") else raw
          norm(p) -> r.getLong(1)
        }.toMap
    val maxPerFile = manifest ++ scanned
    var deleted = 0
    files.foreach { f =>
      val key = norm(f)
      if (maxPerFile.get(key).exists(_ < bound)) {
        if (Files.deleteIfExists(Paths.get(key))) deleted += 1
        LsnManifest.drop(logDir, key)
      }
    }
    val floor = math.max(bound, minRetainedLsn(logDir))
    val n = mapper.createObjectNode()
    n.put("minRetainedLsn", floor)
    val tmp = Paths.get(logDir, s".retention-${java.util.UUID.randomUUID()}.json")
    Files.write(tmp, mapper.writeValueAsString(n).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, markerPath(logDir),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    deleted
  }
}
