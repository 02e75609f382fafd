package graft.icelite

import org.apache.spark.sql.functions._

/** Table maintenance: file compaction and tombstone GC.
  *
  * Merge batches accumulate a few small files per touched bucket
  * (survivor file + upsert file); compaction rewrites buckets back to
  * one file each. Tombstones (deleted keys kept so late-arriving older
  * events cannot resurrect rows) are purged once their version falls
  * below the log-retention floor — the analog of the reference's
  * offset-validity rule R4 (`InformixConnection.java:105-120`: a
  * restart LSN older than the retained log forces a re-snapshot, so no
  * event below the floor can ever arrive again).
  */
object Maintenance {

  /** Rewrite every bucket to compact files; drop tombstones whose
    * version commit-LSN is strictly below `retentionFloorLsn`.
    * Returns the new snapshot id.
    */
  def compact(table: IceLiteTable, retentionFloorLsn: Long = -1L): Long = {
    val snap = table.refresh()
    val keyCol = snap.keyCol
    val all = table.readMerged(snap.buckets)
    val kept =
      if (retentionFloorLsn < 0) all
      else all.where(!col(IceLite.TOMB) || col(IceLite.VC) >= retentionFloorLsn)
    val commitRel = f"data/compact-${snap.snapshotId}%08d"
    kept
      .withColumn("__bucket", pmod(hash(col(keyCol)), lit(snap.numBuckets)))
      .repartition(snap.numBuckets, col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(table.dataPath(commitRel))
    val written = IceLite.listCommittedFiles(table.root, commitRel)
    // a full-table compaction is only valid against the exact snapshot it
    // folded — any concurrent commit invalidates the rewrite, so there is
    // nothing to retry: fail fast and let the caller rerun the fold
    val cur = table.refresh()
    if (cur.snapshotId != snap.snapshotId)
      throw new IllegalStateException("table changed during compaction; rerun")
    val next = cur.copy(
      snapshotId = cur.snapshotId + 1,
      parentId = cur.snapshotId,
      base = written,
      deltas = Map.empty,
      changed = Map.empty, // compaction adds no logical changes
      summary = cur.summary.copy(note = s"compact(purge<$retentionFloorLsn)"))
    if (!table.commit(next))
      throw new IllegalStateException("table changed during compaction; rerun")
    next.snapshotId
  }

  /** Expire old snapshot version files, bounding metadata growth and the
    * change-feed / time-travel horizon — the analog of Iceberg's
    * expire-snapshots. Keeps the most recent `keepLast` versions (and
    * always the current one). After expiry, `gcOrphans` may reclaim data
    * files only the expired versions referenced. Returns the number of
    * version files deleted.
    */
  def expireSnapshots(table: IceLiteTable, keepLast: Int): Int = {
    require(keepLast >= 1, "keepLast must be >= 1")
    import java.nio.file.Files
    val cur = table.refresh().snapshotId
    val cutoff = cur - keepLast + 1
    var deleted = 0
    IceLite.retainedVersions(table.root).foreach { v =>
      if (v < cutoff && Files.deleteIfExists(IceLite.versionFile(table.root, v)))
        deleted += 1
    }
    deleted
  }

  /** Garbage-collect data files not referenced by the CURRENT snapshot:
    * failed-attempt delta directories (attempt-unique names can orphan a
    * dir when a zombie driver loses the commit race), compaction inputs
    * and superseded bases. The analog of Iceberg's
    * remove-orphan-files maintenance.
    *
    * The change-data-feed manifests (`IceSnapshot.changed`) of every
    * RETAINED snapshot version are also protected, so `changesBetween`
    * keeps working over the retained history even for delta files that
    * a same-commit compaction folded into base. Run `expireSnapshots`
    * first to bound that horizon.
    *
    * Single-writer maintenance operation: must not run concurrently with
    * an in-flight apply (an uncommitted attempt's files look orphaned).
    * Time travel to snapshots older than current loses any file only
    * they reference. Returns the number of deleted files.
    */
  def gcOrphans(table: IceLiteTable): Int = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val snap = table.refresh()
    val cdfProtected = IceLite.retainedVersions(table.root).flatMap { v =>
      try IceLite.readSnapshotFile(table.root, v).changed.values.flatten
      catch { case scala.util.control.NonFatal(_) => Nil }
    }
    val referenced = snap.allFiles.toSet ++ cdfProtected
    val root = Paths.get(table.root)
    val dataDir = root.resolve("data")
    if (!Files.isDirectory(dataDir)) return 0
    var deleted = 0
    Files.walk(dataDir).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .foreach { p =>
        val rel = root.relativize(p).toString
        // non-parquet commit markers (_SUCCESS etc.) ride with their dir
        if (!referenced.contains(rel)) {
          Files.deleteIfExists(p)
          if (rel.endsWith(".parquet")) deleted += 1
        }
      }
    // sweep now-empty directories bottom-up
    Files.walk(dataDir).iterator().asScala.toSeq.reverse
      .filter(p => Files.isDirectory(p) && p != dataDir)
      .foreach { d =>
        if (!Files.list(d).iterator().hasNext) Files.deleteIfExists(d)
      }
    deleted
  }
}
