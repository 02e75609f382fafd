package graft.icelite

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.TokenDoc
import graft.stream.{CdcConfig, CdcJob}
import graft.util.Fs
import org.apache.spark.sql.functions.col

class MaintenanceSpec extends SparkSpec {

  test("compaction shrinks file count, purges old tombstones, preserves state") {
    import spark.implicits._
    val cfg = ChangeLogConfig(nTx = 150, nDocs = 100, seed = 43, deletePct = 25)
    val base = Fs.tempDir("graft-compact")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 8)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, numFiles = 6)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)

    val before = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    val snap = table.refresh()
    val filesBefore = snap.allFiles.size
    val tombsBefore = table.readRaw(snap.buckets)
      .where(col(IceLite.TOMB)).count()
    assert(tombsBefore > 0, "fixture should have tombstones")

    // purge everything below the watermark (log fully retained beyond it)
    Maintenance.compact(table, retentionFloorLsn = snap.summary.watermarkCommit + 1)
    val after = table.refresh()
    assert(after.allFiles.size <= 8, s"expected <=1 file/bucket, got ${after.allFiles.size}")
    assert(after.allFiles.size < filesBefore)
    val tombsAfter = table.readRaw(after.buckets)
      .where(col(IceLite.TOMB)).count()
    assert(tombsAfter == 0)
    val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    assert(got == before)

    // orphan GC: compaction inputs + a fake failed-attempt dir are swept,
    // referenced files and table state untouched
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"${table.root}/data/delta-zombie-attempt/__bucket=0"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${table.root}/data/delta-zombie-attempt/__bucket=0/part-junk.parquet"),
      Array[Byte](1, 2, 3))
    val removed = Maintenance.gcOrphans(table)
    assert(removed > 0, "compaction inputs + zombie attempt should be orphans")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"${table.root}/data/delta-zombie-attempt")))
    val cur = table.refresh()
    cur.allFiles.foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"${table.root}/$f")), f)
    }
    val got2 = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    assert(got2 == before)
    Fs.deleteRecursively(base)
  }
}
