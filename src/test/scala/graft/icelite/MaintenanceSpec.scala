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
    Fs.deleteRecursively(base)
  }
}
