package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.{LogRecord, TokenDoc}
import graft.util.Fs

/** N2/N3 behavioral spec, mirroring `IncrementalSnapshotIT.java:30-182`
  * and `BlockingSnapshotIT`: chunked snapshot interleaved with live
  * stream batches converges to the sequential-replay state; per-key
  * max-LSN wins between snapshot rows and concurrent changes.
  */
class IncrementalSnapshotSpec extends SparkSpec {

  private def oracleAt(cfg: ChangeLogConfig, upToTx: Long): Map[String, TokenDoc] = {
    val initial = (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap
    val log = (0L until upToTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    ReplayOracle.replay(initial, log, ChangeLogGen.snapshotLsn)
  }

  test("incremental snapshot chunks interleaved with stream batches converge (N2)") {
    import spark.implicits._
    val cfg = ChangeLogConfig(nTx = 200, nDocs = 150, seed = 37)
    val base = Fs.tempDir("graft-incsnap")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 8, snapshotMode = SnapshotMode.NoData)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, numFiles = 6)
    // start EMPTY (no_data): the base state arrives via incremental snapshot
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)

    // stream the first half of the log
    val files = Fs.listParquet(cdc.logDir).sorted
    val (firstHalf, secondHalf) = files.splitAt(3)
    firstHalf.zipWithIndex.foreach { case (f, i) =>
      CdcJob.processBatch(table, spark.read.schema(LogRecord.schema).parquet(f), i.toLong)
    }

    // pin: current applied watermark; source: consistent oracle view at pin.
    // The generator's tx->lsn layout lets us derive "state at watermark" as
    // the oracle over all transactions whose COMMIT lsn <= watermark.
    val wm = table.refresh().summary.watermarkCommit
    val initial = (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap
    val fullLog = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    val committedPart = fullLog.filter { r =>
      // keep whole txs whose COMMIT lsn <= wm
      val commit = fullLog.find(x => x.tx_id == r.tx_id && (x.op == "C" || x.op == "R"))
      commit.exists(c => c.lsn <= wm)
    }
    val pinState = ReplayOracle.replay(initial, committedPart, ChangeLogGen.snapshotLsn)
    val sourceAtPin = pinState.values.toSeq.toDS().toDF()

    // interleave: snapshot chunks and remaining stream batches alternate
    var nextFile = 0
    IncrementalSnapshot.run(table, sourceAtPin, wm, nChunks = 4, betweenChunks = { _ =>
      if (nextFile < secondHalf.size) {
        val bid = table.refresh().summary.lastBatchId + 1
        CdcJob.processBatch(table,
          spark.read.schema(LogRecord.schema).parquet(secondHalf(nextFile)), bid)
        nextFile += 1
      }
    })
    // drain any remaining stream files
    while (nextFile < secondHalf.size) {
      val bid = table.refresh().summary.lastBatchId + 1
      CdcJob.processBatch(table,
        spark.read.schema(LogRecord.schema).parquet(secondHalf(nextFile)), bid)
      nextFile += 1
    }

    val want = oracleAt(cfg, cfg.nTx)
    val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
    assert(got.keySet == want.keySet,
      s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    want.foreach { case (k, w) => assert(got(k).tokens == w.tokens, s"tokens mismatch $k") }
    Fs.deleteRecursively(base)
  }

  test("blocking snapshot repairs a diverged table (N3)") {
    import spark.implicits._
    val cfg = ChangeLogConfig(nTx = 60, nDocs = 50, seed = 41)
    val base = Fs.tempDir("graft-blocksnap")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 4)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, numFiles = 2)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)

    // on-demand full re-read at a pin beyond everything applied
    val wm = table.refresh().summary.watermarkCommit
    val want = oracleAt(cfg, cfg.nTx)
    val source = want.values.toSeq.toDS().toDF()
    val stats = IncrementalSnapshot.blocking(table, source, wm + 1)
    assert(stats.committed)

    val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) => assert(got(k).tokens == w.tokens) }
    Fs.deleteRecursively(base)
  }
}
