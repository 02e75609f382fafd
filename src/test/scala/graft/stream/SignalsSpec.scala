package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.TokenDoc
import graft.util.Fs
import java.nio.file.{Files, Paths}

/** E7 — signal-driven snapshots interleaved with the live stream,
  * mirroring `IncrementalSnapshotIT` / `BlockingSnapshotIT` driven via
  * the signal table.
  */
class SignalsSpec extends SparkSpec {

  test("incremental-snapshot signal executed between stream batches; marked done") {
    import spark.implicits._
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 80, seed = 97)
    val base = Fs.tempDir("graft-signals")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 4, snapshotMode = SnapshotMode.NoData,
      signalDir = Some(s"$base/signals"))
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 4)
    // empty start: base state must arrive via the signalled snapshot
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    // the consistent-at-pin source view: initial state, pin = 0
    val srcDir = s"$base/source"
    ChangeLogGen.initialTable(spark, cfg).toDF().write.parquet(srcDir)
    val sig = Signals.request(cdc.signalDir.get,
      Signals.Signal("incremental-snapshot", srcDir, ChangeLogGen.snapshotLsn, chunks = 3))

    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 2)

    // signal consumed exactly once
    assert(!Files.exists(sig))
    assert(Files.exists(Paths.get(sig.toString + ".done")))
    assert(Signals.pending(cdc.signalDir.get).isEmpty)

    // final state == initial + full stream replay
    val initial = (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap
    val want = ReplayOracle.replay(initial,
      (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i)),
      ChangeLogGen.snapshotLsn)
    val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
    assert(got.keySet == want.keySet,
      s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    want.foreach { case (k, w) => assert(got(k).tokens == w.tokens) }

    // stream and signal channels kept separate ids
    val sm = table.refresh().summary
    assert(sm.lastBatchId >= 0 && sm.lastSignalBatchId >= 0)
    Fs.deleteRecursively(base)
  }

  test("signal-driven snapshot READ events are gated by the configured rowFilter (SMT parity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cfg = ChangeLogConfig(nTx = 60, nDocs = 50, seed = 99)
    val base = Fs.tempDir("graft-signals-gate")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 4, snapshotMode = SnapshotMode.NoData,
      signalDir = Some(s"$base/signals"),
      rowFilter = Some(col("after").getField("n_tok") % 2 === 0))
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 2)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    val srcDir = s"$base/source"
    ChangeLogGen.initialTable(spark, cfg).toDF().write.parquet(srcDir)
    // blocking snapshot pinned ABOVE every stream event: its (gated)
    // rows win for every key they cover
    Signals.request(cdc.signalDir.get,
      Signals.Signal("blocking-snapshot", srcDir, Long.MaxValue - 1, 1))
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 2)

    val initial = (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap
    val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    val gatedLog = log.filter(r =>
      !(r.op == "c" || r.op == "u") || r.after.exists(_.n_tok % 2 == 0))
    // sink started EMPTY (no_data): stream contributes the gated replay;
    // the pinned snapshot overlays its GATED source rows on top
    val gatedSource = initial.filter { case (_, d) => d.n_tok % 2 == 0 }
    val want = ReplayOracle.replay(Map.empty, gatedLog, ChangeLogGen.snapshotLsn) ++
      gatedSource
    // the gate actually bit on the snapshot lane
    assert(gatedSource.size < initial.size)
    val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
    assert(got.keySet == want.keySet,
      s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    want.foreach { case (k, w) => assert(got(k).tokens == w.tokens, s"tokens $k") }
    Fs.deleteRecursively(base)
  }
}
