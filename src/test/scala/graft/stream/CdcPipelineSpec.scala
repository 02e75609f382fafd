package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.icelite.IceLite
import graft.model.TokenDoc
import graft.util.Fs

/** End-to-end behavioral spec, mirroring the reference IT suite shape
  * (`InformixConnectorIT.java`, `TransactionMetadataIT.java`): final
  * table state after snapshot + stream replay must equal the naive
  * sequential ReplayOracle, including rollbacks, savepoint discards,
  * deletes, truncate, restart/resume and idempotent re-application.
  */
class CdcPipelineSpec extends SparkSpec {

  private def finalState(tableRoot: String): Map[String, TokenDoc] = {
    import spark.implicits._
    IceLite.load(spark, tableRoot).read()
      .as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
  }

  private def initialState(cfg: ChangeLogConfig): Map[String, TokenDoc] =
    (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap

  private def oracleState(cfg: ChangeLogConfig): Map[String, TokenDoc] = {
    val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    ReplayOracle.replay(initialState(cfg), log, ChangeLogGen.snapshotLsn)
  }

  private def assertTokenEquality(got: Map[String, TokenDoc], want: Map[String, TokenDoc]): Unit = {
    assert(got.keySet == want.keySet,
      s"key sets differ: extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    want.foreach { case (k, w) =>
      val g = got(k)
      assert(g.tokens == w.tokens, s"token mismatch for $k")
      assert(g.n_tok == w.n_tok, s"n_tok mismatch for $k")
    }
  }

  private def setup(cfg: ChangeLogConfig, numFiles: Int): (String, CdcConfig) = {
    val base = Fs.tempDir("graft-e2e")
    val cdc = CdcConfig(
      logDir = s"$base/log", tableRoot = s"$base/table",
      checkpointDir = s"$base/ckpt", numBuckets = 16)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, numFiles)
    (base, cdc)
  }

  test("E2E: snapshot + batch-incremental replay equals sequential oracle") {
    val cfg = ChangeLogConfig(nTx = 300, nDocs = 200)
    val (base, cdc) = setup(cfg, numFiles = 6)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    val stats = CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 2)
    assert(stats.nonEmpty && stats.forall(_.committed))
    assertTokenEquality(finalState(cdc.tableRoot), oracleState(cfg))
    Fs.deleteRecursively(base)
  }

  test("E2E: kill between batches and resume — exactly-once (restart-mid-stream)") {
    val cfg = ChangeLogConfig(nTx = 300, nDocs = 200, seed = 7)
    val (base, cdc) = setup(cfg, numFiles = 6)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    // process only 1 batch, then "crash"
    val first = CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 2, stopAfterBatches = 1)
    assert(first.size == 1)
    // resume with a FRESH table handle (new driver)
    val table2 = IceLite.load(spark, cdc.tableRoot)
    val rest = CdcJob.runBatchIncremental(spark, table2, cdc, filesPerBatch = 2)
    assert(rest.size == 2)
    assertTokenEquality(finalState(cdc.tableRoot), oracleState(cfg))
    Fs.deleteRecursively(base)
  }

  test("idempotency: re-applying an already-committed batch is a no-op") {
    val cfg = ChangeLogConfig(nTx = 100, nDocs = 100, seed = 11)
    val (base, cdc) = setup(cfg, numFiles = 2)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    val before = finalState(cdc.tableRoot)
    val snapBefore = table.refresh().snapshotId
    // duplicate delivery of batch 0 and 1 (e.g. checkpoint lost, SS replays)
    import graft.model.LogRecord
    val files = Fs.listParquet(cdc.logDir).sorted
    val raw0 = spark.read.schema(LogRecord.schema).parquet(files.head)
    val s = CdcJob.processBatch(table, raw0, 0L)
    assert(s.alreadyApplied && !s.committed)
    assert(table.refresh().snapshotId == snapBefore)
    assertTokenEquality(finalState(cdc.tableRoot), before)
    Fs.deleteRecursively(base)
  }

  test("rollback + savepoint discard: discarded ops never reach the table") {
    // high rollback/discard rates to force coverage
    val cfg = ChangeLogConfig(nTx = 200, nDocs = 100, seed = 13,
      rollbackPct = 40, discardPct = 40)
    val nRolled = (0L until cfg.nTx).count(i =>
      ChangeLogGen.txRecords(cfg, i).last.op == "R")
    val nDiscards = (0L until cfg.nTx).count(i =>
      ChangeLogGen.txRecords(cfg, i).exists(_.op == "D"))
    assert(nRolled > 10, s"fixture should contain rollbacks, got $nRolled")
    assert(nDiscards > 10, s"fixture should contain discards, got $nDiscards")
    val (base, cdc) = setup(cfg, numFiles = 4)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 2)
    assertTokenEquality(finalState(cdc.tableRoot), oracleState(cfg))
    Fs.deleteRecursively(base)
  }

  test("truncate (E3): table cleared at truncate position, later events survive") {
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 100, seed = 17, truncateAtTx = 60)
    val (base, cdc) = setup(cfg, numFiles = 3)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    val want = oracleState(cfg)
    // truncate wiped the initial universe; docs not re-written afterwards must be gone
    val wiped = (0L until cfg.nDocs.toLong)
      .count(k => !want.contains(ChangeLogGen.docId(k)))
    assert(wiped > 10, s"expected many initial docs wiped by truncate, got $wiped")
    assertTokenEquality(finalState(cdc.tableRoot), want)
    Fs.deleteRecursively(base)
  }

  test("structured streaming path: AvailableNow stream equals oracle, resumes from checkpoint") {
    val cfg = ChangeLogConfig(nTx = 200, nDocs = 150, seed = 19)
    val (base, cdc0) = setup(cfg, numFiles = 6)
    val cdc = cdc0.copy(maxFilesPerTrigger = 2)
    // fresh isolated session: reproduces production's empty function
    // registry + foreachBatch session-clone semantics (a shared test
    // session would mask registration bugs)
    val fresh = spark.newSession()
    val table = CdcJob.snapshot(fresh, ChangeLogGen.initialTable(fresh, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runAvailable(fresh, table, cdc)
    assertTokenEquality(finalState(cdc.tableRoot), oracleState(cfg))
    // second start with same checkpoint: nothing new, state unchanged
    val v = table.refresh().snapshotId
    CdcJob.runAvailable(spark, IceLite.load(spark, cdc.tableRoot), cdc)
    assert(IceLite.load(spark, cdc.tableRoot).current.snapshotId == v)
    Fs.deleteRecursively(base)
  }

  test("LWW dedup property: permuted batch order converges to same state") {
    // apply the whole log as ONE batch (max intra-batch dedup pressure)
    val cfg = ChangeLogConfig(nTx = 150, nDocs = 80, seed = 23, zipfAlpha = 3.0)
    val (base, cdc) = setup(cfg, numFiles = 1)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    assertTokenEquality(finalState(cdc.tableRoot), oracleState(cfg))
    Fs.deleteRecursively(base)
  }

  test("snapshot mode no_data: stream-only apply, empty start") {
    val cfg = ChangeLogConfig(nTx = 100, nDocs = 50, seed = 29)
    val (base, cdc0) = setup(cfg, numFiles = 2)
    val cdc = cdc0.copy(snapshotMode = SnapshotMode.NoData)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    assert(table.read().count() == 0)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    // oracle over empty initial state
    val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    val want = ReplayOracle.replay(Map.empty, log, ChangeLogGen.snapshotLsn)
    assertTokenEquality(finalState(cdc.tableRoot), want)
    Fs.deleteRecursively(base)
  }

  test("snapshot mode initial_only: snapshot phase only, final state == seed") {
    val cfg = ChangeLogConfig(nTx = 50, nDocs = 40, seed = 31)
    val (base, cdc0) = setup(cfg, numFiles = 2)
    val cdc = cdc0.copy(snapshotMode = SnapshotMode.InitialOnly)
    // initial_only contract: the caller takes the snapshot and never
    // streams — events in the (present) log must not reach the sink
    val table = CdcJob.ensureTable(spark,
      ChangeLogGen.initialTable(spark, cfg).toDF(), cdc, ChangeLogGen.snapshotLsn)
    assertTokenEquality(finalState(cdc.tableRoot), initialState(cfg))
    // and a second ensureTable (restart) loads, never re-snapshots
    val again = CdcJob.ensureTable(spark,
      ChangeLogGen.initialTable(spark, cfg).toDF(), cdc, ChangeLogGen.snapshotLsn)
    assert(again.current.snapshotId == table.current.snapshotId)
    Fs.deleteRecursively(base)
  }

  test("skipped.operations=d: deleted keys keep their last surviving state") {
    val cfg = ChangeLogConfig(nTx = 150, nDocs = 80, seed = 37)
    val (base, cdc0) = setup(cfg, numFiles = 2)
    val cdc = cdc0.copy(skippedOperations = Set("d"))
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    val want = ReplayOracle.replay(initialState(cfg),
      log.filterNot(_.op == "d"), ChangeLogGen.snapshotLsn)
    assertTokenEquality(finalState(cdc.tableRoot), want)
    // the skip must be observable: the unskipped replay deletes keys
    val full = ReplayOracle.replay(initialState(cfg), log, ChangeLogGen.snapshotLsn)
    assert(full.keySet != want.keySet,
      "designed log carries no committed delete — test would be vacuous")
    Fs.deleteRecursively(base)
  }
}
