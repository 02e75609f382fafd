package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.{ChangeEvent, LogRecord, TokenDoc}
import graft.util.Fs
import org.apache.spark.sql.functions.col

/** Checkpoint state migration between assembly strategies: the
  * flatMapGroupsWithState checkpoint's open-transaction state is read
  * through Spark's public state-store reader (StateInspect) and seeds a
  * transformWithState query via initial state — zero log re-read. Pins:
  * end-state parity with the replay oracle, pending-state inspection
  * correctness, quarantine carryover across the switch, and idempotent
  * re-drain of the migrated query (batch-id base pinned beside the new
  * checkpoint).
  */
class MigrationSpec extends SparkSpec {

  private def stage(recs: Seq[LogRecord], dir: String)(implicit
      s: org.apache.spark.sql.SparkSession): Unit =
    ChangeLogGen.stageBatchFile(s, recs, dir)

  test("fMGWS half + migrated TWS half equals the full replay oracle; re-drain is a no-op") {
    implicit val s = spark.newSession()
    import s.implicits._
    val cfg = ChangeLogConfig(nTx = 80, nDocs = 60, seed = 331, maxOpsPerTx = 10)
    val base = Fs.tempDir("graft-mig")
    try {
      val log = (0L until cfg.nTx)
        .flatMap(i => ChangeLogGen.txRecords(cfg, i)).sortBy(_.lsn)
      val (first, second) = log.splitAt(log.size / 2)

      val cdc1 = CdcConfig(s"$base/log1", s"$base/table", s"$base/ckpt1",
        numBuckets = 4)
      stage(first, cdc1.logDir)
      val table = CdcJob.snapshot(s,
        ChangeLogGen.initialTable(s, cfg).toDF(), cdc1, ChangeLogGen.snapshotLsn)
      StatefulAssembly.stream(s, table, cdc1).awaitTermination()

      // pending state == the open transactions derivable from the prefix
      val pending = StateInspect.pendingFmgws(s, cdc1.checkpointDir).cache()
      val gotPending = pending.collect()
        .map(p => p.tx_id -> p.records.map(_.lsn).sorted).toMap
      val wantPending = first.groupBy(_.tx_id)
        .filter { case (_, rs) => !rs.exists(r => r.op == "C" || r.op == "R") }
        .map { case (tx, rs) => tx -> rs.map(_.lsn).sorted }
      assert(gotPending === wantPending)
      assert(gotPending.nonEmpty, "split must leave open txs or the test is vacuous")

      val cdc2 = cdc1.copy(logDir = s"$base/log2", checkpointDir = s"$base/ckpt2")
      stage(second, cdc2.logDir)
      TwsAssembly.streamMigrated(s, table, cdc2, pending).awaitTermination()

      val initial = (0L until cfg.nDocs.toLong).map { k =>
        val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
        ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
      }.toMap
      val want = ReplayOracle.replay(initial, log, ChangeLogGen.snapshotLsn)
      def readState(): Map[String, Seq[Int]] =
        table.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
      val got = readState()
      assert(got.keySet === want.keySet,
        s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
      want.foreach { case (k, w) => assert(got(k) === w.tokens, s"tokens mismatch $k") }

      // idempotent re-drain: the pinned batch-id base keeps the sink's
      // gate consistent — nothing re-applies, nothing is lost
      TwsAssembly.streamMigrated(s, table, cdc2, pending).awaitTermination()
      assert(readState() === got)
    } finally Fs.deleteRecursively(base)
  }

  test("REVERSE migration (TWS -> fMGWS): pending state read from the TWS checkpoint, downgrade lands on the replay oracle") {
    implicit val s = spark.newSession()
    import s.implicits._
    val cfg = ChangeLogConfig(nTx = 80, nDocs = 60, seed = 409, maxOpsPerTx = 10)
    val base = Fs.tempDir("graft-migback")
    try {
      val log = (0L until cfg.nTx)
        .flatMap(i => ChangeLogGen.txRecords(cfg, i)).sortBy(_.lsn)
      val (first, second) = log.splitAt(log.size / 2)

      val cdc1 = CdcConfig(s"$base/log1", s"$base/table", s"$base/ckpt1",
        numBuckets = 4)
      stage(first, cdc1.logDir)
      val table = CdcJob.snapshot(s,
        ChangeLogGen.initialTable(s, cfg).toDF(), cdc1, ChangeLogGen.snapshotLsn)
      TwsAssembly.stream(s, table, cdc1).awaitTermination()

      // pending state from the TWS checkpoint == the open transactions
      // derivable from the prefix
      val pending = StateInspect.pendingTws(s, cdc1.checkpointDir).cache()
      val gotPending = pending.collect()
        .map(p => p.tx_id -> p.records.map(_.lsn).sorted).toMap
      val wantPending = first.groupBy(_.tx_id)
        .filter { case (_, rs) => !rs.exists(r => r.op == "C" || r.op == "R") }
        .map { case (tx, rs) => tx -> rs.map(_.lsn).sorted }
      assert(gotPending === wantPending)
      assert(gotPending.nonEmpty, "split must leave open txs or the test is vacuous")

      val cdc2 = cdc1.copy(logDir = s"$base/log2", checkpointDir = s"$base/ckpt2")
      stage(second, cdc2.logDir)
      StatefulAssembly.streamMigratedBack(s, table, cdc2, pending)
        .awaitTermination()

      val initial = (0L until cfg.nDocs.toLong).map { k =>
        val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
        ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
      }.toMap
      val want = ReplayOracle.replay(initial, log, ChangeLogGen.snapshotLsn)
      val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
      assert(got.keySet === want.keySet,
        s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
      want.foreach { case (k, w) => assert(got(k) === w.tokens, s"tokens mismatch $k") }

      // idempotent re-drain on the pinned batch-id base
      StatefulAssembly.streamMigratedBack(s, table, cdc2, pending)
        .awaitTermination()
      assert(table.read().as[TokenDoc].collect()
        .map(d => d.doc_id -> d.tokens).toMap === got)
    } finally Fs.deleteRecursively(base)
  }

  test("quarantined state carries over: the poison tx's post-migration close is DLQ'd, never merged") {
    implicit val s = spark.newSession()
    import s.implicits._
    val base = Fs.tempDir("graft-migq")
    try {
      def doc(name: String) = Some(TokenDoc(name, Seq(1), 1, "cdc"))
      // tx 7: poison (5 records > cap 3, no close) -> quarantined in phase 1
      // tx 1: legitimately open at the boundary -> migrates normally
      val first =
        LogRecord(10L, 7L, "B", -1L, "token_docs", None, None, 0L) +:
        (1L to 4L).map(i => LogRecord(10L + i, 7L, "c", -1L, "token_docs",
          None, doc(s"poison$i"), 0L)) :+
        LogRecord(20L, 1L, "B", -1L, "token_docs", None, None, 0L) :+
        LogRecord(21L, 1L, "c", -1L, "token_docs", None, doc("alive"), 0L)
      val second = Seq(
        LogRecord(30L, 7L, "C", -1L, "token_docs", None, None, 0L),
        LogRecord(31L, 1L, "C", -1L, "token_docs", None, None, 0L),
        LogRecord(40L, 8L, "B", -1L, "token_docs", None, None, 0L),
        LogRecord(41L, 8L, "c", -1L, "token_docs", None, doc("late"), 0L),
        LogRecord(42L, 8L, "C", -1L, "token_docs", None, None, 0L))

      val cdc1 = CdcConfig(s"$base/log1", s"$base/table", s"$base/ckpt1",
        numBuckets = 2, maxTxRecords = 3, dlqDir = Some(s"$base/dlq1"))
      stage(first, cdc1.logDir)
      val table = CdcJob.snapshot(s,
        Seq(TokenDoc("seed0", Seq(0), 1, "seed")).toDS().toDF(),
        cdc1, 0L)
      StatefulAssembly.stream(s, table, cdc1).awaitTermination()

      val pending = StateInspect.pendingFmgws(s, cdc1.checkpointDir).cache()
      val byTx = pending.collect().map(p => p.tx_id -> p).toMap
      assert(byTx(7L).quarantined && byTx(7L).records.isEmpty)
      assert(!byTx(1L).quarantined && byTx(1L).records.size == 2)

      val cdc2 = cdc1.copy(logDir = s"$base/log2",
        checkpointDir = s"$base/ckpt2", dlqDir = Some(s"$base/dlq2"))
      stage(second, cdc2.logDir)
      TwsAssembly.streamMigrated(s, table, cdc2, pending).awaitTermination()

      val docs = table.read().as[TokenDoc].collect().map(_.doc_id).toSet
      assert(docs === Set("seed0", "alive", "late"),
        s"poison rows must never merge, got $docs")
      // the late close itself went to the DLQ (sticky quarantine)
      val dlq2 = s.read.parquet(s"$base/dlq2/*")
        .as[ChangeEvent](org.apache.spark.sql.Encoders.product[ChangeEvent])
        .collect()
      assert(dlq2.exists(e =>
        e.tx_id == 7L && e.op == StatefulAssembly.DlqOp && e.change_lsn == 30L))
    } finally Fs.deleteRecursively(base)
  }
}
