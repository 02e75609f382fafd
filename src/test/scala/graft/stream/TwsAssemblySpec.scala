package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.{ChangeEvent, LogRecord, TokenDoc}
import graft.util.Fs
import org.apache.spark.sql.streaming.Trigger

/** transformWithState transaction assembly (Spark 4 StatefulProcessor on
  * RocksDB): end-to-end oracle convergence with mid-state restarts, and
  * event-for-event parity with the flatMapGroupsWithState assembly —
  * including the DLQ quarantine path under a poison transaction.
  */
class TwsAssemblySpec extends SparkSpec {

  private def sliceLog(log: Seq[LogRecord], logDir: String, slices: Int): Unit = {
    import spark.implicits._
    log.grouped(math.max(1, log.size / slices)).zipWithIndex.foreach { case (slice, i) =>
      val tmp = f"$logDir-stage/slice-$i%03d"
      slice.toDS().toDF().coalesce(1).write.parquet(tmp)
      val part = Fs.listParquet(tmp).head
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(logDir))
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(f"$logDir/slice-$i%03d.parquet"))
    }
  }

  test("TWS assembly over row-sliced log equals the replay oracle (one file per trigger)") {
    import spark.implicits._
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 80, seed = 307, maxOpsPerTx = 12)
    val base = Fs.tempDir("graft-tws")
    try {
      val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
        numBuckets = 4, maxFilesPerTrigger = 1)
      val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i)).sortBy(_.lsn)
      sliceLog(log, cdc.logDir, 6)
      val fresh = spark.newSession()
      val table = CdcJob.snapshot(fresh, ChangeLogGen.initialTable(fresh, cfg).toDF(),
        cdc, ChangeLogGen.snapshotLsn)
      TwsAssembly.stream(fresh, table, cdc).awaitTermination()

      val initial = (0L until cfg.nDocs.toLong).map { k =>
        val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
        ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
      }.toMap
      val want = ReplayOracle.replay(initial, log, ChangeLogGen.snapshotLsn)
      val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
      assert(got.keySet == want.keySet,
        s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
      want.foreach { case (k, w) =>
        assert(got(k).tokens == w.tokens, s"tokens mismatch $k") }
    } finally Fs.deleteRecursively(base)
  }

  test("TWS and fMGWS assemblies emit identical event sets, including DLQ quarantine of a poison tx") {
    import spark.implicits._
    val cfg = ChangeLogConfig(nTx = 60, nDocs = 40, seed = 311, maxOpsPerTx = 8)
    val base = Fs.tempDir("graft-twscmp")
    try {
      // real tx mix plus one poison tx: records forever, never closes —
      // exceeds the cap mid-stream, so the sticky-quarantine path runs
      val poison = (1L to 40L).map(i =>
        LogRecord(900000L + i, 424242L, "c", -1L, "token_docs", None,
          Some(TokenDoc(s"poison$i", Seq(1), 1, "cdc")), 0L))
      val log = ((0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
        ++ poison).sortBy(_.lsn)

      def runAssembly(tag: String,
          doAssemble: org.apache.spark.sql.Dataset[LogRecord] =>
            org.apache.spark.sql.Dataset[ChangeEvent]): Seq[ChangeEvent] = {
        val dir = s"$base/$tag"
        sliceLog(log, s"$dir/log", 5)
        val fresh = StateStores.useRocksDb(spark.newSession())
        val raw = fresh.readStream.schema(LogRecord.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$dir/log")
          .as[LogRecord](org.apache.spark.sql.Encoders.product[LogRecord])
        doAssemble(raw).writeStream.format("parquet")
          .option("path", s"$dir/sink").option("checkpointLocation", s"$dir/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination()
        fresh.read.parquet(s"$dir/sink")
          .as[ChangeEvent](org.apache.spark.sql.Encoders.product[ChangeEvent])
          .collect().toSeq
          .sortBy(e => (e.commit_lsn, e.change_lsn, e.tx_id, e.op))
      }

      val cap = 16
      val tws = runAssembly("tws",
        raw => TwsAssembly.assemble(raw, cap, quarantine = true))
      val fmg = runAssembly("fmg",
        raw => StatefulAssembly.assemble(raw, cap, quarantine = true))
      assert(tws.nonEmpty)
      assert(tws === fmg)
      // the poison tx actually exercised the quarantine path
      assert(tws.exists(_.op == StatefulAssembly.DlqOp))
      // and real transactions still committed
      assert(tws.exists(e => e.op == "c" || e.op == "u"))
    } finally Fs.deleteRecursively(base)
  }
}
