package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.TokenDoc
import graft.util.Fs

/** flatMapGroupsWithState transaction assembly: arbitrary log splits,
  * state survives in the SS state store; plus the watermarked windowed
  * stream-metrics aggregation.
  */
class StatefulAssemblySpec extends SparkSpec {

  test("stateful assembly over row-sliced log equals oracle (one file per trigger)") {
    import spark.implicits._
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 80, seed = 107, maxOpsPerTx = 12)
    val base = Fs.tempDir("graft-stateful")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 4, maxFilesPerTrigger = 1)
    // row-sliced log: transactions straddle every file boundary. Flat
    // files (not subdirs): the SS file source does not recurse into
    // non-partition directories.
    val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i)).sortBy(_.lsn)
    log.grouped(math.max(1, log.size / 6)).zipWithIndex.foreach { case (slice, i) =>
      val tmp = f"${cdc.logDir}-stage/slice-$i%03d"
      slice.toDS().toDF().coalesce(1).write.parquet(tmp)
      val part = Fs.listParquet(tmp).head
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cdc.logDir))
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(f"${cdc.logDir}/slice-$i%03d.parquet"))
    }
    val fresh = spark.newSession()
    val table = CdcJob.snapshot(fresh, ChangeLogGen.initialTable(fresh, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    StatefulAssembly.stream(fresh, table, cdc).awaitTermination()

    val initial = (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap
    val want = ReplayOracle.replay(initial, log, ChangeLogGen.snapshotLsn)
    val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
    assert(got.keySet == want.keySet,
      s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    want.foreach { case (k, w) => assert(got(k).tokens == w.tokens, s"tokens mismatch $k") }
    Fs.deleteRecursively(base)
  }

  test("poison transaction: per-tx state bound fails fast instead of growing without limit") {
    import spark.implicits._
    import graft.model.{LogRecord, TokenDoc}
    // a transaction that streams records forever and never commits
    val poison = (1L to 50L).map(i =>
      LogRecord(i, 42L, "c", -1L, "token_docs", None,
        Some(TokenDoc(s"doc$i", Seq(1), 1, "cdc")), 0L))
    val ds = poison.toDS()
    val ex = intercept[Exception] {
      StatefulAssembly.assemble(ds, maxBufferedPerTx = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxBufferedPerTx")),
      s"expected the poison-tx error, got: ${msgs(ex).take(3)}")
    // under the default bound the same stream is fine (buffered, no emit)
    assert(StatefulAssembly.assemble(ds).collect().isEmpty)
  }

  test("poison transaction with a DLQ: quarantined, stream survives, healthy txs apply") {
    import spark.implicits._
    import graft.model.{LogRecord, TokenDoc}
    import org.apache.spark.sql.functions.col
    val base = Fs.tempDir("graft-dlq")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 2, maxFilesPerTrigger = 10, maxTxRecords = 5,
      dlqDir = Some(s"$base/dlq"))
    // one healthy committed tx + one poison tx (20 records, never closes)
    val healthy = Seq(
      LogRecord(1L, 1L, "B", -1L, "token_docs", None, None, 0L),
      LogRecord(2L, 1L, "c", -1L, "token_docs", None,
        Some(TokenDoc("docGOOD", Seq(1, 2), 2, "cdc")), 0L),
      LogRecord(3L, 1L, "C", -1L, "token_docs", None, None, 0L))
    val poison = (10L until 30L).map(i =>
      LogRecord(i, 666L, "c", -1L, "token_docs", None,
        Some(TokenDoc(s"docP$i", Seq(1), 1, "cdc")), 0L))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cdc.logDir))
    locally {
      val tmp = s"${cdc.logDir}-stage"
      (healthy ++ poison).toDS().toDF().coalesce(1).write.parquet(tmp)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(Fs.listParquet(tmp).head),
        java.nio.file.Paths.get(s"${cdc.logDir}/seg-000.parquet"))
    }
    val fresh = spark.newSession()
    val table = graft.icelite.IceLite.create(fresh, cdc.tableRoot,
      MergeApply.asNullable(org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.Encoders.product[TokenDoc].schema))
        .asInstanceOf[org.apache.spark.sql.types.StructType],
      "doc_id", cdc.numBuckets)
    StatefulAssembly.stream(fresh, table, cdc).awaitTermination()
    // healthy tx applied; poison rows quarantined, none merged
    val got = table.read().as[TokenDoc].collect().map(_.doc_id).toSet
    assert(got == Set("docGOOD"), s"got $got")
    val dlq = spark.read.parquet(s"$base/dlq/batch-*")
    assert(dlq.count() == 20)
    assert(dlq.where(col("op") =!= StatefulAssembly.DlqOp).count() == 0)
    assert(dlq.where(col("tx_id") =!= 666L).count() == 0)
    Fs.deleteRecursively(base)
  }

  test("quarantined tx stays quarantined: later-trigger tail and its COMMIT go to the DLQ, never merged") {
    import spark.implicits._
    import graft.model.{LogRecord, TokenDoc}
    import org.apache.spark.sql.functions.col
    val base = Fs.tempDir("graft-dlq2")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 2, maxFilesPerTrigger = 1, maxTxRecords = 5,
      dlqDir = Some(s"$base/dlq"))
    // trigger 1: healthy tx 1 + poison tx 666 (20 records, open)
    val segA = Seq(
      LogRecord(1L, 1L, "B", -1L, "token_docs", None, None, 0L),
      LogRecord(2L, 1L, "c", -1L, "token_docs", None,
        Some(TokenDoc("docGOOD", Seq(1, 2), 2, "cdc")), 0L),
      LogRecord(3L, 1L, "C", -1L, "token_docs", None, None, 0L)) ++
      (10L until 30L).map(i =>
        LogRecord(i, 666L, "c", -1L, "token_docs", None,
          Some(TokenDoc(s"docP$i", Seq(1), 1, "cdc")), 0L))
    // trigger 2: poison tail + its COMMIT — the silent-partial-apply trap:
    // these must NOT re-accumulate from empty state and merge on commit
    val segB = (40L until 43L).map(i =>
      LogRecord(i, 666L, "c", -1L, "token_docs", None,
        Some(TokenDoc(s"docP$i", Seq(1), 1, "cdc")), 0L)) ++ Seq(
      LogRecord(50L, 666L, "C", -1L, "token_docs", None, None, 0L),
      LogRecord(60L, 2L, "B", -1L, "token_docs", None, None, 0L),
      LogRecord(61L, 2L, "c", -1L, "token_docs", None,
        Some(TokenDoc("docGOOD2", Seq(3), 1, "cdc")), 0L),
      LogRecord(62L, 2L, "C", -1L, "token_docs", None, None, 0L))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cdc.logDir))
    Seq(segA, segB).zipWithIndex.foreach { case (seg, i) =>
      val tmp = s"${cdc.logDir}-stage-$i"
      seg.toDS().toDF().coalesce(1).write.parquet(tmp)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(Fs.listParquet(tmp).head),
        java.nio.file.Paths.get(f"${cdc.logDir}/seg-$i%03d.parquet"))
    }
    val fresh = spark.newSession()
    val table = graft.icelite.IceLite.create(fresh, cdc.tableRoot,
      MergeApply.asNullable(org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.Encoders.product[TokenDoc].schema))
        .asInstanceOf[org.apache.spark.sql.types.StructType],
      "doc_id", cdc.numBuckets)
    StatefulAssembly.stream(fresh, table, cdc).awaitTermination()
    // only the two healthy docs merged — no partial poison-tx apply
    val got = table.read().as[TokenDoc].collect().map(_.doc_id).toSet
    assert(got == Set("docGOOD", "docGOOD2"), s"got $got")
    // the DLQ holds the whole poison tx: 20 + 3 tail + its COMMIT record
    val dlq = spark.read.parquet(s"$base/dlq/batch-*")
    assert(dlq.count() == 24, s"dlq=${dlq.count()}")
    assert(dlq.where(col("op") =!= StatefulAssembly.DlqOp).count() == 0)
    assert(dlq.where(col("tx_id") =!= 666L).count() == 0)
    // R3 still holds: the close advanced the watermark past the poison commit
    assert(table.refresh().summary.watermarkCommit >= 50L)
    Fs.deleteRecursively(base)
  }

  test("skipped.operations gates the stateful path: skipped deletes never reach the merge") {
    import spark.implicits._
    import graft.model.{LogRecord, TokenDoc}
    val base = Fs.tempDir("graft-skipops")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 2, maxFilesPerTrigger = 10,
      skippedOperations = Set("d"))
    // tx 1 creates docA + docB; tx 2 deletes docA — but deletes are
    // configured skipped, so docA must survive (and tx 2 still closes)
    val log = Seq(
      LogRecord(1L, 1L, "B", -1L, "token_docs", None, None, 0L),
      LogRecord(2L, 1L, "c", -1L, "token_docs", None,
        Some(TokenDoc("docA", Seq(1), 1, "cdc")), 0L),
      LogRecord(3L, 1L, "c", -1L, "token_docs", None,
        Some(TokenDoc("docB", Seq(2), 1, "cdc")), 0L),
      LogRecord(4L, 1L, "C", -1L, "token_docs", None, None, 0L),
      LogRecord(5L, 2L, "B", -1L, "token_docs", None, None, 0L),
      LogRecord(6L, 2L, "d", -1L, "token_docs",
        Some(TokenDoc("docA", Seq(1), 1, "cdc")), None, 0L),
      LogRecord(7L, 2L, "C", -1L, "token_docs", None, None, 0L))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cdc.logDir))
    locally {
      val tmp = s"${cdc.logDir}-stage"
      log.toDS().toDF().coalesce(1).write.parquet(tmp)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(Fs.listParquet(tmp).head),
        java.nio.file.Paths.get(s"${cdc.logDir}/seg-000.parquet"))
    }
    val fresh = spark.newSession()
    val table = graft.icelite.IceLite.create(fresh, cdc.tableRoot,
      MergeApply.asNullable(org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.Encoders.product[TokenDoc].schema))
        .asInstanceOf[org.apache.spark.sql.types.StructType],
      "doc_id", cdc.numBuckets)
    StatefulAssembly.stream(fresh, table, cdc).awaitTermination()
    val got = table.read().as[TokenDoc].collect().map(_.doc_id).toSet
    assert(got == Set("docA", "docB"), s"got $got")
    // the delete-only tx still closed: watermark advanced past its commit
    assert(table.refresh().summary.watermarkCommit >= 7L)
    Fs.deleteRecursively(base)
  }

  test("watermarked windowed event-rate metrics cover every data event") {
    val cfg = ChangeLogConfig(nTx = 100, nDocs = 50, seed = 109)
    val base = Fs.tempDir("graft-metrics")
    ChangeLogGen.writeLog(spark, cfg, s"$base/log", 2)
    val q = StreamMetrics.eventRate(spark, s"$base/log", windowSec = 600)
      .writeStream.outputMode("complete")
      .format("memory").queryName("rates")
      .start()
    q.processAllAvailable(); q.stop()
    val rates = spark.table("rates")
    val totalWindowed = rates.agg(org.apache.spark.sql.functions.sum("events"))
      .collect()(0).getLong(0)
    val expected = (0L until cfg.nTx)
      .flatMap(i => ChangeLogGen.txRecords(cfg, i))
      .count(r => Set("c", "u", "d", "t").contains(r.op))
    assert(totalWindowed == expected, s"windowed=$totalWindowed expected=$expected")
    assert(rates.select("op").distinct().count() >= 2)
    Fs.deleteRecursively(base)
  }
}
