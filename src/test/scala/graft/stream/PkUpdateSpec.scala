package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.{LogRecord, TokenDoc}
import graft.util.Fs

/** PK update = delete(old key) + insert(new key) — the reference's
  * envelope contract for primary-key changes
  * (`InformixConnectorIT.java:257-352`). The engine normalizes a
  * non-conforming 'u' with before.key != after.key into that pair.
  */
class PkUpdateSpec extends SparkSpec {

  test("update that changes the key removes the old row and creates the new one") {
    import spark.implicits._
    val cfg = ChangeLogConfig(nTx = 0, nDocs = 5, seed = 113)
    val base = Fs.tempDir("graft-pk")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 4)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cdc.logDir))
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)

    val lsn0 = 1L << 33
    val raw = Seq(
      LogRecord(lsn0 + 1, 1L, "B", -1L, "t", None, None, 0L),
      // PK update: doc 1 renamed to docNEW (non-conforming single event)
      LogRecord(lsn0 + 2, 1L, "u", -1L, "t",
        Some(TokenDoc("doc000000001", Seq.empty, 0, "cdc")),
        Some(TokenDoc("docNEW", Seq(7, 8), 2, "cdc")), 0L),
      LogRecord(lsn0 + 3, 1L, "C", -1L, "t", None, None, 0L)
    ).toDS().toDF()
    val stats = CdcJob.processBatch(table, raw, 0L)
    assert(stats.committed && stats.upserts == 1 && stats.deletes == 1)

    val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
    assert(!got.contains("doc000000001"), "old key must be deleted")
    assert(got("docNEW").tokens == Seq(7, 8))
    assert(got.size == cfg.nDocs) // 5 - 1 old + 1 new
    Fs.deleteRecursively(base)
  }
}
