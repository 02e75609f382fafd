package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig => CLC, ChangeLogGen}
import graft.model.TokenDoc
import graft.util.Fs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The wire-format INGEST path: engine → wire → engine interchange,
  * checkpointed resume, garbage tolerance, topic scoping, and additive
  * schema evolution learned from the JSON itself. */
class WireSourceSpec extends SparkSpec {
  import spark.implicits._

  /** Run a native pipeline with the wire emit sink on; return
    * (wire dir, producer final state doc_id->tokens). */
  private def produceWire(base: String, cfg: CLC): Map[String, Seq[Int]] = {
    val cdc = CdcConfig(s"$base/log", s"$base/ptable", s"$base/pckpt", numBuckets = 4,
      emitDir = Some(s"$base/emit"), emitWire = true)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 3)
    val t = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, t, cdc, filesPerBatch = 1)
    t.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
  }

  private def consumerCfg(base: String, cfg: CLC): CdcConfig =
    CdcConfig(s"$base/emit", s"$base/ctable", s"$base/cckpt", numBuckets = 4)

  private def freshConsumer(base: String, cfg: CLC, cdc: CdcConfig) =
    CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)

  private def state(t: graft.icelite.IceLiteTable): Map[String, Seq[Int]] =
    t.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap

  test("wire ingest: a consumer replaying the producer's topic dump reconverges exactly") {
    val cfg = CLC(nTx = 120, nDocs = 70, seed = 91)
    val base = Fs.tempDir("graft-wsrc")
    val producer = produceWire(base, cfg)
    val cdc = consumerCfg(base, cfg)
    val t = freshConsumer(base, cfg, cdc)
    val stats = WireSource.runIncremental(spark, t, cdc, filesPerBatch = 2)
    assert(stats.nonEmpty && stats.forall(_.committed))
    assert(state(t) == producer, "wire consumer must match the producer's final state")
    Fs.deleteRecursively(base)
  }

  test("wire ingest: kill/resume mid-dump + full re-delivery are both idempotent") {
    val cfg = CLC(nTx = 120, nDocs = 70, seed = 92)
    val base = Fs.tempDir("graft-wsrc-resume")
    val producer = produceWire(base, cfg)
    val cdc = consumerCfg(base, cfg)
    val t = freshConsumer(base, cfg, cdc)
    val first = WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1,
      stopAfterBatches = 2)
    assert(first.size == 2)
    // resume: content-aligned — already-applied chunks are skipped or
    // replay as no-ops; final state converges
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1)
    assert(state(t) == producer)
    val v = t.refresh().snapshotId
    // full re-delivery of the whole dump: nothing changes
    val again = WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1)
    assert(t.refresh().snapshotId == v || again.forall(s => s.upserts == 0 && s.deletes == 0),
      "re-delivered wire dump must not change the table state")
    assert(state(t) == producer)
    Fs.deleteRecursively(base)
  }

  test("wire ingest: streaming path (SS checkpoint) converges to the producer state") {
    val cfg = CLC(nTx = 100, nDocs = 60, seed = 93)
    val base = Fs.tempDir("graft-wsrc-ss")
    val producer = produceWire(base, cfg)
    // streaming file source: glob the record batches (the emit root
    // also holds tx-batch-N metadata dirs — not wire records)
    val cdc = consumerCfg(base, cfg)
      .copy(logDir = s"$base/emit/batch-*", maxFilesPerTrigger = 2)
    val t = freshConsumer(base, cfg, cdc)
    WireSource.stream(spark, t, cdc, Trigger.AvailableNow()).awaitTermination()
    assert(state(t) == producer)
    Fs.deleteRecursively(base)
  }

  test("wire ingest: garbage records are dropped and quarantined, not fatal") {
    val cfg = CLC(nTx = 80, nDocs = 50, seed = 94)
    val base = Fs.tempDir("graft-wsrc-dlq")
    val producer = produceWire(base, cfg)
    // poison the dump: malformed JSON, valid JSON with no envelope, and
    // a tombstone-style null value (legal, silently dropped)
    Seq(
      ("documents", """{"doc_id":"x"}""", "{not json"),
      ("documents", """{"doc_id":"y"}""", """{"op":null,"hello":1}"""),
      ("documents", """{"doc_id":"z"}""", null: String)
    ).toDF("topic", "key", "value")
      .write.mode("overwrite").parquet(s"$base/emit/batch-zz-junk")
    val cdc = consumerCfg(base, cfg).copy(dlqDir = Some(s"$base/dlq"))
    val t = freshConsumer(base, cfg, cdc)
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 100)
    assert(state(t) == producer, "garbage must not corrupt the applied state")
    val dlq = spark.read.parquet(s"$base/dlq/wire-records")
    assert(dlq.count() == 2, "both unparseable records (not the tombstone) quarantine")
    Fs.deleteRecursively(base)
  }

  test("wire ingest: topic include scopes the subscription") {
    val cfg = CLC(nTx = 80, nDocs = 50, seed = 95)
    val base = Fs.tempDir("graft-wsrc-topic")
    produceWire(base, cfg)
    // consumer subscribed to a topic that never matches: no-op
    val cdc = consumerCfg(base, cfg)
    val t = freshConsumer(base, cfg, cdc)
    val before = state(t)
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 100,
      topicInclude = Some(Seq("orders\\..*")))
    assert(state(t) == before, "no topic match => no events applied")
    Fs.deleteRecursively(base)
  }

  /** Hand-built wire record (create op) at an explicit position. */
  private def wrec(doc: String, tok: Int, cl: Long, chg: Long): (String, String, String) =
    ("documents", s"""{"doc_id":"$doc"}""",
      s"""{"before":null,"after":{"doc_id":"$doc","tokens":[$tok],"n_tok":1,"source":"wire"},""" +
        s""""source":{"version":"t","connector":"informix","db":"graft","table":"documents",""" +
        s""""commit_lsn":$cl,"change_lsn":$chg,"begin_lsn":${cl - 1},"txId":1},"op":"c","ts_ms":0}""")

  test("wire ingest: resume is producer-batch-atomic — overlapping part files never lost") {
    // one producer batch dir holding TWO part files with OVERLAPPING
    // position ranges (exactly what a post-shuffle emit write produces):
    // part A tops out at 100, part B at 80. Per-file resume alignment
    // would skip part B after a kill (its max sits below the watermark
    // part A advanced); group-atomic alignment must apply both.
    val cfg = CLC(nTx = 10, nDocs = 10, seed = 97)
    val base = Fs.tempDir("graft-wsrc-atomic")
    val cdc = CdcConfig(s"$base/wire", s"$base/table", s"$base/ckpt", numBuckets = 2)
    Seq(wrec("a1", 1, 100L, 1L), wrec("a2", 2, 90L, 1L)).toDF("topic", "key", "value")
      .coalesce(1).write.parquet(s"$base/wire/batch-0/partA")
    Seq(wrec("b1", 3, 80L, 1L), wrec("b2", 4, 70L, 1L)).toDF("topic", "key", "value")
      .coalesce(1).write.parquet(s"$base/wire/batch-0/partB")
    Seq(wrec("c1", 5, 110L, 1L)).toDF("topic", "key", "value")
      .coalesce(1).write.parquet(s"$base/wire/batch-1")
    // NOTE partA/partB are nested dirs (= two groups under batch-0) —
    // flatten to files so batch-0 is ONE group with two part files
    def promote(sub: String): Unit = {
      val dir = java.nio.file.Paths.get(s"$base/wire/batch-0/$sub")
      val f = Fs.listParquet(dir.toString).head
      java.nio.file.Files.move(java.nio.file.Paths.get(f),
        dir.getParent.resolve(s"$sub.parquet"))
      Fs.deleteRecursively(dir.toString)
    }
    promote("partA"); promote("partB")
    val t = freshConsumer(base, cfg, cdc)
    // kill after the first consumer batch (= producer batch-0, whole)
    val first = WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1,
      stopAfterBatches = 1)
    assert(first.size == 1)
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1)
    val got = state(t)
    assert(Seq("a1", "a2", "b1", "b2", "c1").forall(got.contains),
      s"every wire record must survive kill/resume; got ${got.keySet}")
    Fs.deleteRecursively(base)
  }

  test("wire ingest: mid-dump truncation fails fast instead of skipping history") {
    val cfg = CLC(nTx = 10, nDocs = 10, seed = 98)
    val base = Fs.tempDir("graft-wsrc-trunc")
    val cdc = CdcConfig(s"$base/wire", s"$base/table", s"$base/ckpt", numBuckets = 2)
    Seq(wrec("a", 1, 100L, 1L)).toDF("topic", "key", "value")
      .write.parquet(s"$base/wire/batch-0")
    Seq(wrec("b", 2, 200L, 1L)).toDF("topic", "key", "value")
      .write.parquet(s"$base/wire/batch-1")
    Seq(wrec("c", 3, 300L, 1L)).toDF("topic", "key", "value")
      .write.parquet(s"$base/wire/batch-2")
    val t = freshConsumer(base, cfg, cdc)
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1, stopAfterBatches = 1)
    // retention (or an accident) deletes an UNAPPLIED producer batch
    Fs.deleteRecursively(s"$base/wire/batch-1")
    val e = intercept[IllegalStateException] {
      WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1)
    }
    assert(e.getMessage.contains("truncated"))
    // deleting an already-APPLIED prefix is normal dump retention: fine
    Seq(wrec("b", 2, 200L, 1L)).toDF("topic", "key", "value")
      .write.parquet(s"$base/wire/batch-1")
    Fs.deleteRecursively(s"$base/wire/batch-0")
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1)
    assert(Set("a", "b", "c").subsetOf(state(t).keySet))
    Fs.deleteRecursively(base)
  }

  test("wire ingest: DLQ quarantine is idempotent across resume-renumbered runs") {
    val cfg = CLC(nTx = 80, nDocs = 50, seed = 99)
    val base = Fs.tempDir("graft-wsrc-dlq2")
    val producer = produceWire(base, cfg)
    Seq(("documents", """{"doc_id":"x"}""", "{not json"),
        ("documents", """{"doc_id":"y"}""", """{"op":null,"hello":1}"""))
      .toDF("topic", "key", "value")
      .write.mode("overwrite").parquet(s"$base/emit/batch-zz-junk")
    val cdc = consumerCfg(base, cfg).copy(dlqDir = Some(s"$base/dlq"))
    val t = freshConsumer(base, cfg, cdc)
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 2)
    val once = spark.read.parquet(s"$base/dlq/wire-records").count()
    assert(once == 2)
    // the junk group has no parseable positions -> it replays on every
    // run (fresh batch ids, different chunkings); the per-source-file
    // dynamic-overwrite quarantine must stay single-copy through all
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 2)
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 3)
    assert(spark.read.parquet(s"$base/dlq/wire-records").count() == 2,
      "re-delivered garbage must overwrite its quarantine partition, not duplicate it")
    assert(state(t) == producer)
    Fs.deleteRecursively(base)
  }

  test("wire ingest: additive schema evolution is learned from the JSON envelope") {
    val cfg = CLC(nTx = 10, nDocs = 10, seed = 96)
    val base = Fs.tempDir("graft-wsrc-evo")
    val cdc = CdcConfig(s"$base/wire", s"$base/table", s"$base/ckpt", numBuckets = 2)
    val t = freshConsumer(base, cfg, cdc)
    val keep = state(t)
    assert(!t.refresh().schema.fieldNames.contains("lang"))
    def rec(doc: String, toks: String, lang: String, cl: Long, chg: Long): (String, String, String) =
      ("documents", s"""{"doc_id":"$doc"}""",
        s"""{"before":null,"after":{"doc_id":"$doc","tokens":$toks,"n_tok":2,"source":"wire","lang":"$lang"},""" +
          s""""source":{"version":"t","connector":"informix","db":"graft","table":"documents",""" +
          s""""commit_lsn":$cl,"change_lsn":$chg,"begin_lsn":${cl - 1},"txId":7},"op":"c","ts_ms":0}""")
    Seq(rec("w1", "[1,2]", "en", 1000L, 1L), rec("w2", "[3,4]", "de", 1000L, 2L))
      .toDF("topic", "key", "value")
      .write.mode("overwrite").parquet(s"$base/wire/batch-0")
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1)
    val sch = t.refresh().schema
    assert(sch.fieldNames.contains("lang"), "new wire column must widen the sink schema")
    // JSON integrals always infer as bigint — the untyped wire must NOT
    // numerically widen existing columns (only the typed engine log may)
    assert(sch("tokens").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, containsNull = true),
      s"wire inference must not widen tokens: ${sch("tokens").dataType}")
    assert(sch("n_tok").dataType == org.apache.spark.sql.types.IntegerType)
    val rows = t.read().select("doc_id", "lang").as[(String, Option[String])].collect().toMap
    assert(rows("w1").contains("en") && rows("w2").contains("de"))
    // pre-existing rows read the new column as null
    assert(keep.keySet.forall(k => rows(k).isEmpty))
    // a later batch WITHOUT the column leaves the widened schema alone
    Seq(("documents", """{"doc_id":"w3"}""",
      """{"before":null,"after":{"doc_id":"w3","tokens":[9],"n_tok":1,"source":"wire"},""" +
        """"source":{"version":"t","connector":"informix","db":"graft","table":"documents",""" +
        """"commit_lsn":2000,"change_lsn":1,"begin_lsn":1999,"txId":8},"op":"c","ts_ms":0}"""))
      .toDF("topic", "key", "value")
      .write.mode("overwrite").parquet(s"$base/wire/batch-1")
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1)
    assert(t.refresh().schema.fieldNames.contains("lang"))
    assert(t.read().where(col("doc_id") === "w3").count() == 1)
    Fs.deleteRecursively(base)
  }

  test("wire resume alignment reads the dump manifest, not applied group data") {
    val cfg = CLC(nTx = 120, nDocs = 70, seed = 93)
    val base = Fs.tempDir("graft-wsrc-manifest")
    val producer = produceWire(base, cfg)
    val cdc = consumerCfg(base, cfg)
    val t = freshConsumer(base, cfg, cdc)
    val first = WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1,
      stopAfterBatches = 2)
    assert(first.size == 2)
    // the emit sink recorded per-group positions + the dump format at
    // write time; corrupt the APPLIED groups' data — a resume that
    // parses them (position scan or format probe) would fail loudly
    val manifest = LsnManifest.readWire(s"$base/emit")
    val applied = manifest.filter { case (_, (c, _)) =>
      c <= t.refresh().summary.watermarkCommit }.keys.toSeq
    assert(applied.nonEmpty, "expected applied manifest groups")
    applied.foreach { g =>
      Fs.listParquet(s"$base/emit/$g").foreach(f =>
        java.nio.file.Files.write(java.nio.file.Paths.get(f),
          "not parquet".getBytes))
    }
    WireSource.runIncremental(spark, t, cdc, filesPerBatch = 1)
    assert(state(t) == producer)
    Fs.deleteRecursively(base)
  }
}
