package graft.ops

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.{LogRecord, TokenDoc}
import graft.stream.{CdcConfig, CdcJob, TxAssembler}
import graft.util.Fs
import org.apache.spark.sql.functions._

/** Binary wire framing (the Avro-converter analog of [[WireJson]]):
  * schema-driven frames, null-value tombstones, malformed-frame
  * tolerance, and frame-format stability (golden bytes).
  */
class WireBinarySpec extends SparkSpec {

  private def fixture() = {
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 80, seed = 83, deletePct = 20)
    val base = Fs.tempDir("graft-wirebin")
    ChangeLogGen.writeLog(spark, cfg, s"$base/log", 2)
    val raw = spark.read.schema(LogRecord.schema).parquet(s"$base/log")
    (base, cfg, TxAssembler.assemble(raw))
  }

  test("toWire -> fromWire roundtrips every committed event exactly") {
    val (base, _, events) = fixture()
    val emitted = TxAssembler.emitRecords(events, tombstonesOnDelete = true,
      keepBefore = true, keepSource = true)
    val wire = WireBinary.toWire(emitted).cache()
    val back = WireBinary.fromWire(wire, TokenDoc.schema)
    val want = events.where(col("op") =!= TxAssembler.MarkerOp)
      .select("commit_lsn", "change_lsn", "begin_lsn", "tx_id", "op", "table",
        "before", "after", "ts_ms")
    assert(back.count() == want.count(), "tombstones dropped, data events kept")
    assert(back.exceptAll(want).count() == 0 && want.exceptAll(back).count() == 0,
      "binary roundtrip must be exact: images, source coordinates, op, ts")
    val deletes = want.where(col("op") === "d").count()
    assert(deletes > 0, "fixture needs deletes")
    val tombs = wire.where(col("value").isNull)
    assert(tombs.count() == deletes, "one null-value frame per delete")
    assert(tombs.where(col("key").isNull).count() == 0, "tombstones keep their key")
    // every frame opens with magic + version
    assert(wire.where(col("value").isNotNull)
      .where(!(expr("value") startsWith lit(Array[Byte](0x47, 0x01)))).count() == 0,
      "every frame carries the magic/version header")
    wire.unpersist()
    Fs.deleteRecursively(base)
  }

  test("binary frames are strictly smaller than the JSON wire for the same stream") {
    val (base, _, events) = fixture()
    val emitted = TxAssembler.emitRecords(events, tombstonesOnDelete = false,
      keepBefore = true, keepSource = true)
    val jsonBytes = WireJson.toWire(emitted)
      .agg(sum(length(col("value")))).head().getLong(0)
    val binBytes = WireBinary.toWire(emitted)
      .agg(sum(length(col("value")))).head().getLong(0)
    info(s"wire bytes: json=$jsonBytes bin=$binBytes " +
      f"(${binBytes.toDouble / jsonBytes}%.2fx)")
    assert(binBytes * 4 < jsonBytes * 3,
      s"binary wire should cut topic bytes by >=25%: json=$jsonBytes bin=$binBytes")
    Fs.deleteRecursively(base)
  }

  test("wire-ingested events drive the MERGE sink to the same final state") {
    val (base, cfg, events) = fixture()
    val emitted = TxAssembler.emitRecords(events, tombstonesOnDelete = true,
      keepBefore = true, keepSource = true)
    val back = WireBinary.fromWire(WireBinary.toWire(emitted), TokenDoc.schema)
    val initial = ChangeLogGen.initialTable(spark, cfg).toDF()
    val cdcA = CdcConfig(s"$base/log", s"$base/tableA", s"$base/ckptA", numBuckets = 4)
    val cdcB = CdcConfig(s"$base/log", s"$base/tableB", s"$base/ckptB", numBuckets = 4)
    val tA = CdcJob.snapshot(spark, initial, cdcA, ChangeLogGen.snapshotLsn)
    val tB = CdcJob.snapshot(spark, initial, cdcB, ChangeLogGen.snapshotLsn)
    graft.stream.MergeApply.applyBatch(tA, events, batchId = 0L)
    graft.stream.MergeApply.applyBatch(tB, back, batchId = 0L)
    import spark.implicits._
    val a = tA.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    val b = tB.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    assert(a == b, "binary-wire replay must converge to the direct-apply state")
    assert(a.nonEmpty)
    Fs.deleteRecursively(base)
  }

  test("malformed frames are dropped (and surfaced), never fatal") {
    import spark.implicits._
    val (base, _, events) = fixture()
    val emitted = TxAssembler.emitRecords(events, tombstonesOnDelete = false,
      keepBefore = true, keepSource = true)
    val wire = WireBinary.toWire(emitted).cache()
    val goodFrame = wire.where(col("value").isNotNull)
      .select("value").head().getAs[Array[Byte]](0)
    val garbage = Seq(
      ("token_docs", """{"doc_id":"x"}""", Array[Byte](1, 2, 3)), // bad magic
      ("token_docs", """{"doc_id":"y"}""", Array[Byte](0x47, 0x02, 0)), // bad version
      ("token_docs", """{"doc_id":"z"}""", goodFrame.dropRight(3)), // truncated
      ("token_docs", """{"doc_id":"w"}""", goodFrame ++ Array[Byte](0)) // trailing
    ).toDF("topic", "key", "value")
      .withColumn("commit_lsn", lit(0L)).withColumn("change_lsn", lit(0L))
      .withColumn("emit_seq", lit(0))
    val mixed = wire.unionByName(garbage)
    val clean = WireBinary.fromWire(wire, TokenDoc.schema)
    val fromMixed = WireBinary.fromWire(mixed, TokenDoc.schema)
    assert(fromMixed.count() == clean.count(), "garbage must not add rows")
    assert(WireBinary.badRecords(mixed, TokenDoc.schema).count() == 4,
      "each malformed frame surfaces for DLQ accounting")
    wire.unpersist()
    Fs.deleteRecursively(base)
  }

  test("binary wire ingest: consumer replays the producer's binary dump exactly, resume is idempotent") {
    import spark.implicits._
    import graft.stream.{CdcConfig, WireSource}
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 70, seed = 93)
    val base = Fs.tempDir("graft-wbin-src")
    // producer with the BINARY emit sink
    val pcdc = CdcConfig(s"$base/log", s"$base/ptable", s"$base/pckpt", numBuckets = 4,
      emitDir = Some(s"$base/emit"), emitWireBinary = true)
    ChangeLogGen.writeLog(spark, cfg, pcdc.logDir, 3)
    val pt = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      pcdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, pt, pcdc, filesPerBatch = 1)
    val producer = pt.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    // the dump's value column really is binary
    val firstBatch = new java.io.File(s"$base/emit").listFiles()
      .filter(_.getName.startsWith("batch-")).map(_.toString).min
    assert(spark.read.parquet(firstBatch).schema("value").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // consumer: same WireSource path, format dispatched off the dump
    val ccdc = CdcConfig(s"$base/emit/batch-*", s"$base/ctable", s"$base/cckpt",
      numBuckets = 4)
    val ct = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      ccdc, ChangeLogGen.snapshotLsn)
    val first = WireSource.runIncremental(spark, ct, ccdc, filesPerBatch = 1,
      stopAfterBatches = 2)
    assert(first.size == 2 && first.forall(_.committed))
    // resume: binary positionScan aligns on applied groups; converge
    WireSource.runIncremental(spark, ct, ccdc, filesPerBatch = 1)
    def state = ct.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    assert(state == producer, "binary-wire consumer must match the producer state")
    // full re-delivery: nothing changes
    val v = ct.refresh().snapshotId
    val again = WireSource.runIncremental(spark, ct, ccdc, filesPerBatch = 1)
    assert(ct.refresh().snapshotId == v ||
      again.forall(s => s.upserts == 0 && s.deletes == 0))
    assert(state == producer)
    Fs.deleteRecursively(base)
  }

  test("binary wire ingest: streaming path (SS checkpoint) converges to the producer state") {
    import spark.implicits._
    import graft.stream.{CdcConfig, WireSource}
    val cfg = ChangeLogConfig(nTx = 100, nDocs = 60, seed = 94)
    val base = Fs.tempDir("graft-wbin-ss")
    val pcdc = CdcConfig(s"$base/log", s"$base/ptable", s"$base/pckpt", numBuckets = 4,
      emitDir = Some(s"$base/emit"), emitWireBinary = true)
    ChangeLogGen.writeLog(spark, cfg, pcdc.logDir, 3)
    val pt = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      pcdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, pt, pcdc, filesPerBatch = 1)
    val producer = pt.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    val ccdc = CdcConfig(s"$base/emit/batch-*", s"$base/ctable", s"$base/cckpt",
      numBuckets = 4, maxFilesPerTrigger = 2)
    val ct = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      ccdc, ChangeLogGen.snapshotLsn)
    WireSource.stream(spark, ct,
      ccdc, org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      binaryWire = true).awaitTermination()
    val state = ct.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    assert(state == producer)
    Fs.deleteRecursively(base)
  }

  test("golden frame: the byte layout is pinned (format stability)") {
    import spark.implicits._
    // one fully-known record through the real envelope path
    val emitted = Seq(("t1", "K", "u", 7L, 8L, 5L, 9L, 0L, 1))
      .toDF("topic", "key", "op", "commit_lsn", "change_lsn", "begin_lsn",
        "tx_id", "ts_ms", "emit_seq")
      .withColumn("after", struct(lit("a").as("k1"), lit(2).as("n")))
      .withColumn("before", lit(null).cast("struct<k1:string,n:int>"))
      .withColumn("table", lit("t"))
    val bytes = WireBinary.toWire(emitted, keyCol = "k1")
      .select("value").head().getAs[Array[Byte]](0)
    // independent straight-line construction of the documented layout
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    def s(v: String): Unit = { o.writeByte(1); val b = v.getBytes("UTF-8"); o.writeInt(b.length); o.write(b) }
    def l(v: Long): Unit = { o.writeByte(1); o.writeLong(v) }
    o.writeByte(0x47); o.writeByte(0x01) // magic, version
    o.writeByte(0)                       // before: null
    o.writeByte(1); s("a"); o.writeByte(1); o.writeInt(2) // after{k1,n}
    o.writeByte(1)                       // source present
    s("graft-spark"); s("informix"); s("graft"); s("t")
    l(7L); l(8L); l(5L); l(9L)           // commit, change, begin, txId
    s("u"); l(0L)                        // op, ts_ms
    val expected = bos.toByteArray
    assert(bytes.sameElements(expected),
      s"frame layout drifted:\n got ${bytes.map("%02x".format(_)).mkString}" +
        s"\nwant ${expected.map("%02x".format(_)).mkString}")
  }
}
