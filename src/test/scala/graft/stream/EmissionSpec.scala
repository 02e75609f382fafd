package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.LogRecord
import graft.util.Fs
import org.apache.spark.sql.functions._

/** Emission-config parity: `tombstones.on.delete`
  * (`InformixConnectorIT.java:117-221`) and
  * `cdc.return.empty.transactions`
  * (`InformixConnectorConfig.java:377-385`,
  * `TransactionMetadataIT.java:175-180`).
  */
class EmissionSpec extends SparkSpec {

  private def fixture() = {
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 80, seed = 83)
    val base = Fs.tempDir("graft-emit")
    ChangeLogGen.writeLog(spark, cfg, s"$base/log", 2)
    val raw = spark.read.schema(LogRecord.schema).parquet(s"$base/log")
    (base, raw)
  }

  test("tombstones.on.delete=true: every delete is followed by a (key, null) record") {
    val (base, raw) = fixture()
    val events = TxAssembler.assemble(raw)
    val off = TxAssembler.emitRecords(events, tombstonesOnDelete = false).cache()
    val on = TxAssembler.emitRecords(events, tombstonesOnDelete = true).cache()
    val deletes = off.where(col("op") === "d").count()
    assert(deletes > 0, "fixture must contain deletes")
    assert(off.where(col("op") === "tombstone").count() == 0)
    assert(on.where(col("op") === "tombstone").count() == deletes)
    assert(on.count() == off.count() + deletes)
    // each tombstone: null value, same key and position as its delete, ordered after
    val tombs = on.where(col("op") === "tombstone")
    assert(tombs.where(col("after").isNotNull).count() == 0)
    assert(tombs.where(col("key").isNull).count() == 0)
    assert(tombs.where(col("emit_seq") =!= 1).count() == 0)
    val paired = on.where(col("op") === "d").as("d")
      .join(tombs.as("t"),
        col("d.commit_lsn") === col("t.commit_lsn") &&
          col("d.change_lsn") === col("t.change_lsn") && col("d.key") === col("t.key"))
    assert(paired.count() == deletes)
    Fs.deleteRecursively(base)
  }

  test("emitFlatten: the sink chain's ExtractNewRecordState — flat rows, before-image deletes, no tombstones") {
    import graft.changelog.{ChangeLogConfig => CLC}
    val cfg = CLC(nTx = 100, nDocs = 60, seed = 89)
    val base = Fs.tempDir("graft-emitflat")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 4,
      emitDir = Some(s"$base/emit"), tombstonesOnDelete = true, emitFlatten = true)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 2)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    val flat = spark.read.parquet(s"$base/emit/batch-*")
    // plain rows: after-image fields at top level, no envelope columns
    assert(flat.columns.contains("doc_id") && flat.columns.contains("tokens"))
    assert(!flat.columns.contains("after") && !flat.columns.contains("before"))
    // tombstones dropped even though tombstones.on.delete is on
    assert(flat.where(col("__op") === "tombstone").count() == 0)
    val dels = flat.where(col("__op") === "d")
    assert(dels.count() > 0, "fixture must contain deletes")
    // rewrite mode: deletes flatten their BEFORE image, flagged __deleted
    assert(dels.where(col("doc_id").isNull).count() == 0)
    assert(dels.where(col("__deleted") =!= "true").count() == 0)
    assert(flat.where(col("__op") =!= "d" && col("__deleted") =!= "false").count() == 0)
    // envelope metadata carried under the __ prefix
    Seq("__topic", "__key", "__lsn").foreach(c => assert(flat.columns.contains(c), c))
    Fs.deleteRecursively(base)
  }

  test("emitWire: the engine's emission sink speaks the reference's Kafka wire format") {
    import graft.changelog.{ChangeLogConfig => CLC}
    import graft.model.TokenDoc
    val cfg = CLC(nTx = 100, nDocs = 60, seed = 89)
    val base = Fs.tempDir("graft-emitwire")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 4,
      emitDir = Some(s"$base/emit"), tombstonesOnDelete = true, emitWire = true)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 2)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    val wire = spark.read.parquet(s"$base/emit/batch-*")
    assert(wire.columns.toSet == Set("topic", "key", "value",
      "commit_lsn", "change_lsn", "emit_seq"))
    // deletes carry a trailing null-value tombstone; keys are {"pk": v}
    assert(wire.where(col("value").isNull).count() > 0)
    assert(wire.where(!col("key").rlike("""^\{"doc_id":""")).count() == 0)
    // the wire sink is ingestible: parse it back and re-apply onto a
    // second table — same final state as the direct engine run
    val back = graft.ops.WireJson.fromWire(wire, TokenDoc.schema)
    val cdc2 = cdc.copy(tableRoot = s"$base/table2", checkpointDir = s"$base/ckpt2",
      emitDir = None, emitWire = false)
    val t2 = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc2, ChangeLogGen.snapshotLsn)
    MergeApply.applyBatch(t2, back, batchId = 0L)
    import spark.implicits._
    val a = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    val b = t2.read().as[TokenDoc].collect().map(d => d.doc_id -> d.tokens).toMap
    assert(a == b, "wire-sink replay must reconverge to the engine state")
    Fs.deleteRecursively(base)
  }

  test("emitDir wires the config switches into the streaming path (E1/E2/E5 sink)") {
    import graft.changelog.{ChangeLogConfig => CLC}
    val cfg = CLC(nTx = 100, nDocs = 60, seed = 85)
    val base = Fs.tempDir("graft-emitdir")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 4,
      emitDir = Some(s"$base/emit"), tombstonesOnDelete = true)
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 2)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    // every batch produced an emitted-record dir and a tx-metadata dir
    val emitted = spark.read.parquet(s"$base/emit/batch-*")
    val txMeta = spark.read.parquet(s"$base/emit/tx-batch-*")
    val deletes = emitted.where(col("op") === "d").count()
    assert(deletes > 0, "fixture must contain deletes")
    assert(emitted.where(col("op") === "tombstone").count() == deletes,
      "tombstones.on.delete=true must emit one tombstone per delete")
    assert(emitted.where(col("op") === "tombstone" && col("after").isNotNull).count() == 0)
    // envelope completeness: emitted records carry commit timestamps
    assert(emitted.where(col("op").isin("c", "u", "d") && col("ts_ms").isNull).count() == 0)
    // committed transactions got metadata rows; rolled-back ones none
    assert(txMeta.where(col("commit_lsn").isNull).count() == 0)
    assert(txMeta.count() > 0)
    // switches off: no tombstones emitted; key override + topic routing
    // wired through the batch path end to end
    val cdcOff = cdc.copy(tableRoot = s"$base/table2", checkpointDir = s"$base/ckpt2",
      emitDir = Some(s"$base/emit2"), tombstonesOnDelete = false,
      messageKeyColumns = Seq(("token_.*", Seq("doc_id", "n_tok"))),
      topicRouting = Some(("token_(.*)", "cdc.$1")))
    val t2 = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdcOff, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, t2, cdcOff, filesPerBatch = 2)
    val emitted2 = spark.read.parquet(s"$base/emit2/batch-*")
    assert(emitted2.where(col("op") === "tombstone").count() == 0)
    assert(emitted2.where(col("topic") =!= "cdc.docs").count() == 0,
      "topic routing must reach the emitDir sink")
    val cu2 = emitted2.where(col("op").isin("c", "u"))
    assert(cu2.count() > 0)
    assert(cu2.where(col("key") =!=
      concat_ws(":", col("after.doc_id"), col("after.n_tok"))).count() == 0,
      "message.key.columns must reach the emitDir sink")
    // deletes through the ENGINE path: the pruned before image keeps
    // the override fields, so the emitted key matches the creates'
    val d2 = emitted2.where(col("op") === "d")
    assert(d2.count() > 0)
    assert(d2.where(!col("key").rlike("^doc[0-9]+:0$")).count() == 0,
      "delete keys must use the (pruned) before image's override fields")
    Fs.deleteRecursively(base)
  }

  test("message.key.columns override + logical-table topic routing on the emission surface") {
    val (base, raw) = fixture()
    val events = TxAssembler.assemble(raw)
    val out = TxAssembler.emitRecords(events, tombstonesOnDelete = true,
      messageKeyColumns = Seq(("token_.*", Seq("doc_id", "n_tok"))),
      topicRouting = Some(("token_(.*)", "cdc.$1"))).cache()
    // the table regex matched everything -> every record routed + rekeyed
    assert(out.count() > 0)
    assert(out.where(col("topic") =!= "cdc.docs").count() == 0,
      "topic.regex/replacement must rewrite token_docs -> cdc.docs")
    val cu = out.where(col("op").isin("c", "u"))
    assert(cu.count() > 0)
    assert(cu.where(col("key") =!=
      concat_ws(":", col("after.doc_id"), col("after.n_tok"))).count() == 0,
      "override key must be the listed after-image fields joined with ':'")
    // deletes + tombstones: null after image — every override field
    // falls back to the BEFORE image, so the delete's key equals its
    // create's (fixture before-images carry n_tok = 0)
    val d = out.where(col("op").isin("d", "tombstone"))
    assert(d.count() > 0)
    assert(d.where(!col("key").rlike("^doc[0-9]+:0$")).count() == 0,
      "delete/tombstone key must come from the before image, same shape as creates")
    // no routing/override configured: topic = table name, key = merge key
    val plain = TxAssembler.emitRecords(events, tombstonesOnDelete = false)
    assert(plain.where(col("topic") =!= "token_docs").count() == 0)
    assert(plain.where(col("key").contains(":")).count() == 0)
    Fs.deleteRecursively(base)
  }

  test("ContentBasedRouter analog: expression reroutes; null keeps the regex-routed topic") {
    val (base, raw) = fixture()
    val events = TxAssembler.assemble(raw)
    // chain: regex router first (token_docs -> cdc.docs), then content
    // routing on the record — deletes go to a dedicated topic, creates
    // and updates fall through (null) to the regex-routed name
    val out = TxAssembler.emitRecords(events, tombstonesOnDelete = true,
      topicRouting = Some(("token_(.*)", "cdc.$1")),
      contentRouting = Some(when(col("op") === "d", lit("cdc.deletes")))).cache()
    val d = out.where(col("op") === "d")
    assert(d.count() > 0, "fixture must contain deletes")
    assert(d.where(col("topic") =!= "cdc.deletes").count() == 0,
      "matched records must take the content-computed topic")
    // a delete's tombstone inherits the delete's routed topic (the
    // compacted target topic must see the null record)
    val ts = out.where(col("op") === "tombstone")
    assert(ts.count() == d.count())
    assert(ts.where(col("topic") =!= "cdc.deletes").count() == 0,
      "tombstones must land on their delete's routed topic")
    assert(out.where(col("op").isin("c", "u") && col("topic") =!= "cdc.docs").count() == 0,
      "null expression result must keep the regex-routed topic (SMT chain)")
    // expression over the payload, not just op: route by after-image size
    val bySize = TxAssembler.emitRecords(events, tombstonesOnDelete = false,
      contentRouting = Some(
        when(col("after").isNotNull && col("after.n_tok") > 8, lit("cdc.long"))))
    val cu = bySize.where(col("op").isin("c", "u")).cache()
    val long = cu.where(col("after.n_tok") > 8)
    assert(long.count() > 0 && long.where(col("topic") =!= "cdc.long").count() == 0)
    assert(cu.where(col("after.n_tok") <= 8 && col("topic") =!= "token_docs").count() == 0)
    Fs.deleteRecursively(base)
  }

  test("skipped.operations: configured ops are dropped on the ingest path (tx still closes)") {
    import spark.implicits._
    import graft.model.TokenDoc
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 80, seed = 87, deletePct = 25)
    val base = Fs.tempDir("graft-skipops")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 4,
      skippedOperations = Set("d"))
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 2)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    assert(log.exists(_.op == "d"), "fixture must contain deletes")
    val initial = (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) -> TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap
    // oracle: the same log with every delete record removed
    val want = ReplayOracle.replay(initial, log.filterNot(_.op == "d"),
      ChangeLogGen.snapshotLsn)
    val got = table.read().as[TokenDoc].collect().map(d => d.doc_id -> d).toMap
    assert(got.keySet == want.keySet,
      s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    want.foreach { case (k, w) => assert(got(k).tokens == w.tokens, s"tokens $k") }
    Fs.deleteRecursively(base)
  }

  test("outbox router: CREATE events on the outbox table become routed records") {
    import spark.implicits._
    import graft.ops.Outbox
    val events = Seq(
      ("c", "outbox", "order", "o-1", "created", "101", 10L, 1L),
      ("c", "outbox", "customer", "c-7", "signed-up", "102", 11L, 2L),
      ("u", "outbox", "order", "o-1", "should-not-route", "103", 12L, 3L),
      ("c", "other_table", "order", "o-9", "not-an-outbox", "104", 13L, 4L)
    ).toDF("op", "table", "aggregatetype", "aggregateid", "payload", "id",
        "commit_lsn", "change_lsn")
      .select(col("op"), col("table"),
        struct(col("aggregatetype"), col("aggregateid"), col("payload"), col("id"))
          .as("after"),
        col("commit_lsn"), col("change_lsn"))
    val routed = Outbox.route(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(routed.toSet == Set(
      ("outbox.event.order", "o-1", "101", "created"),
      ("outbox.event.customer", "c-7", "102", "signed-up")))
    // custom topic template
    val custom = Outbox.route(events, topicReplacement = s"t.${Outbox.TopicToken}.ev")
      .select(col("topic")).collect().map(_.getString(0)).toSet
    assert(custom == Set("t.order.ev", "t.customer.ev"))
  }

  test("reselect post-processor fills event NULLs from the sink's current state") {
    import spark.implicits._
    import graft.changelog.{ChangeLogConfig => CLC}
    import graft.model.TokenDoc
    val cfg = CLC(nTx = 10, nDocs = 20, seed = 163)
    val base = Fs.tempDir("graft-reselect")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 4)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    // an emitted-event batch whose capture EXCLUDED `source` (nulls),
    // incl. a brand-new key and a delete (null after image)
    def ev(op: String, key: String, commit: Long) = (
      commit, commit, commit, 1L, op, "token_docs",
      if (op == "d") Some(TokenDoc(key, Seq.empty, 0, null)) else None,
      if (op == "d") None else Some(TokenDoc(key, Seq(9), 1, null)),
      0L)
    val events = Seq(
      ev("u", graft.changelog.ChangeLogGen.docId(0L), 10L),
      ev("c", "docNEW", 11L),
      ev("d", graft.changelog.ChangeLogGen.docId(1L), 12L))
      .toDF("commit_lsn", "change_lsn", "begin_lsn", "tx_id", "op", "table",
        "before", "after", "ts_ms")
    val out = graft.ops.Reselect.reselect(events, table, Seq("source"))
      .select(col("op"), col("after")).collect()
      .map(r => r.getString(0) -> Option(r.getStruct(1)).map(_.getString(3)))
    val m = out.toMap
    assert(m("u") == Some("seed"), "existing key's excluded column refilled from the sink")
    assert(m("c") == Some(null), "unknown key has nothing to reselect")
    assert(m("d") == None, "delete events pass through untouched")
    Fs.deleteRecursively(base)
  }

  test("cdc.return.empty.transactions: empty committed txs appear only when enabled") {
    val (base, raw) = fixture()
    // splice a committed-but-empty transaction into the raw batch
    import spark.implicits._
    val empty = Seq(
      LogRecord(Long.MaxValue - 4, 777777L, "B", -1L, "token_docs", None, None, 0L),
      LogRecord(Long.MaxValue - 3, 777777L, "C", -1L, "token_docs", None, None, 0L)).toDS().toDF()
    val withEmpty = raw.unionByName(empty)
    val keep = TxAssembler.transactionMetadataAll(withEmpty, returnEmptyTransactions = false)
    val all = TxAssembler.transactionMetadataAll(withEmpty, returnEmptyTransactions = true)
    assert(keep.where(col("tx_id") === 777777L).count() == 0)
    assert(all.where(col("tx_id") === 777777L).count() == 1)
    assert(all.count() == keep.count() + 1)
    // rolled-back transactions never get metadata rows in either mode
    val rolledBack = withEmpty.groupBy(col("tx_id"))
      .agg(max(when(col("op") === "R", 1).otherwise(0)).as("rb"),
        max(when(col("op") === "C", 1).otherwise(0)).as("cm"))
      .where(col("rb") === 1 && col("cm") === 0).select("tx_id")
    assert(all.join(rolledBack, "tx_id").count() == 0)
    Fs.deleteRecursively(base)
  }
}
