package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.util.Fs

/** F3 — column masking / hashing / truncation applied to the after
  * image before MERGE (`InformixConnectorIT.java:1000-1048`).
  */
class TransformSpec extends SparkSpec {

  test("mask/sha256/truncate transforms reach the sink; key untouched") {
    val cfg = ChangeLogConfig(nTx = 60, nDocs = 40, seed = 71)
    val base = Fs.tempDir("graft-xform")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 4,
      columnTransforms = Map(
        "source" -> "mask:8",
        "doc_id" -> "mask:4" // must be ignored: merge key is protected
      ))
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 1)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    val rows = table.read().collect()
    val streamed = rows.filter(_.getString(3) != "seed") // snapshot rows untouched
    assert(streamed.nonEmpty)
    streamed.foreach { r =>
      assert(r.getString(3) == "********", s"source not masked: ${r.getString(3)}")
      assert(r.getString(0).startsWith("doc"), "merge key must never be transformed")
    }
    Fs.deleteRecursively(base)
  }

  test("rowFilter gate (Filter SMT analog): failing data events are dropped pre-merge") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cfg = ChangeLogConfig(nTx = 200, nDocs = 120, seed = 83)
    val base = Fs.tempDir("graft-gate")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 4,
      rowFilter = Some(col("after").getField("n_tok") % 2 === 0))
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 2)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    // oracle: sequential replay of the SAME log with failing c/u events
    // dropped (event-drop semantics: a failing update leaves the key's
    // prior version in place; deletes always pass)
    val initial = (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) -> graft.model.TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap
    val gatedLog = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
      .filter(r => !(r.op == "c" || r.op == "u") || r.after.exists(_.n_tok % 2 == 0))
    // one configured gate covers BOTH phases (Debezium SMTs see snapshot
    // READ events too): the initial table is gated exactly like the stream
    val gatedInitial = initial.filter { case (_, d) => d.n_tok % 2 == 0 }
    val want = ReplayOracle.replay(gatedInitial, gatedLog, ChangeLogGen.snapshotLsn)
    val got = graft.icelite.IceLite.load(spark, cdc.tableRoot).read()
      .as[graft.model.TokenDoc].collect().map(d => d.doc_id -> d).toMap
    assert(got.keySet == want.keySet,
      s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    want.foreach { case (k, w) => assert(got(k).tokens == w.tokens, s"tokens $k") }
    // and the gate actually bit: some odd-length update must exist in the raw log
    assert((0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
      .exists(r => (r.op == "c" || r.op == "u") && r.after.exists(_.n_tok % 2 == 1)))
    Fs.deleteRecursively(base)
  }

  test("snapshot statement override: partial snapshot; streaming is not restricted") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 80, seed = 97)
    val base = Fs.tempDir("graft-snapovr")
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
      numBuckets = 4,
      // the per-table custom snapshot SELECT: only long docs snapshot
      snapshotOverride = Some(_.where(col("n_tok") >= 8)))
    ChangeLogGen.writeLog(spark, cfg, cdc.logDir, 2)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    // snapshot phase holds only the overridden subset
    val snapIds = table.read().as[graft.model.TokenDoc].collect()
    assert(snapIds.forall(_.n_tok >= 8))
    assert(snapIds.length < cfg.nDocs, "override must actually bite")
    CdcJob.runBatchIncremental(spark, table, cdc, filesPerBatch = 1)
    // oracle: replay the FULL log over the REDUCED initial state — a key
    // excluded from the snapshot reappears on its first streamed event
    val initial = (0L until cfg.nDocs.toLong).map { k =>
      val t = ChangeLogGen.tokensFor(cfg.seed, k, 0L, cfg.maxTokens)
      ChangeLogGen.docId(k) -> graft.model.TokenDoc(ChangeLogGen.docId(k), t, t.size, "seed")
    }.toMap.filter { case (_, d) => d.n_tok >= 8 }
    val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i))
    val want = ReplayOracle.replay(initial, log, ChangeLogGen.snapshotLsn)
    val got = graft.icelite.IceLite.load(spark, cdc.tableRoot).read()
      .as[graft.model.TokenDoc].collect().map(d => d.doc_id -> d).toMap
    assert(got.keySet == want.keySet,
      s"extra=${(got.keySet -- want.keySet).take(5)} missing=${(want.keySet -- got.keySet).take(5)}")
    want.foreach { case (k, w) => assert(got(k).tokens == w.tokens, s"tokens $k") }
    // a key dropped at snapshot must have come back via the stream
    val dropped = ((0L until cfg.nDocs.toLong).map(ChangeLogGen.docId).toSet
      -- initial.keySet)
    assert(dropped.exists(got.contains), "a snapshot-excluded key should rematerialize")
    // the override must not touch the merge key
    intercept[IllegalArgumentException] {
      CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
        cdc.copy(tableRoot = s"$base/t2",
          snapshotOverride = Some(_.drop("doc_id"))),
        ChangeLogGen.snapshotLsn)
    }
    Fs.deleteRecursively(base)
  }

  test("sha256 transform is salted and deterministic") {
    import spark.implicits._
    val df = Seq(("k1", "hello")).toDF("k", "v")
      .select(org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("v")).as("after"))
    val out = CdcJob.transformAfter(df, Map("v" -> "sha256:pepper"))
      .select("after.v").collect()(0).getString(0)
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("pepperhello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == expected)
  }
}
