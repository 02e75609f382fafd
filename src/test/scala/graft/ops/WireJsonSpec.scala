package graft.ops

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.{LogRecord, TokenDoc}
import graft.stream.{CdcConfig, CdcJob, TxAssembler}
import graft.util.Fs
import org.apache.spark.sql.functions._

/** Debezium wire-format adapter: JSON envelope egress (`toWire`) and
  * ingest (`fromWire`). Parity target: the reference's Kafka output —
  * `{before, after, source{commit_lsn, change_lsn, begin_lsn, txId},
  * op, ts_ms}` values, `{pk: value}` keys, null-value tombstones
  * (`SourceInfo.java:24-33`, `InformixConnectorIT.java:117-221`).
  */
class WireJsonSpec extends SparkSpec {

  private def fixture() = {
    val cfg = ChangeLogConfig(nTx = 120, nDocs = 80, seed = 83, deletePct = 20)
    val base = Fs.tempDir("graft-wire")
    ChangeLogGen.writeLog(spark, cfg, s"$base/log", 2)
    val raw = spark.read.schema(LogRecord.schema).parquet(s"$base/log")
    (base, cfg, TxAssembler.assemble(raw))
  }

  test("toWire -> fromWire roundtrips every committed event exactly") {
    val (base, _, events) = fixture()
    val emitted = TxAssembler.emitRecords(events, tombstonesOnDelete = true,
      keepBefore = true, keepSource = true)
    val wire = WireJson.toWire(emitted).cache()
    val back = WireJson.fromWire(wire, TokenDoc.schema)

    // the engine's own view of the same committed stream
    val want = events.where(col("op") =!= TxAssembler.MarkerOp)
      .select("commit_lsn", "change_lsn", "begin_lsn", "tx_id", "op", "table",
        "before", "after", "ts_ms")
    assert(back.count() == want.count(), "tombstones dropped, data events kept")
    assert(back.exceptAll(want).count() == 0 && want.exceptAll(back).count() == 0,
      "wire roundtrip must be exact: images, source coordinates, op, ts")

    // wire contract details
    val deletes = want.where(col("op") === "d").count()
    assert(deletes > 0, "fixture needs deletes")
    val tombs = wire.where(col("value").isNull)
    assert(tombs.count() == deletes, "one null-value record per delete")
    assert(tombs.where(col("key").isNull).count() == 0, "tombstones keep their key")
    // key envelope is {"doc_id": "..."}
    assert(wire.where(!col("key").rlike("""^\{"doc_id":"doc[0-9]+"\}$""")).count() == 0)
    // source block carries the reference's field names (txId, not tx_id)
    val one = wire.where(col("value").isNotNull).select("value").head().getString(0)
    Seq("\"commit_lsn\"", "\"change_lsn\"", "\"begin_lsn\"", "\"txId\"",
      "\"connector\":\"informix\"").foreach(f => assert(one.contains(f), f))
    wire.unpersist()
    Fs.deleteRecursively(base)
  }

  test("wire-ingested events drive the MERGE sink to the same final state") {
    val (base, cfg, events) = fixture()
    val emitted = TxAssembler.emitRecords(events, tombstonesOnDelete = true,
      keepBefore = true, keepSource = true)
    val back = WireJson.fromWire(WireJson.toWire(emitted), TokenDoc.schema)

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
    assert(a == b, "wire-ingested replay must converge to the direct-apply state")
    assert(a.nonEmpty)
    Fs.deleteRecursively(base)
  }

  test("F6: reversed/missing wire fields realign by name, absent column null") {
    import spark.implicits._
    // the sink schema declares (k1, k2, k3); the producer emits the
    // after-image with fields REVERSED and k3 absent — the reference's
    // column-order contract (InformixValidateColumnOrderIT.java:31-60)
    // requires materialization aligned to the schema, never positional
    val payload = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k1",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("k2",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("k3",
        org.apache.spark.sql.types.StringType)))
    val wire = Seq(
      ("t", """{"k1":"a"}""",
        """{"source":{"change_lsn":7,"commit_lsn":7},"op":"c",""" +
          """"after":{"k2":"beta","k1":"a"}}"""))
      .toDF("topic", "key", "value")
    val row = WireJson.fromWire(wire, payload)
      .select(col("after.k1"), col("after.k2"), col("after.k3")).head()
    assert(row.getString(0) == "a", "k1 realigned by name, not position")
    assert(row.getString(1) == "beta", "k2 realigned by name")
    assert(row.isNullAt(2), "schema column absent on the wire reads null")
  }

  test("garbage on the topic is dropped (and surfaced), never fatal") {
    import spark.implicits._
    val (base, _, events) = fixture()
    val emitted = TxAssembler.emitRecords(events, tombstonesOnDelete = false,
      keepBefore = true, keepSource = true)
    val wire = WireJson.toWire(emitted)
    val garbage = Seq(
      ("token_docs", """{"doc_id":"x"}""", "not json at all"),
      ("token_docs", """{"doc_id":"y"}""", """{"op":null}"""),
      ("token_docs", """{"doc_id":"z"}""", """{"no":"envelope"}"""))
      .toDF("topic", "key", "value")
      .withColumn("commit_lsn", lit(0L)).withColumn("change_lsn", lit(0L))
      .withColumn("emit_seq", lit(0))
    val mixed = wire.unionByName(garbage)
    val clean = WireJson.fromWire(wire, TokenDoc.schema)
    val fromMixed = WireJson.fromWire(mixed, TokenDoc.schema)
    assert(fromMixed.count() == clean.count(), "garbage must not add rows")
    assert(WireJson.badRecords(mixed, TokenDoc.schema).count() == 3,
      "each garbage record surfaces for DLQ accounting")
    Fs.deleteRecursively(base)
  }
}
