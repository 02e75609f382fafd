package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.icelite.IceLite
import graft.model.{ChangeEvent, TokenDoc}
import graft.util.Fs

/** Wider row shape for the additive-evolution fixture (FIXTURES.md §4:
  * "mid-stream ALTER adds `lang string`; later events carry it; sink
  * schema widens; old rows null").
  */
case class DocV2(doc_id: String, tokens: Seq[Int], n_tok: Int, source: String, lang: String)
case class EventV2(
    commit_lsn: Long, change_lsn: Long, begin_lsn: Long, tx_id: Long,
    op: String, table: String, before: Option[DocV2], after: Option[DocV2], ts_ms: Long)

/** E4 — additive schema evolution propagated to the sink
  * (`InformixStreamingChangeEventSource.java:407-428`,
  * `InformixDatabaseSchema.java:59-78`,
  * `SchemaHistoryTopicIT.java:74-127`).
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("additive column mid-stream: sink schema widens, old rows read null, new rows carry value") {
    import spark.implicits._
    val base = Fs.tempDir("graft-evo")
    val cfg = ChangeLogConfig(nTx = 10, nDocs = 20, seed = 31)
    val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt", numBuckets = 4)
    val table = CdcJob.snapshot(spark, ChangeLogGen.initialTable(spark, cfg).toDF(),
      cdc, ChangeLogGen.snapshotLsn)
    assert(table.current.schema.fieldNames.toSeq ==
      Seq("doc_id", "tokens", "n_tok", "source"))

    // batch 0: plain events (old schema)
    val e0 = Seq(
      ChangeEvent(100L, 10L, 1L, 1L, "u", "t", None,
        Some(TokenDoc("doc000000001", Seq(1, 2, 3), 3, "cdc")), 0L)
    ).toDS().toDF()
    MergeApply.applyBatch(table, e0, 0L)

    // batch 1: events carry the new `lang` column (post-ALTER)
    val e1 = Seq(
      EventV2(200L, 20L, 2L, 2L, "u", "t", None,
        Some(DocV2("doc000000002", Seq(9, 9), 2, "cdc", "en")), 0L),
      EventV2(200L, 21L, 2L, 2L, "c", "t", None,
        Some(DocV2("docNEW", Seq(7), 1, "cdc", "fr")), 0L)
    ).toDS().toDF()
    val s = MergeApply.applyBatch(table, e1, 1L)
    assert(s.committed)

    val cur = table.refresh()
    assert(cur.schema.fieldNames.toSeq ==
      Seq("doc_id", "tokens", "n_tok", "source", "lang"))

    val rows = table.read().collect().map(r =>
      r.getString(0) -> Option(r.getString(4))).toMap
    assert(rows("doc000000002") == Some("en"))
    assert(rows("docNEW") == Some("fr"))
    assert(rows("doc000000001") == None) // pre-ALTER write: null lang
    assert(rows("doc000000000") == None) // snapshot row: null lang

    // a LATER batch still on the old shape (straggler) must still apply
    val e2 = Seq(
      ChangeEvent(300L, 30L, 3L, 3L, "u", "t", None,
        Some(TokenDoc("doc000000003", Seq(5), 1, "cdc")), 0L)
    ).toDS().toDF()
    MergeApply.applyBatch(table, e2, 2L)
    val rows2 = table.read().where("doc_id = 'doc000000003'").collect()
    assert(rows2.length == 1 && rows2(0).isNullAt(4))

    Fs.deleteRecursively(base)
  }
}
