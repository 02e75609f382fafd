package graft.stream

import graft.SparkSpec
import graft.changelog.{ChangeLogConfig, ChangeLogGen}
import graft.model.TokenDoc
import graft.util.Fs

/** The stateful paths under the RocksDB state store provider: identical
  * final state / emitted sets vs the default heap-backed provider (the
  * provider is storage, not semantics — this pins that the engine's
  * state usage stays inside the provider contract: no reliance on heap
  * object identity, iteration order, or in-memory visibility).
  */
class RocksDbStateSpec extends SparkSpec {

  test("flatMapGroupsWithState tx assembly under RocksDB converges to the replay oracle") {
    import spark.implicits._
    val cfg = ChangeLogConfig(nTx = 80, nDocs = 60, seed = 211, maxOpsPerTx = 10)
    val base = Fs.tempDir("graft-rocksdb")
    try {
      val cdc = CdcConfig(s"$base/log", s"$base/table", s"$base/ckpt",
        numBuckets = 4, maxFilesPerTrigger = 1)
      val log = (0L until cfg.nTx).flatMap(i => ChangeLogGen.txRecords(cfg, i)).sortBy(_.lsn)
      log.grouped(math.max(1, log.size / 5)).zipWithIndex.foreach { case (slice, i) =>
        val tmp = f"${cdc.logDir}-stage/slice-$i%03d"
        slice.toDS().toDF().coalesce(1).write.parquet(tmp)
        val part = Fs.listParquet(tmp).head
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cdc.logDir))
        java.nio.file.Files.move(java.nio.file.Paths.get(part),
          java.nio.file.Paths.get(f"${cdc.logDir}/slice-$i%03d.parquet"))
      }
      val fresh = StateStores.useRocksDb(spark.newSession())
      assert(fresh.conf.get("spark.sql.streaming.stateStore.providerClass")
        === StateStores.RocksDbProvider)
      val table = CdcJob.snapshot(fresh,
        ChangeLogGen.initialTable(fresh, cfg).toDF(), cdc, ChangeLogGen.snapshotLsn)
      StatefulAssembly.stream(fresh, table, cdc).awaitTermination()

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

  test("dropDuplicatesWithinWatermark under RocksDB emits the same set as the heap provider's model") {
    import spark.implicits._
    val fresh = StateStores.useRocksDb(spark.newSession())
    val events = fresh.read.parquet("/root/testdata/sf0.001/events.parquet")
    val got = StreamDedup.overEvents(fresh, events)
      .select("key", "m", "src").as[(Long, Long, String)].collect().sorted.toSeq
    val expected = StreamDedup.emittedModel(StreamDedup.derive(events))
      .select("key", "m", "src").as[(Long, Long, String)].collect().sorted.toSeq
    assert(got.nonEmpty)
    assert(got === expected)
  }
}
