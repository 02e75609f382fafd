package graft.stream

import graft.icelite.IceLiteTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N2/N3 — incremental (chunked) and blocking (on-demand) snapshots.
  *
  * The reference's signal-based incremental snapshot chunks each table
  * by primary key (`SELECT SKIP n FIRST 1 ... ORDER BY pk`,
  * `InformixConnection.java:142-151`) and interleaves chunk reads with
  * the live stream, deduplicating snapshot rows against concurrent
  * changes by key + max LSN (`InformixChangeEventSourceFactory.java:
  * 79-96`, `IncrementalSnapshotIT.java:30-182`). The blocking variant
  * pauses streaming and re-reads everything
  * (`InformixStreamingChangeEventSource.java:129-134`).
  *
  * Spark-first restatement: a snapshot chunk is just a batch of op='r'
  * READ events pinned at `pinLsn` with version (pinLsn, Long.MaxValue),
  * flowing through the SAME version-conditional MERGE as the stream —
  * a snapshot row wins against anything applied at or before the pin
  * (the source view already reflects those changes) and loses to any
  * later stream event. No special dedup machinery: N2 *is* A2.
  *
  * Chunking here is hash-modulo on the key (deterministic, uniform,
  * trivially resumable); a key-range variant would use
  * `repartitionByRange(nChunks, col(key))` — both bound per-chunk work
  * the way the reference's SKIP/FIRST pk windows do.
  *
  * Contract: `source` must be a CONSISTENT view as of `pinLsn`
  * (an immutable table snapshot — the same trick the engine uses to
  * avoid the reference's LOCK TABLE dance). pinLsn must be >= the
  * table's current floor.
  */
object IncrementalSnapshot {

  /** Wrap a consistent source view into READ change events at the pin. */
  def asChangeEvents(source: DataFrame, pinLsn: Long, table: String = "snapshot"): DataFrame = {
    val afterStruct = struct(source.columns.map(col).toSeq: _*)
    val structType = org.apache.spark.sql.types.StructType(source.schema.fields)
    source.select(
      lit(pinLsn).as("commit_lsn"),
      lit(Long.MaxValue).as("change_lsn"),
      lit(pinLsn).as("begin_lsn"),
      lit(-1L).as("tx_id"),
      lit("r").as("op"),
      lit(table).as("table"),
      lit(null).cast(structType).as("before"),
      afterStruct.as("after"),
      lit(0L).as("ts_ms"))
  }

  /** Incremental snapshot: apply the source in `nChunks` hash chunks,
    * each as its own idempotent batch (resumable chunk-by-chunk). The
    * `betweenChunks` hook lets a caller interleave live-stream batches,
    * as the reference does — correctness does not depend on the
    * interleaving thanks to version-conditional merge.
    */
  def run(
      tbl: IceLiteTable,
      source: DataFrame,
      pinLsn: Long,
      nChunks: Int,
      betweenChunks: Int => Unit = _ => ()
  ): Seq[MergeApply.MergeStats] = {
    val keyCol = tbl.current.keyCol
    (0 until nChunks).map { i =>
      val chunk = source.where(pmod(hash(col(keyCol)), lit(nChunks)) === i)
      // snapshot chunks ride their own idempotency channel so their ids
      // can never collide with (and never block) stream batch ids
      val batchId = tbl.refresh().summary.lastSignalBatchId + 1
      val stats = MergeApply.applyBatch(tbl, asChangeEvents(chunk, pinLsn), batchId,
        signalChannel = true)
      betweenChunks(i)
      stats
    }
  }

  /** Blocking (on-demand) snapshot — N3: one chunk, stream paused by the
    * caller for its duration.
    */
  def blocking(tbl: IceLiteTable, source: DataFrame, pinLsn: Long): MergeApply.MergeStats =
    run(tbl, source, pinLsn, nChunks = 1).head
}
