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

  /** One hash chunk of an incremental snapshot as its own idempotent,
    * version-conditional batch — the unit [[Signals.process]] advances
    * between micro-batches (and between control-signal polls).
    */
  def runChunk(tbl: IceLiteTable, source: DataFrame, pinLsn: Long,
      nChunks: Int, chunkIdx: Int): MergeApply.MergeStats = {
    val keyCol = tbl.current.keyCol
    // chunk membership uses the PORTABLE hash (not Spark's murmur3) so
    // the snapshot-progress notifications' per-chunk row counts are
    // derivable by any engine from the source alone — same per-chunk
    // scan cost, still a deterministic uniform partition of the keys
    val chunk = source.where(
      pmod(graft.ops.TextOps.portableHash(col(keyCol).cast("string")),
        lit(nChunks.toLong)) === chunkIdx.toLong)
    // snapshot chunks ride their own idempotency channel so their ids
    // can never collide with (and never block) stream batch ids
    val batchId = tbl.refresh().summary.lastSignalBatchId + 1
    MergeApply.applyBatch(tbl, asChangeEvents(chunk, pinLsn), batchId,
      signalChannel = true)
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
    // E7 notifications: progress events mirroring the reference's
    // snapshot-progress channel (STARTED / IN_PROGRESS per chunk /
    // COMPLETED — `NotificationsIT.java:25-80`)
    tbl.appendNotification("Incremental Snapshot", "STARTED",
      s"pinLsn=$pinLsn chunks=$nChunks")
    val out = (0 until nChunks).map { i =>
      val stats = runChunk(tbl, source, pinLsn, nChunks, i)
      tbl.appendNotification("Incremental Snapshot", "IN_PROGRESS",
        s"chunk=${i + 1}/$nChunks rows=${stats.upserts}")
      betweenChunks(i)
      stats
    }
    tbl.appendNotification("Incremental Snapshot", "COMPLETED",
      s"pinLsn=$pinLsn chunks=$nChunks rows=${out.map(_.upserts).sum}")
    out
  }

  /** Blocking (on-demand) snapshot — N3: one chunk, stream paused by the
    * caller for its duration.
    */
  def blocking(tbl: IceLiteTable, source: DataFrame, pinLsn: Long): MergeApply.MergeStats =
    run(tbl, source, pinLsn, nChunks = 1).head

  /** Reconciling snapshot — the R4 recovery path: after a retention gap
    * the table may hold rows whose DELETE events were garbage-collected,
    * so a plain re-snapshot (upserts only) cannot converge. This variant
    * additionally emits tombstones at the pin version for every key
    * present in the table but absent from the consistent source view —
    * one anti-join over the table, making recovery state-complete.
    */
  def reconcile(tbl: IceLiteTable, source: DataFrame, pinLsn: Long): MergeApply.MergeStats = {
    val keyCol = tbl.current.keyCol
    val structType = org.apache.spark.sql.types.StructType(source.schema.fields)
    val missing = tbl.read().select(col(keyCol))
      .join(source.select(col(keyCol)), Seq(keyCol), "left_anti")
    // the before image carries the full source struct shape (key set,
    // rest null) so the union is exact
    val beforeFull = struct(structType.fields.map(f =>
      (if (f.name == keyCol) col(keyCol) else lit(null).cast(f.dataType)).as(f.name)).toSeq: _*)
    val deletes = missing.select(
      lit(pinLsn).as("commit_lsn"),
      lit(Long.MaxValue).as("change_lsn"),
      lit(pinLsn).as("begin_lsn"),
      lit(-1L).as("tx_id"),
      lit("d").as("op"),
      lit("snapshot").as("table"),
      beforeFull.as("before"),
      lit(null).cast(structType).as("after"),
      lit(0L).as("ts_ms"))
    val events = asChangeEvents(source, pinLsn).unionByName(deletes)
    tbl.appendNotification("Blocking Snapshot", "STARTED", s"reconcile pinLsn=$pinLsn")
    val batchId = tbl.refresh().summary.lastSignalBatchId + 1
    val stats = MergeApply.applyBatch(tbl, events, batchId, signalChannel = true)
    tbl.appendNotification("Blocking Snapshot", "COMPLETED",
      s"reconcile pinLsn=$pinLsn rows=${stats.upserts} deletes=${stats.deletes}")
    stats
  }
}
