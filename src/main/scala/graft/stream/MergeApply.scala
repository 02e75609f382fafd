package graft.stream

import graft.icelite.{IceLite, IceLiteTable, IceSnapshot, IceSummary}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** MERGE INTO apply — the sink half of the CDC contract, re-created as
  * an engine operation (no Iceberg SQL exists here): last-writer-wins
  * upsert/delete of a deduplicated change batch into a hash-bucketed
  * IceLite table, with additive schema evolution, truncate handling,
  * batch-id idempotent commits and per-bucket lineage rows.
  *
  * Ordering model. The reference applies events strictly in
  * (commit_lsn, change_lsn) order on a single thread
  * (`TxLogPosition.java:106-109`). A distributed engine cannot assume
  * its micro-batches arrive in log order (a file-source batch may
  * contain later segments than a batch that follows it), so ordering is
  * enforced by DATA, not by coordination:
  *
  *   - every stored row carries the version (__vc, __vl) that wrote it;
  *   - an incoming event only wins against a stored row if its
  *     (commit_lsn, change_lsn) is strictly greater — the monotone
  *     "never regress" rule of `TxLogPosition.cloneAndSet`
  *     (`TxLogPosition.java:53-60`) applied per key;
  *   - deletes leave tombstones so a late-arriving older upsert cannot
  *     resurrect a deleted key (replay-skip R1/R2 as data);
  *   - truncate raises a table-wide version FLOOR: events at or below
  *     the floor can never apply, in any later batch.
  *
  * With that, apply is commutative and idempotent across batches, and
  * replay after failure converges to the sequential-replay state.
  *
  * Scale design (must survive 1000 executors / 100 TB):
  *
  *   - LWW dedup (A2) is `groupBy(key).agg(max_by(payload, pos))`, NOT a
  *     window + row_number: hash aggregation does map-side partial
  *     aggregation, so a hot doc_id is reduced to one row per map task
  *     before the shuffle — Zipf skew never lands on a single reducer.
  *   - copy-on-write touches only the hash buckets named by the batch's
  *     keys; untouched buckets carry their files forward in metadata.
  *   - when the deduped change set is small (the common case), the big
  *     target side is NEVER shuffled: it flows bucket-pruned-scan ->
  *     broadcast-join-with-changes -> writer in one stage; only the
  *     small change side shuffles. Above the broadcast threshold the
  *     merge falls back to a shuffled union + max_by group-by (AQE
  *     handles partition sizing/skew).
  */
object MergeApply {

  final case class MergeStats(
      batchId: Long,
      committed: Boolean,
      alreadyApplied: Boolean,
      events: Long,
      upserts: Long,
      deletes: Long,
      truncated: Boolean,
      lsnLo: Long,
      lsnHi: Long,
      snapshotId: Long
  )

  /** Deduped-keys-per-batch below which the change side is broadcast. */
  var broadcastKeyThreshold: Long = 2000000L

  import IceLite.{TOMB, VC, VL}

  /** Deep-nullable canonical form so schema comparisons and unions never
    * trip over containsNull/nullable flags that differ between in-memory
    * Datasets and parquet round trips.
    */
  def asNullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType =
    dt match {
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(dataType = asNullable(f.dataType), nullable = true)))
      case a: org.apache.spark.sql.types.ArrayType =>
        a.copy(elementType = asNullable(a.elementType), containsNull = true)
      case m: org.apache.spark.sql.types.MapType =>
        m.copy(keyType = asNullable(m.keyType), valueType = asNullable(m.valueType),
          valueContainsNull = true)
      case other => other
    }

  /** Additive schema merge: table schema + any new after-struct fields
    * (reference: ALTERs arrive as CDC metadata and are additive, new
    * columns nullable — `InformixStreamingChangeEventSource.java:407-428`,
    * `InformixDatabaseSchema.java:59-78`).
    */
  def mergedSchema(table: StructType, after: StructType): StructType = {
    val known = table.fieldNames.toSet
    asNullable(StructType(table.fields ++ after.fields.filterNot(f => known.contains(f.name))))
      .asInstanceOf[StructType]
  }

  private def posGt(c: Column, l: Column, c0: Long, l0: Long): Column =
    (c > c0) || (c === c0 && l > l0)

  /** Apply one batch of committed ChangeEvent rows. Idempotent by
    * batchId AND by row version; advances watermark and floor.
    */
  def applyBatch(table: IceLiteTable, events: DataFrame, batchId: Long): MergeStats = {
    val t0 = System.nanoTime()
    val spark = table.spark
    val snap = table.refresh()

    // ---- idempotency gate (Iceberg replace-snapshot semantics) ----
    if (batchId <= snap.summary.lastBatchId) {
      return MergeStats(batchId, committed = false, alreadyApplied = true,
        0L, 0L, 0L, truncated = false, -1L, -1L, snap.snapshotId)
    }

    val keyCol = snap.keyCol
    val numBuckets = snap.numBuckets
    val sm = snap.summary

    // ---- floor filter: snapshot pin (S2) + all past truncates (E3) ----
    val floored = events.where(
      posGt(col("commit_lsn"), col("change_lsn"), sm.floorCommit, sm.floorChange))

    // ---- schema evolution (E4): widen table schema additively ----
    val afterSchema = floored.schema("after").dataType.asInstanceOf[StructType]
    val newSchema = mergedSchema(snap.schema, afterSchema)
    val userFields = newSchema.fields.toSeq

    // ---- truncate position: raises the floor for this and all batches ----
    val posCol = struct(col("commit_lsn"), col("change_lsn"))
    val truncRow = floored.where(col("op") === "t").agg(max(posCol)).collect()(0)
    val truncPos: Option[(Long, Long)] =
      if (truncRow.isNullAt(0)) None
      else { val r = truncRow.getStruct(0); Some((r.getLong(0), r.getLong(1))) }
    // floor only ever rises (monotone, like the offset): an out-of-order
    // batch carrying an OLD truncate must not lower it
    val (floorC, floorL) = truncPos match {
      case Some((tc, tl)) if tc > sm.floorCommit ||
        (tc == sm.floorCommit && tl > sm.floorChange) => (tc, tl)
      case _ => (sm.floorCommit, sm.floorChange)
    }

    val live = floored.where(posGt(col("commit_lsn"), col("change_lsn"), floorC, floorL))

    // ---- LWW dedup (A2): one surviving event per key, map-side combined ----
    val keyed = live
      .withColumn("__key", coalesce(col("after").getField(keyCol), col("before").getField(keyCol)))
      .where(col("__key").isNotNull)
    val last = keyed.groupBy(col("__key"))
      .agg(max_by(struct(col("op"), col("after"), col("commit_lsn"), col("change_lsn")),
        posCol).as("w"))
      .select(col("__key"), col("w.op").as("__op"), col("w.after").as("__after"),
        col("w.commit_lsn").as("__cvc"), col("w.change_lsn").as("__cvl"))
      .cache()

    // batch stats (one pass over events; also primes `last`)
    val statsRow = keyed.agg(
      count(lit(1)).as("n"), min(col("commit_lsn")), max(posCol)).collect()(0)
    val nEvents = statsRow.getLong(0)
    val lsnLo = if (statsRow.isNullAt(1)) -1L else statsRow.getLong(1)
    // watermark = monotone max over everything seen (R3), incl. truncates
    val allMaxRow = floored.agg(max(posCol)).collect()(0)
    val (wmC, wmL) =
      if (allMaxRow.isNullAt(0)) (sm.watermarkCommit, sm.watermarkChange)
      else {
        val r = allMaxRow.getStruct(0); val (c, l) = (r.getLong(0), r.getLong(1))
        if (c > sm.watermarkCommit || (c == sm.watermarkCommit && l > sm.watermarkChange)) (c, l)
        else (sm.watermarkCommit, sm.watermarkChange)
      }
    val lsnHi = if (allMaxRow.isNullAt(0)) -1L else allMaxRow.getStruct(0).getLong(0)

    if (nEvents == 0L && truncPos.isEmpty) {
      // empty batch (rolled back / behind floor): metadata-only snapshot so
      // the offset still advances — mirrors the reference updating offsets
      // on rollback without emitting
      // (`InformixStreamingChangeEventSource.java:393-403`).
      last.unpersist()
      var snapId = -1L
      commitWithRetry(table, batchId) { cur =>
        snapId = cur.snapshotId + 1
        cur.copy(snapshotId = cur.snapshotId + 1, parentId = cur.snapshotId,
          summary = IceSummary(batchId, batchId, wmC, wmL, floorC, floorL,
            -1L, -1L, 0L, 0L, "empty"))
      }
      return MergeStats(batchId, committed = true, alreadyApplied = false,
        0L, 0L, 0L, truncated = false, -1L, -1L, snapId)
    }

    // ---- flatten change side onto the merged schema ----
    val afterHas = afterSchema.fieldNames.toSet
    val changeCols: Seq[Column] = userFields.map { f =>
      val v =
        if (f.name == keyCol) col("__key")
        else if (afterHas.contains(f.name)) col("__after").getField(f.name)
        else lit(null).cast(f.dataType)
      when(col("__op") === "d", if (f.name == keyCol) col("__key") else lit(null).cast(f.dataType))
        .otherwise(v).as(f.name)
    }
    val changesFlat = last.select(
      (changeCols :+ col("__cvc").as(VC) :+ col("__cvl").as(VL)
        :+ (col("__op") === "d").as(TOMB)): _*)

    val nUpserts = last.where(col("__op") =!= "d").count()
    val nDel = last.where(col("__op") === "d").count()
    val nKeys = nUpserts + nDel

    // ---- touched buckets (<= numBuckets values — driver-safe collect) ----
    val bucketOfKey = pmod(hash(col(keyCol)), lit(numBuckets))
    val touched: Seq[Int] =
      if (truncPos.isDefined) 0 until numBuckets
      else changesFlat.select(bucketOfKey.as("b")).distinct().collect().map(_.getInt(0)).toSeq

    // ---- version-conditional merge ----
    val target: Option[DataFrame] =
      if (truncPos.isDefined) None // floor wipes everything at/below it; all prior rows lose
      else {
        val t = table.readBuckets(touched)
        val have = t.columns.toSet
        Some(t.select((userFields.map(f =>
          if (have.contains(f.name)) col(f.name)
          else lit(null).cast(f.dataType).as(f.name)) ++ Seq(col(VC), col(VL), col(TOMB))): _*))
      }

    val merged: DataFrame = target match {
      case None => changesFlat
      case Some(t) if nKeys <= broadcastKeyThreshold =>
        // big side never shuffles: scan -> broadcast hash join -> writer
        val bc = broadcast(changesFlat)
        val joined = t.as("t").join(bc.as("c"),
          col(s"t.$keyCol") === col(s"c.$keyCol"), "left")
        val wins = col(s"c.$keyCol").isNotNull &&
          (col(s"c.$VC") > col(s"t.$VC") ||
            (col(s"c.$VC") === col(s"t.$VC") && col(s"c.$VL") > col(s"t.$VL")))
        val updatedTarget = joined.select(
          (userFields.map(f => when(wins, col(s"c.${f.name}")).otherwise(col(s"t.${f.name}")).as(f.name)) ++ Seq(
            when(wins, col(s"c.$VC")).otherwise(col(s"t.$VC")).as(VC),
            when(wins, col(s"c.$VL")).otherwise(col(s"t.$VL")).as(VL),
            when(wins, col(s"c.$TOMB")).otherwise(col(s"t.$TOMB")).as(TOMB))): _*)
        // keys with no existing row: append as fresh rows/tombstones
        val matchedKeys = t.select(col(keyCol))
          .join(broadcast(changesFlat.select(col(keyCol))), Seq(keyCol), "left_semi")
        val newRows = changesFlat.join(matchedKeys, Seq(keyCol), "left_anti")
        updatedTarget.unionByName(newRows)
      case Some(t) =>
        // giant change set: shuffled union + per-key max_by (rare path)
        val all = t.unionByName(changesFlat)
        val payload = struct((userFields.map(f => col(f.name)) ++
          Seq(col(VC), col(VL), col(TOMB))): _*)
        all.groupBy(col(keyCol).as("__k"))
          .agg(max_by(payload, struct(col(VC), col(VL))).as("w"))
          .select(col("w.*"))
    }

    val out = merged.withColumn("__bucket", bucketOfKey)

    val commitRel = f"data/commit-$batchId%08d"
    out.write.mode("overwrite").partitionBy("__bucket")
      .parquet(table.dataPath(commitRel))
    last.unpersist()

    val written = IceLite.listCommittedFiles(table.root, commitRel)

    // ---- snapshot commit (atomic, idempotent, optimistic retry) ----
    var snapId = -1L
    val committed = commitWithRetry(table, batchId) { cur =>
      val keepOld: Map[Int, Seq[String]] =
        if (truncPos.isDefined) Map.empty
        else cur.files.view.filterKeys(b => !touched.contains(b)).toMap
      val s = cur.copy(
        snapshotId = cur.snapshotId + 1,
        parentId = cur.snapshotId,
        schema = newSchema,
        files = (keepOld ++ written).filter(_._2.nonEmpty),
        summary = IceSummary(batchId, batchId, wmC, wmL, floorC, floorL,
          lsnLo, lsnHi, nUpserts, nDel, if (truncPos.isDefined) "truncate" else ""))
      snapId = s.snapshotId
      s
    }

    // ---- lineage / metrics (E5/E6): per-bucket rows ----
    val latencyMs = (System.nanoTime() - t0) / 1000000L
    if (committed) {
      val lineage = keyed
        .groupBy(pmod(hash(col("__key")), lit(numBuckets)).as("bucket"))
        .agg(count(lit(1)).as("event_count"),
          min(col("commit_lsn")).as("lsn_lo"),
          max(col("commit_lsn")).as("lsn_hi"),
          sum(when(col("op") === "d", 1L).otherwise(0L)).as("deletes"))
        .withColumn("batch_id", lit(batchId))
        .withColumn("snapshot_id", lit(snapId))
        .withColumn("apply_latency_ms", lit(latencyMs))
        .withColumn("committed_at_ms", lit(System.currentTimeMillis()))
      table.appendLineage(lineage)
    }

    MergeStats(batchId, committed, alreadyApplied = !committed,
      nEvents, nUpserts, nDel, truncPos.isDefined, lsnLo, lsnHi, snapId)
  }

  /** Optimistic commit loop: on version conflict, refresh and re-check
    * the idempotency gate (a concurrent duplicate driver may have
    * committed our batch), then rebuild against the new current version.
    * Single logical writer is the normal mode (the reference is
    * single-task by design, `InformixConnector.java:53-58`); this loop
    * exists so a zombie driver can never double-apply.
    */
  private def commitWithRetry(table: IceLiteTable, batchId: Long)(
      build: IceSnapshot => IceSnapshot): Boolean = {
    var attempts = 0
    while (attempts < 20) {
      val cur = table.current
      if (batchId <= cur.summary.lastBatchId) return false
      if (table.commit(build(cur))) return true
      table.refresh()
      attempts += 1
    }
    throw new IllegalStateException(s"commit contention: gave up after $attempts attempts")
  }
}
