package graft.stream

import graft.icelite.IceLiteTable
import graft.ops.WireJson
import graft.util.Fs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Debezium wire-format INGEST source: the engine consuming a
  * Kafka-topic dump of reference-shaped JSON envelopes — the exact
  * records `WireJson.toWire` (or the reference connector itself,
  * `InformixChangeRecordEmitter` via Kafka Connect's JSON converter)
  * produces — and applying them to an IceLite sink with the same
  * exactly-once guarantees as the native log path.
  *
  * This closes the interchange loop: engine → wire → engine (or
  * reference → wire → engine). Wire records are COMMITTED events (the
  * producer already ran transaction assembly: rollbacks and savepoint
  * discards never reach a topic), so this path needs no tx assembly —
  * each micro-batch parses, floors, LWW-dedups and MERGEs through the
  * standard [[MergeApply.applyBatch]], inheriting the batch-id
  * idempotency gate, row-version LWW, monotone watermark advance, and
  * additive schema evolution.
  *
  * Exactly-once on this path: Structured Streaming's checkpoint tracks
  * which topic files were consumed; the batch-id gate makes re-delivery
  * of a whole batch a no-op; row versions (commit_lsn, change_lsn)
  * make re-delivery of individual records a no-op under LWW. Note the
  * consumer's watermark advances only over DATA events — the producer's
  * position markers (rollback-only / empty commits) are never emitted
  * to a topic — so a resumed consumer may re-read a tail the producer
  * had already passed; those replays are idempotent by construction.
  *
  * Schema evolution OVER THE WIRE: with `inferEvolution` on, each
  * micro-batch runs one schema-inference pass over the batch's JSON
  * values and widens the parse schema with after-image fields the sink
  * does not know yet (additive only — exactly the E4 contract);
  * [[MergeApply.buildDeltaPlan]] then propagates them to the table
  * schema. New columns land with their JSON-inferred types (integral →
  * long, fractional → double — the wire carries no tighter width). The
  * inference pass is O(batch); at production scale either pay it
  * (~one extra parse of the micro-batch) or disable it and widen the
  * sink schema out-of-band before producers start emitting the column.
  *
  * Garbage tolerance: a crawl-scale topic always carries malformed
  * records. Null values (delete tombstones — a log-compaction
  * artifact, not a change) are dropped by contract; unparseable values
  * are dropped and optionally quarantined to `<dlqDir>/wire-batch-N`
  * (overwrite-per-batch: idempotent under re-delivery).
  */
object WireSource {

  /** The Kafka record shape: topic + JSON key/value strings. Parquet
    * dumps with extra columns (the engine's own emit sink rides
    * commit_lsn/change_lsn/emit_seq alongside) project down to this. */
  val wireSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("key", StringType),
    StructField("value", StringType)))

  /** Position-only value schema: enough of the envelope to read the
    * source coordinates without committing to a payload schema. */
  private val posSchema: StructType = StructType(Seq(
    StructField("source", StructType(Seq(
      StructField("commit_lsn", LongType),
      StructField("change_lsn", LongType))))))

  /** The payload (row-image) schema for one batch: the sink's current
    * user schema, widened by after-image fields discovered in the
    * batch's JSON when `inferEvolution` is on. Known columns always
    * keep the TABLE's types (the JSON number width never narrows an
    * existing column). */
  def payloadSchema(wire: DataFrame, tableSchema: StructType,
      inferEvolution: Boolean): StructType = {
    val base = MergeApply.asNullable(tableSchema).asInstanceOf[StructType]
    if (!inferEvolution) base
    else {
      val spark = wire.sparkSession
      import spark.implicits._
      val values = wire.where(col("value").isNotNull).select(col("value").as[String])
      spark.read.json(values).schema.fields.find(_.name == "after").map(_.dataType) match {
        case Some(s: StructType) => MergeApply.mergedSchema(base, s)
        case _ => base // tombstones-only / empty batch: nothing to learn
      }
    }
  }

  /** Parse and apply one micro-batch of wire records. Topic filtering
    * (`topicInclude`, anchored regex alternation — the consumer-side
    * analog of a Kafka subscribe pattern) happens BEFORE parsing. */
  def applyWireBatch(table: IceLiteTable, wire0: DataFrame, batchId: Long,
      inferEvolution: Boolean = true,
      dlqDir: Option[String] = None,
      topicInclude: Option[Seq[String]] = None,
      inlineCompact: Boolean = true): MergeApply.MergeStats = {
    val spark = wire0.sparkSession
    graft.plans.LwwMaxBy.register(spark)
    val scoped = topicInclude match {
      case Some(ps) if ps.nonEmpty =>
        wire0.where(col("topic").rlike(CaptureFilters.anchored(ps)))
      case _ => wire0
    }
    // inference and/or DLQ mean a second full pass over the batch —
    // persist once (the MultiTable lesson: never re-scan a shared batch)
    val multiPass = inferEvolution || dlqDir.nonEmpty
    val wire = if (multiPass) scoped.persist(StorageLevel.MEMORY_AND_DISK) else scoped
    try {
      val payload = payloadSchema(wire, table.refresh().schema, inferEvolution)
      dlqDir.foreach { d =>
        WireJson.badRecords(wire, payload).write.mode("overwrite")
          .parquet(s"$d/wire-batch-$batchId")
      }
      val events = WireJson.fromWire(wire, payload)
      MergeApply.applyBatch(table, events, batchId, inlineCompact = inlineCompact)
    } finally if (multiPass) { wire.unpersist(); () }
  }

  /** Continuous wire consumption: tail `cfg.logDir` (here: the topic
    * dump directory — a glob like `dir/batch-*` works) as a file
    * stream, applying each micro-batch through the MERGE path. Same
    * checkpoint/trigger/compaction machinery as [[CdcJob.stream]]. */
  def stream(
      spark: SparkSession,
      table: IceLiteTable,
      cfg: CdcConfig,
      trigger: Trigger = Trigger.AvailableNow(),
      topicInclude: Option[Seq[String]] = None
  ): StreamingQuery = {
    graft.plans.LwwMaxBy.register(spark)
    val daemon =
      if (!cfg.asyncCompaction) None
      else Some(new graft.icelite.Maintenance.CompactionDaemon(
        table, MergeApply.maxDeltaChain,
        clusterBy = MergeApply.clusterBy,
        maxRowsPerFile = MergeApply.clusterMaxRowsPerFile))
    spark.readStream
      .schema(wireSchema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.logDir)
      .writeStream
      .queryName("graft-wire-apply")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyWireBatch(table, df, batchId,
          inferEvolution = cfg.wireInferEvolution, dlqDir = cfg.dlqDir,
          topicInclude = topicInclude, inlineCompact = daemon.isEmpty)
        daemon.foreach(_.poke()); ()
      }
      .start()
  }

  /** Deterministic batch-incremental wire runner (tests / backfills):
    * chunk the sorted topic-dump file list, apply each chunk as one
    * batch. Resume alignment is by CONTENT, like
    * [[CdcJob.runBatchIncremental]]: a chunk is already applied iff its
    * max source position is at or below the sink's resume point (one
    * position-only parse of the dump — no payload schema needed);
    * chunks that replay anyway are idempotent no-ops under LWW. */
  def runIncremental(
      spark: SparkSession,
      table: IceLiteTable,
      cfg: CdcConfig,
      filesPerBatch: Int,
      stopAfterBatches: Int = Int.MaxValue,
      topicInclude: Option[Seq[String]] = None
  ): Seq[MergeApply.MergeStats] = {
    val files = Fs.listParquet(cfg.logDir).sorted
    val chunks = files.grouped(filesPerBatch).toSeq
    val from = table.refresh().summary.lastBatchId + 1
    val todo: Seq[Seq[String]] =
      if (from <= 0 || files.isEmpty) chunks
      else {
        val sm = table.current.summary
        val (rc, rl) =
          if (sm.watermarkCommit >= sm.floorCommit)
            (sm.watermarkCommit, sm.watermarkChange)
          else (sm.floorCommit, Long.MaxValue)
        val maxPerFile: Map[String, (Long, Long)] = spark.read
          .schema(wireSchema).parquet(files: _*)
          .select(input_file_name().as("f"),
            from_json(col("value"), posSchema).as("p"))
          .where(col("p.source.commit_lsn").isNotNull)
          .groupBy(col("f"))
          .agg(max(struct(col("p.source.commit_lsn").as("c"),
            col("p.source.change_lsn").as("l"))).as("m"))
          .collect()
          .map { r =>
            val raw = r.getString(0)
            val p =
              if (raw.startsWith("file:")) new java.net.URI(raw).getPath else raw
            val m = r.getStruct(1)
            p -> (m.getLong(0), m.getLong(1))
          }.toMap
        def beyond(pos: (Long, Long)): Boolean =
          pos._1 > rc || (pos._1 == rc && pos._2 > rl)
        def needsApply(chunk: Seq[String]): Boolean =
          chunk.exists(f => maxPerFile.get(f).forall(beyond))
        chunks.filter(needsApply)
      }
    val daemon =
      if (!cfg.asyncCompaction) None
      else Some(new graft.icelite.Maintenance.CompactionDaemon(
        table, MergeApply.maxDeltaChain,
        clusterBy = MergeApply.clusterBy,
        maxRowsPerFile = MergeApply.clusterMaxRowsPerFile))
    val out = scala.collection.mutable.ArrayBuffer[MergeApply.MergeStats]()
    todo.zipWithIndex.foreach { case (chunk, j) =>
      if (j < stopAfterBatches) {
        val raw = spark.read.schema(wireSchema).parquet(chunk: _*)
        out += applyWireBatch(table, raw, from + j,
          inferEvolution = cfg.wireInferEvolution, dlqDir = cfg.dlqDir,
          topicInclude = topicInclude, inlineCompact = daemon.isEmpty)
        daemon.foreach(_.poke())
      }
    }
    daemon.foreach { d => try d.drain() finally d.close() }
    out.toSeq
  }
}
