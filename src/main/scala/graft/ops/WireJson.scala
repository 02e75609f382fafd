package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium wire-format adapter: serialize the engine's emitted record
  * stream to Kafka-style JSON key/value envelopes, and parse such
  * envelopes back into typed committed change events the MERGE path can
  * apply.
  *
  * Reference parity: the reference connector's OUTPUT is exactly this —
  * per-record JSON envelopes `{before, after, source, op, ts_ms}` with
  * the Informix source block (`SourceInfo.java:24-33`: commit_lsn,
  * change_lsn, begin_lsn, txId) and key `{<pk>: <value>}`; a delete is
  * followed by a null-value tombstone on the same key. `toWire` lets a
  * user of this engine feed any consumer built for the reference's
  * topics; `fromWire` lets existing reference topics (or another
  * instance of this engine) feed this engine's sink — chaining engines
  * over the public wire format.
  *
  * Scale notes: both directions are pure per-row projections
  * (`to_json`/`from_json` are codegen'd Catalyst expressions) — zero
  * shuffle, zero driver work, stays inside whole-stage codegen.
  */
object WireJson {

  /** The `source` block of the value envelope (SourceInfo parity). */
  val sourceSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("connector", StringType),
    StructField("db", StringType),
    StructField("table", StringType),
    StructField("commit_lsn", LongType),
    StructField("change_lsn", LongType),
    StructField("begin_lsn", LongType),
    StructField("txId", LongType)
  ))

  /** Value-envelope schema for a given payload (row image) type. */
  def valueSchema(payload: DataType): StructType = StructType(Seq(
    StructField("before", payload),
    StructField("after", payload),
    StructField("source", sourceSchema),
    StructField("op", StringType),
    StructField("ts_ms", LongType)
  ))

  /** Serialize an emitted record stream (the output of
    * `TxAssembler.emitRecords(keepBefore = true, keepSource = true)`)
    * into (topic, key, value) JSON string columns.
    *
    *   - `key` = `{"<keyCol>": "<record key>"}` — the reference's
    *     single-PK key envelope. With `message.key.columns` overrides
    *     the flattened `a:b` override value rides in the same field
    *     (the engine's emission key is a single string by design).
    *   - `value` = the Debezium envelope; a tombstone record serializes
    *     to a NULL value (Kafka log-compaction contract), key retained.
    *   - absent source fields (an input without tx metadata) serialize
    *     as JSON nulls.
    */
  /** The Debezium value envelope as a struct Column over an emitted
    * record stream — shared by the JSON ([[toWire]]) and binary
    * ([[WireBinary.toWire]]) serializers so both wires carry the
    * identical logical record.
    */
  private[ops] def envelopeCol(emitted: DataFrame, db: String): Column = {
    def opt(c: String, t: DataType): Column =
      if (emitted.columns.contains(c)) col(c).cast(t) else lit(null).cast(t)
    // Rebuild `before` by FIELD NAME against the after schema: the
    // engine may have pruned the before image to the key fields (the
    // MERGE path's optimization) — present fields serialize, pruned
    // ones become JSON nulls. Positional struct cast would misalign.
    val payload = emitted.schema("after").dataType.asInstanceOf[StructType]
    val beforeCol: Column =
      if (!emitted.columns.contains("before")) lit(null).cast(payload)
      else {
        val bt = emitted.schema("before").dataType.asInstanceOf[StructType]
        val rebuilt = struct(payload.fields.toSeq.map { f =>
          (if (bt.fieldNames.contains(f.name))
            col("before").getField(f.name).cast(f.dataType)
          else lit(null).cast(f.dataType)).as(f.name)
        }: _*)
        when(col("before").isNull, lit(null).cast(payload)).otherwise(rebuilt)
      }
    val source = struct(
      lit("graft-spark").as("version"),
      lit("informix").as("connector"),
      lit(db).as("db"),
      opt("table", StringType).as("table"),
      col("commit_lsn").as("commit_lsn"),
      col("change_lsn").as("change_lsn"),
      opt("begin_lsn", LongType).as("begin_lsn"),
      opt("tx_id", LongType).as("txId"))
    struct(
      beforeCol.as("before"),
      col("after").as("after"),
      source.as("source"),
      col("op").as("op"),
      col("ts_ms").as("ts_ms"))
  }

  def toWire(emitted: DataFrame, keyCol: String = "doc_id",
      db: String = "graft"): DataFrame = {
    val envelope = envelopeCol(emitted, db)
    emitted.select(
      col("topic"),
      to_json(struct(col("key").as(keyCol))).as("key"),
      when(col("op") === "tombstone", lit(null).cast(StringType))
        .otherwise(to_json(envelope)).as("value"),
      col("commit_lsn"), col("change_lsn"), col("emit_seq"))
  }

  /** Parse wire records back into committed change events (the
    * `ChangeEvent` column shape `MergeApply` consumes). Null values
    * (tombstones — a log-compaction artifact, never a change) and
    * records whose value fails to parse are dropped; a crawl-scale
    * topic always carries some garbage and a poisoned record must not
    * kill the job. `badRecordCount` counts them if callers want a DLQ
    * threshold.
    */
  def fromWire(wire: DataFrame, payload: DataType): DataFrame = {
    val parsed = wire.where(col("value").isNotNull)
      .withColumn("__env", from_json(col("value"), valueSchema(payload)))
      // PERMISSIVE from_json yields a null struct / null op on garbage
      .where(col("__env").isNotNull && col("__env.op").isNotNull &&
        col("__env.source.commit_lsn").isNotNull)
    parsed.select(
      col("__env.source.commit_lsn").as("commit_lsn"),
      col("__env.source.change_lsn").as("change_lsn"),
      col("__env.source.begin_lsn").as("begin_lsn"),
      col("__env.source.txId").as("tx_id"),
      col("__env.op").as("op"),
      col("__env.source.table").as("table"),
      col("__env.before").as("before"),
      col("__env.after").as("after"),
      col("__env.ts_ms").as("ts_ms"))
  }

  /** Wire records that are neither valid envelopes nor tombstones. */
  def badRecords(wire: DataFrame, payload: DataType): DataFrame =
    wire.where(col("value").isNotNull)
      .withColumn("__env", from_json(col("value"), valueSchema(payload)))
      .where(col("__env").isNull || col("__env.op").isNull ||
        col("__env.source.commit_lsn").isNull)
      .drop("__env")
}
