package graft.model

import org.apache.spark.sql.types._

/** One row of the target table: a pre-tokenized training sequence
  * (BASELINE.json input_hint: doc_id:string, tokens:array<int32>,
  * n_tok:int32, source:string). `tokens` equality per doc_id is the
  * correctness invariant.
  */
final case class TokenDoc(
    doc_id: String,
    tokens: Seq[Int],
    n_tok: Int,
    source: String
)

object TokenDoc {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("n_tok", IntegerType, nullable = true),
    StructField("source", StringType, nullable = true)
  ))
}

/** Raw change-log record — the stand-in for one decoded record off the
  * Informix CDC smart-blob stream. Record kinds mirror the reference's
  * `StreamRecord` subtypes consumed by the transaction engine
  * (`DbzTransactionEngine.java:93-135`):
  *
  *   op = "B"  BEGIN          (opens tx_id; lsn = begin LSN)
  *   op = "C"  COMMIT         (closes tx_id; lsn = commit LSN)
  *   op = "R"  ROLLBACK       (closes tx_id discarding all ops)
  *   op = "D"  DISCARD        (partial rollback to savepoint: buffered
  *                             records with lsn >= discard_from and
  *                             lsn < this record's lsn are dropped —
  *                             `DbzTransactionEngine.java:108-119`)
  *   op = "c"/"u"/"d"/"t"     INSERT / UPDATE / DELETE / TRUNCATE data ops
  *
  * `lsn` is globally unique and monotone in log order; records of one
  * transaction carry strictly increasing lsn.
  */
final case class LogRecord(
    lsn: Long,
    tx_id: Long,
    op: String,
    discard_from: Long, // only meaningful for op = "D"; else -1
    table: String,
    before: Option[TokenDoc],
    after: Option[TokenDoc],
    ts_ms: Long
)

object LogRecord {
  val schema: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("tx_id", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("discard_from", LongType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("before", TokenDoc.schema, nullable = true),
    StructField("after", TokenDoc.schema, nullable = true),
    StructField("ts_ms", LongType, nullable = false)
  ))
}

/** Assembled, committed change event in Debezium envelope form
  * (op/before/after/source — `InformixChangeRecordEmitter.java:28-76`),
  * flattened: source fields (commit_lsn, change_lsn, begin_lsn, tx_id,
  * ts_ms — `SourceInfo.java:23-33`) are top-level columns so they stay
  * codegen-friendly filter/sort keys.
  *
  * op ∈ {c, u, d, t, r} — CREATE/UPDATE/DELETE/TRUNCATE/READ(snapshot),
  * matching the reference envelope ops
  * (`InformixStreamingChangeEventSource.java:317-379`).
  */
final case class ChangeEvent(
    commit_lsn: Long,
    change_lsn: Long,
    begin_lsn: Long,
    tx_id: Long,
    op: String,
    table: String,
    before: Option[TokenDoc],
    after: Option[TokenDoc],
    ts_ms: Long
)

object ChangeEvent {
  val schema: StructType = StructType(Seq(
    StructField("commit_lsn", LongType, nullable = false),
    StructField("change_lsn", LongType, nullable = false),
    StructField("begin_lsn", LongType, nullable = false),
    StructField("tx_id", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("before", TokenDoc.schema, nullable = true),
    StructField("after", TokenDoc.schema, nullable = true),
    StructField("ts_ms", LongType, nullable = false)
  ))
}
