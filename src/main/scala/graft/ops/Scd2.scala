package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history materialization over the engine's change stream.
  *
  * The reference's before/after envelope exists precisely so consumers
  * can keep EVERY row version, not just the latest state
  * (`InformixRecordEmitter.java` emits full before/after images per op;
  * Debezium's documented envelope contract) — a history / slowly-
  * changing-dimension table is the canonical such consumer. The
  * engine's MERGE path ([[graft.stream.MergeApply]]) materializes
  * latest-state; this operator is its history-table counterpart: each
  * committed version becomes a row with a validity interval in
  * (commit_lsn, change_lsn) space.
  *
  * Semantics:
  *   - input = the engine's assembled committed-event schema
  *     ([[graft.stream.TxAssembler.assemble]] output — rollbacks and
  *     savepoint-discarded ops already dropped), optionally unioned
  *     with snapshot READ events pinned at
  *     `(snapshotLsn, Long.MaxValue)` ([[graft.stream.IncrementalSnapshot.asChangeEvents]]
  *     convention; every stream event has commit_lsn > snapshotLsn so
  *     the pin sorts first per key).
  *   - per key, versions are ordered by (commit_lsn, change_lsn); each
  *     version is valid from its own position until its successor's.
  *   - a delete closes its predecessor's interval and emits no version
  *     row of its own; a later insert re-opens the key (reinsertion
  *     yields a gap in the key's validity timeline, as it should).
  *   - `is_current` marks the open interval; a key whose last event is
  *     a delete has no current row.
  *
  * Scale shape: ONE shuffle — the window's hash partitioning on the
  * key, which at 10^10 events is the same doc_id hash space as the
  * table's bucket layout. The per-partition sort is bounded by a key's
  * version count (no global sort, no join). Truncates ('t') are
  * intentionally not part of this surface: a truncate is a whole-table
  * version floor, which a history table represents as a partition-level
  * epoch column, not per-row intervals (see `MergeApply` E3 notes).
  */
object Scd2 {

  /** @param events assembled committed change events (and optionally
    *               snapshot READ events), schema
    *               (commit_lsn, change_lsn, op, before, after, ...).
    * @param keyCol key field name inside the before/after structs.
    * @return one row per surviving version: key, op, valid_from_commit,
    *         valid_from_change, valid_to_commit, valid_to_change,
    *         is_current, after (the version's payload struct).
    */
  def history(events: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("commit_lsn"), col("change_lsn"))
    events
      .where(col("op").isin("c", "u", "d", "r"))
      .withColumn("__key",
        coalesce(col(s"after.$keyCol"), col(s"before.$keyCol")))
      .select(col("__key"), col("commit_lsn"), col("change_lsn"),
        col("op"), col("after"))
      // one window, two lead expressions in a single select -> Catalyst
      // plans ONE Window operator (single sorted pass per partition)
      .select(col("*"),
        lead(col("commit_lsn"), 1).over(w).as("valid_to_commit"),
        lead(col("change_lsn"), 1).over(w).as("valid_to_change"))
      .where(col("op") =!= "d")
      .select(
        col("__key").as(keyCol),
        col("op"),
        col("commit_lsn").as("valid_from_commit"),
        col("change_lsn").as("valid_from_change"),
        col("valid_to_commit"),
        col("valid_to_change"),
        col("valid_to_commit").isNull.as("is_current"),
        col("after"))
  }
}
