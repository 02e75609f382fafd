package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Record-state extraction — the engine form of Debezium's
  * `ExtractNewRecordState` SMT (debezium-core; the reference wires its
  * SMT chain the same way `OutboxEventRouterIT.java` does for the
  * outbox router). Consumers that want plain rows, not envelopes,
  * flatten each change event to its after image, with the standard
  * knobs:
  *
  *   - `drop.tombstones` (default true): tombstone records — which
  *     carry no envelope at all — are removed.
  *   - `delete.handling.mode`:
  *       - `drop`   — delete events vanish from the flattened stream;
  *       - `rewrite`— a delete flattens its BEFORE image and carries
  *         `__deleted = 'true'` (live rows carry `'false'`), the shape
  *         compacted-topic consumers use to reconcile;
  *       - `none`   — deletes flatten to an all-null row (no before
  *         fallback), matching the SMT's passthrough of a null after.
  *   - `add.fields`: envelope/source metadata copied into the flat row
  *     under a double-underscore prefix (`op` → `__op`, `commit_lsn` →
  *     `__lsn`, ...), Debezium's field-prefix convention.
  *
  * Spark-first shape: a single codegen'd projection + filter — no
  * shuffle, no UDF; whatever plan feeds it (the assembled committed
  * stream, the emitted record stream) keeps its partitioning and its
  * whole-stage-codegen span through the unwrap.
  */
object Unwrap {

  /** delete.handling.mode values. */
  val DeleteDrop = "drop"
  val DeleteRewrite = "rewrite"
  val DeleteNone = "none"

  /** Flatten envelope records (columns `op`, `after`, optionally
    * `before`, plus metadata) to plain rows. `addFields` maps a source
    * column to the flattened alias (prefixed `__`).
    */
  def flatten(records: DataFrame,
      dropTombstones: Boolean = true,
      deleteMode: String = DeleteRewrite,
      addFields: Seq[(String, String)] = Seq("op" -> "op")): DataFrame = {
    require(Seq(DeleteDrop, DeleteRewrite, DeleteNone).contains(deleteMode),
      s"unknown delete.handling.mode: $deleteMode")
    val afterType = records.schema("after").dataType.asInstanceOf[StructType]
    val beforeFields: Set[String] =
      if (!records.columns.contains("before")) Set.empty
      else records.schema("before").dataType
        .asInstanceOf[StructType].fieldNames.toSet
    val isDelete = col("op") === "d"
    // rewrite mode resurrects the before image for deletes, PER FIELD:
    // upstream capture may prune the before image to a subset (this
    // engine ships before.<key> + kept override fields only), so a
    // field absent there flattens to null on a delete — exactly the
    // SMT's behavior for fields the connector did not capture
    def imgField(f: String): Column =
      if (deleteMode == DeleteRewrite && beforeFields.contains(f))
        when(isDelete, col("before").getField(f))
          .otherwise(col("after").getField(f))
      else if (deleteMode == DeleteRewrite && beforeFields.nonEmpty)
        when(isDelete, lit(null)).otherwise(col("after").getField(f))
      else col("after").getField(f)
    val flat = afterType.fieldNames.toSeq.map(f => imgField(f).as(f))
    val rewrite =
      if (deleteMode == DeleteRewrite)
        Seq(when(isDelete, "true").otherwise("false").as("__deleted"))
      else Nil
    val added = addFields.map { case (src, alias) => col(src).as(s"__$alias") }
    val kept = records
      .where(if (dropTombstones) col("op") =!= "tombstone" else lit(true))
      .where(if (deleteMode == DeleteDrop) !isDelete else lit(true))
    kept.select(flat ++ rewrite ++ added: _*)
  }
}
