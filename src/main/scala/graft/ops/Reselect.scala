package graft.ops

import graft.icelite.IceLiteTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reselect-columns post-processor — the engine form of the reference's
  * `ReselectColumnsPostProcessor` (`InformixReselectColumnsProcessorIT`):
  * an emitted change event may carry NULL for columns the capture path
  * did not ship (excluded columns, or the reference's
  * unavailable-value placeholders for heavy types); reselection
  * re-populates those fields from the CURRENT sink state of the same
  * key, after the merge applied.
  *
  * Spark-first shape: one equi-join of the event stream against the
  * sink's merged read on the key — and because the sink read can be the
  * DSv2 bucket-grouped scan, the join co-locates on the layout. The
  * "re-fetch" the reference performs row-by-row over JDBC is here a
  * set-oriented join, which is the only shape that survives 10^10
  * events.
  *
  * Semantics: for each event and each reselect field, the event's own
  * AFTER value wins when present; the sink's value fills NULLs. Delete
  * events (null after image) are passed through untouched.
  */
object Reselect {

  def reselect(events: DataFrame, table: IceLiteTable,
      fields: Seq[String]): DataFrame = {
    val keyCol = table.current.keyCol
    val afterType = events.schema("after").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val bad = fields.filterNot(afterType.fieldNames.contains)
    require(bad.isEmpty, s"reselect fields not in the after image: ${bad.mkString(", ")}")
    require(!fields.contains(keyCol), "the merge key is never reselected")
    val current = table.read()
      .select((keyCol +: fields).distinct.map(col): _*)
      .withColumnRenamed(keyCol, "__rk")
    val rebuilt = struct(afterType.fields.map { f =>
      val own = col("after").getField(f.name)
      (if (fields.contains(f.name)) coalesce(own, col(s"__rs_${f.name}")) else own)
        .as(f.name)
    }.toSeq: _*)
    val renamed = fields.foldLeft(current)((df, f) =>
      df.withColumnRenamed(f, s"__rs_$f"))
    events
      .join(renamed, col("after").getField(keyCol) === col("__rk"), "left")
      .withColumn("after",
        when(col("after").isNull, col("after")).otherwise(rebuilt))
      .drop("__rk" +: fields.map(f => s"__rs_$f"): _*)
  }
}
