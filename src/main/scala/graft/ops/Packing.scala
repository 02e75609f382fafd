package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-sequence packing for pretraining: documents are concatenated
  * in a deterministic order and CHUNKED into fixed `capacity`-token
  * training sequences (document-crossing allowed — the standard
  * "concat-and-chunk" packing), so every sequence except a group's
  * last is exactly full.
  *
  * Scale shape: a single global concatenation order would serialize on
  * one partition (a running sum over the whole corpus), so documents
  * are first spread into `groups` independent packing groups by key
  * hash — each group packs in parallel with its own running offset
  * (one window per group, keys hash-spread, no global sort). At 10^10
  * docs, `groups` scales with the cluster (each group's window is a
  * per-partition scan after the hash exchange). Within a group the
  * order (doc_id) and arithmetic are integer-exact, so any engine
  * reproduces the same layout — the DuckDB oracle replays it.
  *
  * Per document: its packing group, its [start_off, end_off) token
  * interval in the group's concatenated stream, and the first/last
  * sequence (bin) it lands in — everything a writer needs to emit the
  * packed sequences, and everything an index needs to find a doc in
  * them.
  */
object Packing {

  /** Packing-group assignment: the PORTABLE 56-bit hash (md5-derived,
    * non-negative), not Spark's murmur3 — the layout must be
    * bit-reproducible by any engine (the oracles) and across reruns.
    */
  private def grpOf(idCol: String, groups: Int): Column =
    pmod(TextOps.portableHash(col(idCol).cast("string")), lit(groups.toLong))

  def packOffsets(docs: DataFrame, capacity: Int = 2048, groups: Int = 8,
      idCol: String = "doc_id", nTokCol: String = "n_tok"): DataFrame = {
    require(capacity > 0 && groups > 0)
    val g = grpOf(idCol, groups).as("grp")
    val w = Window.partitionBy(col("grp")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col("__n")).over(w)
    docs.select(col(idCol), col(nTokCol).cast("long").as("__n"), g)
      .withColumn("end_off", cum)
      .withColumn("start_off", col("end_off") - col("__n"))
      .select(
        col(idCol),
        col("grp").cast("long").as("grp"),
        col("start_off"),
        col("end_off"),
        floor(col("start_off") / capacity).cast("long").as("first_seq"),
        // last token of the doc sits at end_off - 1
        floor((col("end_off") - 1) / capacity).cast("long").as("last_seq"))
  }

  /** Per-group packing summary: sequences produced and the fill ratio
    * of the (single, final) partially-filled sequence per group.
    */
  def packStats(docs: DataFrame, capacity: Int = 2048, groups: Int = 8,
      idCol: String = "doc_id", nTokCol: String = "n_tok"): DataFrame =
    docs.select(grpOf(idCol, groups).cast("long").as("grp"),
        col(nTokCol).cast("long").as("__n"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("total_tokens"))
      .withColumn("n_seqs", ceil(col("total_tokens").cast("double") / capacity).cast("long"))
      .withColumn("tail_fill",
        round((col("total_tokens") - (col("n_seqs") - 1) * capacity).cast("double")
          / capacity, 4))

  /** Convenience: fraction of emitted sequences that are exactly full
    * (all but one per group, by construction).
    */
  def fullSeqFraction(stats: DataFrame): Column =
    sum(col("n_seqs") - 1) / sum(col("n_seqs"))
}
