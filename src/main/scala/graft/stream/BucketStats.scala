package graft.stream

import org.apache.spark.util.AccumulatorV2

import scala.collection.mutable

/** Per-bucket statistics of one applied batch: row (key) count, raw
  * event count, deletes, and the batch's (commit_lsn, change_lsn) range
  * — the payload of a lineage row (E5/E6).
  */
final case class BucketStat(
    keys: Long,
    events: Long,
    deletes: Long,
    lsnLo: Long,
    hiCommit: Long,
    hiChange: Long
) {
  def merged(o: BucketStat): BucketStat = BucketStat(
    keys + o.keys,
    events + o.events,
    deletes + o.deletes,
    if (lsnLo < 0) o.lsnLo else if (o.lsnLo < 0) lsnLo else math.min(lsnLo, o.lsnLo),
    if (hiCommit > o.hiCommit || (hiCommit == o.hiCommit && hiChange >= o.hiChange)) hiCommit
    else o.hiCommit,
    if (hiCommit > o.hiCommit || (hiCommit == o.hiCommit && hiChange >= o.hiChange)) hiChange
    else o.hiChange
  )
}

/** Accumulates per-bucket batch statistics DURING the delta write (the
  * one full-data job of a MERGE apply), so lineage rows cost no second
  * pass over the written files and no extra driver barrier. Updates ride
  * the result (write) stage: Spark applies each successful task's
  * contribution exactly once, and the parquet commit protocol admits one
  * successful attempt per partition.
  *
  * Input tuple: (bucket, eventCount, isDelete, minCommitLsn,
  * versionCommit, versionChange) for one deduped key row.
  */
final class BucketStatsAcc
    extends AccumulatorV2[(Int, Long, Boolean, Long, Long, Long), Map[Int, BucketStat]] {

  private val m = mutable.HashMap.empty[Int, BucketStat]

  override def isZero: Boolean = m.isEmpty

  override def copy(): BucketStatsAcc = {
    val c = new BucketStatsAcc
    m.foreach { case (k, v) => c.m.update(k, v) }
    c
  }

  override def reset(): Unit = m.clear()

  override def add(v: (Int, Long, Boolean, Long, Long, Long)): Unit = {
    val (bucket, cnt, isDel, minc, vc, vl) = v
    val s = BucketStat(1L, cnt, if (isDel) 1L else 0L, minc, vc, vl)
    m.update(bucket, m.get(bucket).map(_.merged(s)).getOrElse(s))
  }

  override def merge(other: AccumulatorV2[(Int, Long, Boolean, Long, Long, Long), Map[Int, BucketStat]]): Unit =
    other.value.foreach { case (k, v) =>
      m.update(k, m.get(k).map(_.merged(v)).getOrElse(v))
    }

  override def value: Map[Int, BucketStat] = m.toMap
}
