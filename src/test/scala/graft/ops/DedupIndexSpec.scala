package graft.ops

import graft.SparkSpec
import graft.util.Fs

/** Incremental exact dedup against the fingerprint-keyed IceLite index:
  * probe correctness, bucket pruning (only touched bucket file-sets are
  * read), cross-batch growth, engine-grade idempotency of the update.
  */
class DedupIndexSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("probe flags exactly the batch docs whose content is in the corpus") {
    val base = Fs.tempDir("graft-dedupidx")
    val corpus = docs((0L until 40L).map(i => i -> s"corpus doc number $i"): _*)
    val index = DedupIndex.create(spark, s"$base/idx", corpus, numBuckets = 8)
    val batch = docs(
      100L -> "corpus doc number 7",       // dup of 7
      101L -> "Corpus  doc   NUMBER 7",    // dup of 7 after normalization
      102L -> "corpus doc number 39",      // dup of 39
      103L -> "entirely new content a",
      104L -> "entirely new content b")
    val got = DedupIndex.probe(index, batch)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toMap
    assert(got == Map(100L -> 7L, 101L -> 7L, 102L -> 39L))
    Fs.deleteRecursively(base)
  }

  test("probe reads only the buckets the batch's fingerprints hash to") {
    val base = Fs.tempDir("graft-dedupidx")
    val corpus = docs((0L until 200L).map(i => i -> s"spread doc $i"): _*)
    val index = DedupIndex.create(spark, s"$base/idx", corpus, numBuckets = 32)
    val one = docs(500L -> "spread doc 11")
    val fullFiles = index.read().inputFiles.length
    val snap = index.refresh()
    val fp = DedupIndex.fingerprints(one).select("fp").as[String].collect()(0)
    val b = graft.icelite.IceLite.bucketOf(fp, snap.numBuckets)
    val prunedFiles = index.readMerged(Seq(b)).inputFiles.length
    assert(prunedFiles < fullFiles, s"pruned=$prunedFiles full=$fullFiles")
    // and the pruned read still answers the probe
    val got = DedupIndex.probe(index, one).select("dup_of").as[Long].collect()
    assert(got.toSeq == Seq(11L))
    Fs.deleteRecursively(base)
  }

  test("update stamps a deterministic change_lsn: index state is identical under batch repartitioning") {
    val base = Fs.tempDir("graft-dedupidx-det")
    val corpus = docs((0L until 10L).map(i => i -> s"det doc $i"): _*)
    val idxA = DedupIndex.create(spark, s"$base/a", corpus, numBuckets = 4)
    val idxB = DedupIndex.create(spark, s"$base/b", corpus, numBuckets = 4)
    val batch = docs((100L until 140L).map(i => i -> s"new text $i"): _*)
    // same logical batch, perturbed physical partitioning: the stored
    // versions (incl. change_lsn) must come out bit-identical — a
    // nondeterministic stamp (e.g. monotonically_increasing_id) would
    // tie-break same-commitLsn collisions differently across retries
    DedupIndex.update(idxA, batch, batchId = 1L, commitLsn = 5L)
    DedupIndex.update(idxB, batch.repartition(7), batchId = 1L, commitLsn = 5L)
    def state(t: graft.icelite.IceLiteTable): Set[(String, Long, Long, Long)] =
      t.readRaw(t.refresh().buckets)
        .select(DedupIndex.FpCol, "doc_id", graft.icelite.IceLite.VC, graft.icelite.IceLite.VL)
        .as[(String, Long, Long, Long)].collect().toSet
    val a = state(idxA)
    assert(a == state(idxB))
    assert(a.nonEmpty)
    Fs.deleteRecursively(base)
  }

  test("dedupAndUpdate: cross-batch growth, within-batch canonicalization, idempotent replay") {
    val base = Fs.tempDir("graft-dedupidx")
    val corpus = docs((0L until 20L).map(i => i -> s"seed doc $i"): _*)
    val index = DedupIndex.create(spark, s"$base/idx", corpus, numBuckets = 8)
    // batch 1: one corpus dup, two copies of a new text, one unique
    val b1 = docs(
      200L -> "seed doc 3",
      201L -> "fresh text alpha",
      202L -> "fresh text alpha",
      203L -> "fresh text beta")
    val clean1 = DedupIndex.dedupAndUpdate(index, b1, batchId = 1L, commitLsn = 10L)
      .select("doc_id").as[Long].collect().toSet
    assert(clean1 == Set(201L, 203L), s"got $clean1")
    // batch 2: dup of batch-1's NEW content must now be caught
    val b2 = docs(
      300L -> "fresh text alpha",
      301L -> "another new one")
    val dups2 = DedupIndex.probe(index, b2)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toMap
    assert(dups2 == Map(300L -> 201L), s"got $dups2")
    val clean2 = DedupIndex.dedupAndUpdate(index, b2, batchId = 2L, commitLsn = 20L)
      .select("doc_id").as[Long].collect().toSet
    assert(clean2 == Set(301L))
    // replaying batch 2 is a no-op on the index (engine idempotency gate)
    val statsReplay = DedupIndex.update(index,
      docs(301L -> "another new one"), batchId = 2L, commitLsn = 20L)
    assert(statsReplay.alreadyApplied && !statsReplay.committed)
    // first-owner semantics survive everything
    val owner = DedupIndex.probe(index, docs(999L -> "fresh text alpha"))
      .select("dup_of").as[Long].collect()
    assert(owner.toSeq == Seq(201L))
    // STREAM-order ownership beats global-min: a LATER batch arriving
    // with a SMALLER doc_id is the dup — the registered owner keeps the
    // fingerprint (the stream_curation oracle's min-(batch, doc_id) rule)
    val late = DedupIndex.probe(index, docs(50L -> "fresh text alpha"))
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toMap
    assert(late == Map(50L -> 201L), s"got $late")
    Fs.deleteRecursively(base)
  }
}
