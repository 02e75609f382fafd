package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking: designed token arrays hit every layout
  * case — single window (n <= maxLen), stride-aligned exact cover
  * (last window ends untruncated at n), truncated tail window, and
  * the empty doc (dropped). Fingerprints are cross-checked against a
  * driver-side recompute of the same fold.
  */
class ChunkingSpec extends SparkSpec {

  private val L = 8
  private val S = 6

  private def fixture: DataFrame = {
    import spark.implicits._
    Seq(
      ("a", (0 until 10).map(i => 100 + i)),   // 2 chunks, truncated tail
      ("b", (0 until 8).map(i => 200 + i)),    // exactly maxLen: 1 chunk
      ("c", (0 until 21).map(i => 300 + i)),   // 4 chunks
      ("d", (0 until 20).map(i => 400 + i)),   // last window ends exactly at n
      ("e", Seq.empty[Int]),                   // dropped
      ("f", Seq(7))                            // 1-token doc: 1 chunk
    ).toDF("doc_id", "tokens")
  }

  private def lens: Map[String, Int] =
    Map("a" -> 10, "b" -> 8, "c" -> 21, "d" -> 20, "f" -> 1)

  test("chunkEmit: windows tile [0,n) with stride overlap; fingerprints replay") {
    val rows = Chunking.chunkEmit(fixture, maxLen = L, stride = S)
      .orderBy(col("doc_id"), col("chunk_idx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byDoc = rows.groupBy(_._1)
    assert(!byDoc.contains("e"), "empty doc must be dropped")
    assert(byDoc.keySet == lens.keySet)
    val toks = fixture.collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    for ((id, n) <- lens) {
      val ch = byDoc(id).sortBy(_._2)
      val expChunks = if (n <= L) 1 else (n - L + S - 1) / S + 1
      assert(ch.length == expChunks, s"doc $id n_chunks")
      ch.zipWithIndex.foreach { case ((_, idx, start, len, newTok, fp), i) =>
        assert(idx == i)
        assert(start == i.toLong * S)
        val end = math.min(start + L, n.toLong)
        assert(len == end - start, s"doc $id chunk $i length")
        if (i < expChunks - 1) assert(len == L, s"non-last chunk $i of $id full")
        val prevEnd = if (i == 0) 0L else math.min((i - 1).toLong * S + L, n.toLong)
        assert(newTok == end - math.max(start, prevEnd), s"doc $id chunk $i new_tok")
        val expFp = toks(id).slice(start.toInt, end.toInt).zipWithIndex
          .map { case (t, p) => (p + 1).toLong * (((t.toLong % 1048576) + 1048576) % 1048576) }
          .sum
        assert(fp == expFp, s"doc $id chunk $i fingerprint")
      }
      // the last chunk ends at the doc's last token; new tokens sum to n
      assert(ch.last._3 + ch.last._4 == n.toLong, s"doc $id tail end")
      assert(ch.map(_._5).sum == n.toLong, s"doc $id new_tok total")
    }
  }

  test("chunkStats: closed-form totals equal the materialized chunks; no explode on the plan") {
    val emit = Chunking.chunkEmit(fixture, maxLen = L, stride = S)
    val emitted = emit.agg(sum("chunk_tok")).head.getLong(0)
    val stats = Chunking.chunkStats(
      fixture.withColumn("source", lit("s")), maxLen = L, stride = S).head()
    assert(stats.getAs[Long]("n_docs") == 5)
    assert(stats.getAs[Long]("corpus_tok") == lens.values.sum.toLong)
    assert(stats.getAs[Long]("emitted_tok") == emitted)
    assert(stats.getAs[Long]("overlap_tok") == emitted - lens.values.sum)
    assert(stats.getAs[Long]("max_chunks") == 4)
    val plan = Chunking.chunkStats(fixture.withColumn("source", lit("s")),
      maxLen = L, stride = S).queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), "stats path must not explode chunks")
  }

  test("chunkEmit is a pure projection: zero exchanges in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("tokens", transform(TextOps.words(col("text")),
        w => TextOps.portableHash(w)))
    val plan = Chunking.chunkEmit(docs, maxLen = 32, stride = 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must never shuffle:\n$plan")
  }
}
