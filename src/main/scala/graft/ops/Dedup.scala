package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * word-shingle Jaccard, MinHash + LSH banding, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale notes (the part that matters at 100 TB):
  *   - exact dedup is a single hash `groupBy` on a 56-bit content
  *     fingerprint — map-side combined, skew-free (hash keys).
  *   - pairwise shingle Jaccard is quadratic in the worst case; it is
  *     the small-scale oracle. The scale path is MinHash+LSH: the
  *     shingle->signature reduction is a `groupBy(doc)` over portable
  *     per-permutation min-hashes (map-side combined), the candidate
  *     join is an equi-join on (band, bucket) — shuffle bounded by
  *     collision count, not |docs|^2.
  *   - hot shingles (stopword trigrams) are dropped before the pair
  *     join via a document-frequency cap — the skew-salting analog for
  *     similarity joins.
  */
object Dedup {

  import TextOps.portableHash

  /** Exact dedup: group on the normalized-content fingerprint, keep the
    * smallest doc_id as canonical.
    */
  def exact(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"), portableHash(TextOps.normalized(col(textCol))).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_dups"))

  /** Apply exact dedup: keep only each fingerprint group's canonical
    * (min doc_id) document — the "deduplicated corpus" output.
    */
  def applyExact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val canon = exact(df, textCol).select(col("canonical_doc_id").as("doc_id"))
    df.join(canon, Seq("doc_id"), "left_semi")
  }

  /** Distinct word n-gram shingles per document. */
  def shingles(df: DataFrame, n: Int = 3, textCol: String = "text"): DataFrame = {
    val ws = TextOps.words(col(textCol))
    df.select(col("doc_id"), ws.as("ws"))
      .where(size(col("ws")) >= n) // sequence(1, negative) would run backwards
      .select(col("doc_id"), explode(sequence(lit(1), size(col("ws")) - (n - 1))).as("i"),
        col("ws"))
      .select(col("doc_id"),
        concat_ws(" ", (0 until n).map(j => element_at(col("ws"), col("i") + j)): _*)
          .as("shingle"))
      .distinct()
  }

  /** Pairwise n-gram Jaccard similarity (candidate pairs above the
    * threshold). Exact but quadratic — the correctness oracle for the
    * MinHash path; at scale run [[minhashCandidates]] first and this
    * only on candidates.
    */
  def ngramJaccardPairs(
      df: DataFrame, n: Int = 3, threshold: Double = 0.2, textCol: String = "text"
  ): DataFrame = {
    val sh = shingles(df, n, textCol).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 4))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  /** Fixed MinHash permutation constants (a*h+b mod p over the portable
    * shingle hash). Literals so SQL oracles can reproduce them.
    */
  val MinhashP: Long = 2147483647L
  val MinhashA: Seq[Long] = Seq(1103515245L, 1299709L, 15485863L, 32452843L)
  val MinhashB: Seq[Long] = Seq(12345L, 362437L, 104729L, 49979687L)

  /** MinHash signatures: k portable permutations, min over shingles.
    * One `groupBy(doc_id)` with map-side partial min — skew-free.
    */
  def minhashSignatures(df: DataFrame, n: Int = 3, textCol: String = "text"): DataFrame = {
    val sh = shingles(df, n, textCol)
      .withColumn("h", pmod(portableHash(col("shingle")), lit(MinhashP)))
    val aggs = MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(MinhashP))).as(s"s$i")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: 2 bands of 2 signature components each; candidate
    * pairs = docs sharing any band bucket. The equi-join on
    * (band, bucket) is the scale path — no quadratic pair enumeration.
    */
  def minhashCandidates(df: DataFrame, n: Int = 3, textCol: String = "text"): DataFrame = {
    val sig = minhashSignatures(df, n, textCol)
    val banded = sig.select(col("doc_id"),
        array(
          struct(lit(0).as("band"), (col("s0") * 31 + col("s1")).as("bucket")),
          struct(lit(1).as("band"), (col("s2") * 31 + col("s3")).as("bucket"))).as("bands"))
      .select(col("doc_id"), explode(col("bands")).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 16-bit SimHash: per-word portable hash, bitwise weighted vote.
    * Expressed as explode(words) x explode(bits) -> two map-side-
    * combined groupBys; no UDF, no driver loop.
    */
  def simhash16(df: DataFrame, textCol: String = "text"): DataFrame = {
    val wordsDf = df
      .select(col("doc_id"), explode(TextOps.words(col(textCol))).as("w"))
      .withColumn("h", portableHash(col("w")))
    val bits = wordsDf
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(15))).as("b"))
      .withColumn("bit", expr("shiftright(h, cast(b as int)) % 2"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("bit") * 2 - 1).as("vote"))
    bits.groupBy(col("doc_id"))
      .agg(sum(when(col("vote") > 0, expr("shiftleft(cast(1 as bigint), cast(b as int))"))
        .otherwise(0L)).as("simhash"))
  }

  /** Embedding-cosine near-duplicate pairs. Brute pairwise at test
    * scale; at scale, pre-bucket by a coarse quantizer (label / IVF
    * cell / LSH signs) and join within buckets — see Similarity.
    */
  def embeddingNearDups(emb: DataFrame, threshold: Double = 0.4): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("e_a"), col("e_b")))
      .where(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_sim"))
  }
}
