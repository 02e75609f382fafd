package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, plus two bucketed
  * scale paths (IVF by coarse label, sign-LSH by deterministic
  * hyperplanes) that bound the join to within-bucket candidates.
  *
  * All math is `functions._` higher-order expressions (zip_with +
  * aggregate) in double precision, element order preserved — codegen'd
  * and bit-deterministic, so SQL oracles can reproduce values exactly.
  */
object Similarity {

  /** Sequential-order dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: queries x corpus cross join.
    * The query side is tiny and broadcast, so the corpus never
    * shuffles; top-k uses a per-query window (k small). O(|Q|*|C|) —
    * the exactness baseline the bucketed variants are measured against.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos_sim"))
  }

  /** IVF-style search with a precomputed coarse assignment (here the
    * `label` column stands in for the nearest-centroid id): candidates
    * are restricted to the query's cell, turning the cross join into a
    * per-cell equi-join. At 10^10 scale: centroids from a sampled
    * k-means, cells hash-partitioned, nprobe>1 = union of cells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, cellCol: String = "label"): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      col(cellCol).as("cell"))
    val c = corpus.select(col("vec_id"), col("embedding"), col(cellCol).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos_sim"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * in [-0.5, 0.5), derived from the portable hash so any engine can
    * reproduce the bucketing.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(TextOps.portableHash(concat_ws(":", lit(plane), dim)), lit(1000L))
      .cast("double") / 1000.0) - 0.5

  /** Sign-LSH bucket id from `nPlanes` deterministic hyperplanes: bit i
    * = sign of dot(embedding, plane_i). Vectors in the same bucket are
    * near-duplicate candidates; search joins only within buckets.
    */
  def lshBucket(emb: Column, nPlanes: Int = 8): Column = {
    val bits = (0 until nPlanes).map { p =>
      val s = aggregate(zip_with(emb, sequence(lit(0), size(emb) - 1),
        (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN: exact cosine ranking within sign-LSH buckets.
    * Recall < 1 by construction; the scale path for 10^10 vectors
    * (bucket equi-join instead of cross join).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8): DataFrame = {
    val cb = corpus.select(col("vec_id"), col("embedding"),
      lshBucket(col("embedding"), nPlanes).as("bucket"))
    val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      lshBucket(col("embedding"), nPlanes).as("bucket"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos_sim"))
  }
}
