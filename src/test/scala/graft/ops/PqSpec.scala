package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization: the compiled encode must equal the declarative
  * per-subspace argmin bit-for-bit (the SQL oracle replays the same
  * arithmetic), ADC scores must equal a pure-Scala recomputation from
  * the collected model, results must be partitioning-invariant, and on
  * well-separated clustered data the compressed-scan neighbor must land
  * in the query's cluster.
  */
class PqSpec extends SparkSpec {

  private val m = 4
  private val ksub = 8
  private val dims = 64

  /** Vectors in `centers` well-separated clusters (uniform centers in
    * [-1,1]^dims, noise +-0.05) — deterministic.
    */
  private def clustered(n: Int, centers: Int, seed: Long): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val cent = Array.fill(centers)(Array.fill(dims)(rnd.nextFloat() * 2f - 1f))
    (0 until n).map { i =>
      val c = cent(i % centers)
      (i.toLong, c.map(v => v + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq,
        (i % centers).toLong)
    }.toDF("vec_id", "embedding", "cluster")
  }

  private def intL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  test("pqCodes equals the declarative per-subspace argmin exactly") {
    val df = clustered(160, 8, seed = 7).cache()
    val cb = Similarity.trainPqCodebooks(df, m, ksub)
    val dsub = dims / m
    val quant = transform(col("embedding"), v => round(v.cast("double") * 10000).cast("long"))
    val sv = df.select(col("vec_id"), quant.as("q"))
      .select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("q"))
      .select(col("vec_id"), col("sub"),
        slice(col("q"), col("sub") * lit(dsub) + lit(1), lit(dsub)).as("q"))
    val ref = sv.join(cb, Seq("sub"))
      .withColumn("d", intL2(col("q"), col("c")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d"), col("cid"))).as("code"))
    val refMap = ref.collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val fast = Similarity.pqCodes(df, m, ksub).collect()
    assert(fast.length == 160)
    fast.foreach { r =>
      val id = r.getLong(0)
      val codes = r.getSeq[Int](1)
      assert(codes.length == m)
      (0 until m).foreach(s => assert(codes(s) == refMap((id, s)), s"vec=$id sub=$s"))
    }
  }

  test("ADC distances match a pure-Scala recomputation from the model") {
    val df = clustered(120, 8, seed = 9).cache()
    val q = df.where(col("vec_id") < 4)
    val res = Similarity.pqTopK(df, q, k = 3, m, ksub).collect()
    assert(res.length == 12)
    val cb = Similarity.trainPqCodebooks(df, m, ksub).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2)).toMap
    val codes = Similarity.pqCodes(df, m, ksub).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val qv = q.select(col("vec_id"), Similarity.quantized(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val dsub = dims / m
    res.foreach { r =>
      val (qid, vid, adc) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val expect = (0 until m).map { s =>
        val c = cb((s, codes(vid)(s)))
        val qs = qv(qid).slice(s * dsub, (s + 1) * dsub)
        qs.zip(c).map { case (x, y) => val d = x - y; d * d }.sum
      }.sum
      assert(adc == expect, s"q=$qid v=$vid")
    }
  }

  test("pqTopK is partitioning-invariant") {
    val df = clustered(160, 8, seed = 7)
    val q = df.where(col("vec_id") < 8)
    def run(c: DataFrame) = Similarity.pqTopK(c, q, k = 3, m, ksub)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq).toSeq
    assert(run(df.repartition(1)) == run(df.repartition(7)))
  }

  test("top-1 compressed-scan neighbor shares the query's cluster") {
    val df = clustered(200, 8, seed = 21).cache()
    val q = df.where(col("vec_id") < 8)
    val res = Similarity.pqTopK(df, q, k = 1, m, ksub)
      .join(df.select(col("vec_id"), col("cluster").as("n_cluster")), Seq("vec_id"))
      .join(df.select(col("vec_id").as("query_id"), col("cluster").as("q_cluster")),
        Seq("query_id"))
    assert(res.where(col("n_cluster") =!= col("q_cluster")).count() == 0)
  }

  test("pqCodeHist covers every subspace and accounts for every vector") {
    val df = clustered(160, 8, seed = 7)
    val hist = Similarity.pqCodeHist(df, m, ksub).collect()
    assert(hist.map(_.getLong(0)).distinct.sorted.toSeq == (0L until m).toSeq)
    assert(hist.map(_.getLong(2)).sum == 160L * m)
    hist.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < ksub))
  }

  test("scoring plan: corpus side never shuffles before scoring (broadcast join)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // parquet-backed corpus: a LocalRelation would be constant-folded
      // into a LocalTableScan and show no plan shape at all
      val dir = java.nio.file.Files.createTempDirectory("pq-plan").toString
      clustered(160, 8, seed = 7).write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
      val q = df.where(col("vec_id") < 8)
      // the corpus-side representation is ONE shuffle-free compiled
      // projection: scan -> pq_encode, zero exchanges
      val codesPlan = Similarity.pqCodes(df, m, ksub)
        .queryExecution.executedPlan.toString
      assert(codesPlan.contains("pq_encode"), codesPlan)
      assert(!codesPlan.contains("Exchange"),
        s"codes projection must not shuffle:\n$codesPlan")
      // scoring broadcasts the tiny query side; the corpus is never
      // sort-merge-joined or cartesian-joined (the only exchanges in
      // the full plan are the broadcast side's own tiny aggregations
      // and the per-query top-k window)
      val plan = Similarity.pqTopK(df, q, k = 3, m, ksub)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"expected broadcast of the tiny query side:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
        s"corpus must not shuffle into the join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
