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

  // ------------------------------------------------------------------
  // IVFPQ (coarse cells + PQ over residuals + per-cell ADC)
  // ------------------------------------------------------------------

  /** Pure-Scala IVFPQ replay from the collected models: quantize,
    * nearest cell by integer L2 with (d, cid) tie-break, residual,
    * per-subspace argmin codes, probe order, per-cell ADC — an
    * independent straight-line implementation of the whole search.
    */
  private def ivfPqExpected(df: DataFrame, queryIds: Seq[Long], k: Int,
      kCells: Int, nprobe: Int): Map[Long, Seq[(Long, Long)]] = {
    import graft.plans.VecMath.roundHalfUp
    val vecs = df.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(v => roundHalfUp(v.toDouble * 10000.0)).toArray)
      .sortBy(_._1)
    val cents = Similarity.trainIvfCentroids(df, kCells).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toArray).sortBy(_._1).map(_._2)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum
    def cellOrder(q: Array[Long]): Seq[Int] =
      cents.zipWithIndex.map { case (c, cid) => (l2(q, c), cid) }.sorted.map(_._2).toSeq
    def resid(q: Array[Long], cell: Int): Array[Long] =
      q.zip(cents(cell)).map { case (x, y) => x - y }
    // residual-sample codebooks via the engine trainer (the trainer
    // itself is pinned by the PQ tests above)
    val session = df.sparkSession
    import session.implicits._
    val sampleRes = vecs.filter(_._1 % 4 == 0)
      .map { case (id, q) => (id, resid(q, cellOrder(q).head).toSeq) }.toSeq
      .toDF("vec_id", "q")
    val books = Similarity.trainPqCodebooksOn(sampleRes, m, ksub, iters = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2).toArray).toMap
    val ksubEff = books.keys.map(_._2).max + 1
    val dsub = dims / m
    def codesOf(r: Array[Long]): Array[Int] = (0 until m).map { s =>
      val qs = r.slice(s * dsub, (s + 1) * dsub)
      (0 until ksubEff).map(cid => (l2(qs, books((s, cid))), cid)).min._2
    }.toArray
    val enc = vecs.map { case (id, q) =>
      val cell = cellOrder(q).head
      (id, cell, codesOf(resid(q, cell)))
    }
    queryIds.map { qid =>
      val q = vecs.find(_._1 == qid).get._2
      val probed = cellOrder(q).take(nprobe)
      val scored = probed.flatMap { cell =>
        val rq = resid(q, cell)
        val dt = (0 until m).map { s =>
          val qs = rq.slice(s * dsub, (s + 1) * dsub)
          (0 until ksubEff).map(cid => l2(qs, books((s, cid)))).toArray
        }
        enc.filter(e => e._2 == cell && e._1 != qid).map { case (id, _, codes) =>
          (id, (0 until m).map(s => dt(s)(codes(s))).sum)
        }
      }
      qid -> scored.sortBy(p => (p._2, p._1)).take(k).toSeq
    }.toMap
  }

  test("ivfPqTopK equals a pure-Scala IVFPQ replay from the collected models") {
    val df = clustered(160, 8, seed = 11).cache()
    val q = df.where(col("vec_id") < 4)
    val got = Similarity.ivfPqTopK(df, q, k = 3, kCells = 8, m, ksub)
      .orderBy(col("query_id"), col("rank")).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq }
    val want = ivfPqExpected(df, Seq(0L, 1L, 2L, 3L), k = 3, kCells = 8, nprobe = 2)
    assert(got.keySet == want.keySet.filter(want(_).nonEmpty))
    got.foreach { case (id, rs) => assert(rs == want(id), s"query $id") }
  }

  test("ivfPqTopK is partitioning-invariant") {
    val df = clustered(160, 8, seed = 7)
    val q = df.where(col("vec_id") < 8)
    def run(c: DataFrame) = Similarity.ivfPqTopK(c, q, k = 3, kCells = 8, m, ksub)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq).toSeq
    assert(run(df.repartition(1)) == run(df.repartition(7)))
  }

  test("top-1 IVFPQ neighbor shares the query's cluster") {
    val df = clustered(200, 8, seed = 21).cache()
    val q = df.where(col("vec_id") < 8)
    val res = Similarity.ivfPqTopK(df, q, k = 1, kCells = 8, m, ksub)
      .join(df.select(col("vec_id"), col("cluster").as("n_cluster")), Seq("vec_id"))
      .join(df.select(col("vec_id").as("query_id"), col("cluster").as("q_cluster")),
        Seq("query_id"))
    assert(res.where(col("n_cluster") =!= col("q_cluster")).count() == 0)
  }

  test("IVFPQ plans: index build is one shuffle-free projection; scoring joins on cell without shuffling the corpus") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val dir = java.nio.file.Files.createTempDirectory("ivfpq-plan").toString
      clustered(160, 8, seed = 7).write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
      val q = df.where(col("vec_id") < 8)
      val codesPlan = Similarity.ivfPqCodes(df, kCells = 8, m = m, ksub = ksub)
        .queryExecution.executedPlan.toString
      assert(codesPlan.contains("ivfpq_encode"), codesPlan)
      assert(!codesPlan.contains("Exchange"),
        s"IVFPQ index build must not shuffle:\n$codesPlan")
      val plan = Similarity.ivfPqTopK(df, q, k = 3, kCells = 8, m, ksub)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected broadcast equi-join on cell:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
        s"corpus must not shuffle into the join:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
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
