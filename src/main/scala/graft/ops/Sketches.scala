package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-state cardinality sketches for corpus-scale profiling.
  *
  * Scale notes: `count(distinct x)` per group ships every distinct
  * value through the shuffle (Expand + two-phase agg). The KMV sketch
  * ([[graft.plans.KmvSketch]]) ships at most `KmvK` longs per group per
  * map task — constant regardless of cardinality — and is map-side
  * combined by ObjectHashAggregate. At 100 TB this is the difference
  * between a distinct-profiling job being O(distinct values) and
  * O(groups * k) on the wire. Everything is integer-exact over the
  * portable 56-bit hash, so a SQL oracle replays the sketch (and its
  * estimate) bit-for-bit: no RNG, no float accumulation.
  */
object Sketches {

  /** Sketch size. The SQL oracles are GENERATED from this constant —
    * change it only here. Relative error ≈ 1/sqrt(k-1) ≈ 12.6%.
    */
  val KmvK: Int = 64

  /** (k-1) * 2^56: the KMV estimator numerator over the 56-bit hash
    * domain. Fits a signed 64-bit integer for k <= 128.
    */
  val KmvEstNum: Long = (KmvK - 1).toLong * (1L << 56)

  /** Per-stratum distinct-content profile of a corpus: exact distinct
    * count (the small-scale comparison column — at production scale you
    * would drop it; that is the point of the sketch), the KMV estimate,
    * and its signed relative error.
    *
    * The estimate is computed with pure integer division (`div`) so it
    * is bit-identical across engines: exact when the stratum has fewer
    * than k distinct values, `(k-1)*2^56 div kth_min` otherwise.
    */
  def distinctProfile(df: DataFrame, strataCol: String = "lang",
      textCol: String = "text", k: Int = KmvK): DataFrame = {
    require(k >= 2 && k <= 128, s"k out of the overflow-safe range: $k")
    graft.plans.KmvSketch.register(df.sparkSession)
    val num = (k - 1).toLong * (1L << 56)
    df.select(col(strataCol),
        TextOps.portableHash(TextOps.normalized(col(textCol))).as("__hv"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("__hv")).as("n_distinct"),
        expr(s"kmv_sketch(__hv, $k)").as("__sk"))
      .select(col(strataCol), col("n_docs"), col("n_distinct"),
        col("__sk.n_kept").as("n_kept"),
        expr(s"CASE WHEN __sk.n_kept < $k THEN __sk.n_kept " +
          s"ELSE ${num}L div __sk.kth END").as("est_distinct"))
      .withColumn("rel_err", round(
        (col("est_distinct") - col("n_distinct")).cast("double") /
          col("n_distinct"), 4))
  }
}
