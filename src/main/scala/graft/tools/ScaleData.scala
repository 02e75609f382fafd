package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up of a testdata sf directory for SCALE-EVIDENCE
  * bench runs (not correctness — oracles always run against the
  * driver's own sf dirs): each table becomes `factor` re-keyed replicas
  * of itself, written to a destination directory with the same
  * one-parquet-per-table layout.
  *
  *   - Replica k offsets every entity id column by k * 10^7, so join
  *     keys stay referentially consistent WITHIN a replica and replicas
  *     never collide; parity/mod-derived batch assignments keep their
  *     per-replica structure (the offset is even and ≡ 0 mod 10^7).
  *   - `documents.text` gets a per-replica " rk<k>" suffix token so
  *     replicas are near-duplicates (LSH work is real) but not exact
  *     duplicates (exact dedup doesn't collapse the corpus to 1/factor);
  *     `n_chars` tracks the 4 appended chars. Replica 0 is byte-original.
  *   - Dimension tables small enough to broadcast in every plan
  *     (region, nation) stay 1x — scaling them would only distort the
  *     broadcast-side semantics, not add measured work.
  *
  * Usage: ScaleData <srcSfDir> <dstDir> <factor>
  */
object ScaleData {

  private val Off = 10000000L

  private def replicate(spark: SparkSession, src: String, table: String,
      factor: Int)(f: (DataFrame, Int) => DataFrame): DataFrame = {
    val base = spark.read.parquet(s"$src/$table.parquet")
    (0 until factor).map(k => f(base, k)).reduce(_ unionByName _)
  }

  private def offsetCols(df: DataFrame, k: Int, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * Off)))

  def scale(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    def write(name: String, df: DataFrame): Unit = {
      // one file per table, matching the source layout (queries and
      // footer caches behave the same way they do on the driver's dirs)
      val tmp = s"$dst/_stage_$name"
      df.repartition(math.max(1, factor / 2)).write
        .mode(SaveMode.Overwrite).parquet(tmp)
      val files = graft.util.Fs.listParquet(tmp).sorted
      val outDir = java.nio.file.Paths.get(dst, s"$name.parquet")
      graft.util.Fs.deleteRecursively(outDir.toString)
      java.nio.file.Files.createDirectories(outDir)
      files.zipWithIndex.foreach { case (fp, i) =>
        java.nio.file.Files.move(java.nio.file.Paths.get(fp),
          outDir.resolve(f"part-$i%05d.parquet"))
      }
      graft.util.Fs.deleteRecursively(tmp)
    }

    write("documents", replicate(spark, src, "documents", factor) { (d, k) =>
      if (k == 0) d
      else offsetCols(d, k, Seq("doc_id"))
        .withColumn("text", concat(col("text"), lit(s" rk$k")))
        // the ACTUAL suffix length: at factor > 10 (k >= 10) " rk<k>"
        // is 5+ chars, and a fixed +4 would silently skew every
        // length-derived behavior at larger scale factors (ADVICE r5)
        .withColumn("n_chars", col("n_chars") + lit(s" rk$k".length.toLong))
    })
    write("embeddings", replicate(spark, src, "embeddings", factor) {
      (d, k) => offsetCols(d, k, Seq("vec_id"))
    })
    write("events", replicate(spark, src, "events", factor) {
      (d, k) => offsetCols(d, k, Seq("event_id", "user_id"))
    })
    write("lineitem", replicate(spark, src, "lineitem", factor) {
      (d, k) => offsetCols(d, k, Seq("l_orderkey", "l_partkey", "l_suppkey"))
    })
    write("orders", replicate(spark, src, "orders", factor) {
      (d, k) => offsetCols(d, k, Seq("o_orderkey", "o_custkey"))
    })
    write("customer", replicate(spark, src, "customer", factor) {
      (d, k) => offsetCols(d, k, Seq("c_custkey"))
    })
    write("supplier", replicate(spark, src, "supplier", factor) {
      (d, k) => offsetCols(d, k, Seq("s_suppkey"))
    })
    write("part", replicate(spark, src, "part", factor) {
      (d, k) => offsetCols(d, k, Seq("p_partkey"))
    })
    Seq("nation", "region").foreach { t =>
      write(t, spark.read.parquet(s"$src/$t.parquet"))
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, factorS.toInt)
    spark.stop()
  }
}
