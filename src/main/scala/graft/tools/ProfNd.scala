package graft.tools

import graft.util.Fs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profiler for the stream_neardup query shape at sf0.1:
  * where do the ~9 s go — corpus-half signature aggregation, the two
  * index-table snapshots, or the probe's reads/joins?
  */
object ProfNd {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") + "/documents.parquet")
    // warm JIT/footers
    docs.count()
    val even = docs.where(col("doc_id") % 2 === 0)
    val odd = docs.where(col("doc_id") % 2 =!= 0)
    time("signatures(even).count-forced") {
      val sg = graft.ops.NearDupIndex.signatures(even)
      sg.agg(sum(element_at(col("sig"), 1))).collect()
    }
    val root = Fs.tempDir("graft-profnd")
    val idx = time("create(even)") {
      graft.ops.NearDupIndex.create(spark, s"$root/idx", even, numBuckets = 16)
    }
    val probed = time("probe(odd) build+collect") {
      graft.ops.NearDupIndex.probe(idx, odd).collect()
    }
    println(s"== probe rows: ${probed.length}")
    val probed2 = time("probe(odd) again (warm)") {
      graft.ops.NearDupIndex.probe(idx, odd).collect()
    }
    println(s"== probe rows: ${probed2.length}")
    Fs.deleteRecursively(root)
    spark.stop()
  }
}
