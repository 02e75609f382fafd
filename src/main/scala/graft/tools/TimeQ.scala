package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries: `runMain graft.tools.TimeQ
  * <sfDir> <query> [query ...]` (SPARK_GRAFT_CPUS cores). Each query
  * runs twice — cold then warm — so JIT/footer-cache effects are
  * visible separately from the plan's real cost.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"== $name pass$pass: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
