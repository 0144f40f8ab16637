package graft

import graft.catalog.PipelineRunner
import org.apache.spark.sql.SparkSession

/** Warehouse-materialize timing harness: N passes of PipelineRunner.run
  * against throwaway roots in ONE session — reproduces Bench's warehouse
  * section (pass 1 pays the shared Pipeline cache fill; 2+ are warm).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.TimeMat 3"
  */
object TimeMat {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      PipelineRunner.run(spark, sfDir, s"/tmp/graft_mat_$i")
      println(f"[timemat] pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
