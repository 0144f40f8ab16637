package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for perf work: `runMain graft.TimeOne q_x [n]`.
  * Times each named query in isolation (fresh session caches, same config
  * as Bench) so bench-order cache interference can be separated from plan
  * regressions. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    // comma-separated names run IN SEQUENCE within one JVM/session each
    // pass — reproduces bench/probe cache-sharing order effects
    val names = args(0).split(',').toSeq
    (1 to n).foreach { i =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[timeone] $name pass$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
    }
    spark.stop()
  }
}
