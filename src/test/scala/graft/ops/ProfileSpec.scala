package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the sketch-quantile contract: approx_percentile's answers must sit
  * within the documented rank tolerance of the true distribution — the
  * same spec-not-oracle treatment as the HLL distinct counts (summary
  * merge order is partitioning-dependent, so no cross-engine hash). */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("approx quantiles land within rank tolerance of exact") {
    val d = "/root/testdata/sf0.001"
    val orders = graft.etl.Feeds.table(spark, d, "orders")
      .select(col("o_totalprice").cast("double").as("v"))
      .persist()
    val n = orders.count().toDouble
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val approx = Profile.approxQuantileProfile(orders, "v", ps)
      .select("p", "q_value").as[(Double, Double)].collect().toMap
    assert(approx.keySet == ps.toSet)
    for (p <- ps) {
      val q = approx(p)
      // GK guarantee: the returned element's rank is within n/accuracy of
      // p·n; allow +2 rows for boundary discreteness
      val rankLo = orders.where(col("v") < q).count().toDouble
      val rankHi = orders.where(col("v") <= q).count().toDouble
      val tol = n / 10000 + 2
      assert(rankLo - tol <= p * n && p * n <= rankHi + tol,
        s"p=$p q=$q rank∈[$rankLo,$rankHi] target=${p * n}")
    }
    orders.unpersist()
  }
}
