package graft.expr

import graft.SparkSpec
import graft.expr.VecFunctions.vec_dot
import org.apache.spark.sql.functions._

class VecDotFSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f)),
    (1L, Array(0.5f, -1.0f, 2.0f)))
    .toDF("vec_id", "v")

  test("vec_dot matches the interpreted HOF form bit-for-bit") {
    val both = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        vec_dot($"a.v", $"b.v").as("fast"),
        expr("""aggregate(zip_with(a.v, b.v,
                 (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                 CAST(0 AS DOUBLE), (acc, x) -> acc + x)""").as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (f, h) => assert(f == h) }
  }

  test("vec_dot known value + SQL registration") {
    val d = vecs.where($"vec_id" === 0L)
      .select(vec_dot($"v", $"v")).as[Double].head()
    assert(d == (1.0 + 4.0 + 9.0))
    VecFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_tmp")
    val viaSql = spark.sql(
      "SELECT vec_dot(v, v) FROM vecs_tmp WHERE vec_id = 0").as[Double].head()
    assert(viaSql == 14.0)
  }

  test("documented edge semantics: min-length prefix, null elements as 0") {
    VecFunctions.register(spark)
    val prefix = spark.sql(
      """SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT), CAST(3 AS FLOAT)),
        |               array(CAST(4 AS FLOAT), CAST(5 AS FLOAT)))""".stripMargin)
      .as[Double].head()
    assert(prefix == 14.0) // 1*4 + 2*5; third element has no partner
    val withNull = spark.sql(
      """SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT), CAST(3 AS FLOAT)),
        |               array(CAST(2 AS FLOAT), CAST(5 AS FLOAT), CAST(7 AS FLOAT)))""".stripMargin)
      .as[Double].head()
    assert(withNull == 23.0) // 1*2 + 0 + 3*7
    val nullArray = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1 AS FLOAT)))")
      .collect()(0)
    assert(nullArray.isNullAt(0)) // null top-level array still yields NULL
  }

  test("VecDotQ shares the edge semantics (min-prefix, null-as-0, exact int64)") {
    val row = spark.sql(
      """SELECT array(CAST(1 AS BIGINT), CAST(NULL AS BIGINT), CAST(3 AS BIGINT)) AS a,
        |       array(CAST(2 AS BIGINT), CAST(5 AS BIGINT)) AS b""".stripMargin)
    val d = row.select(graft.expr.VecDotQ($"a", $"b")).as[Long].head()
    assert(d == 2L) // 1*2; index 1 null on a, index 2 absent on b
    val exact = row.select(graft.expr.VecDotQ($"a", $"a")).as[Long].head()
    assert(exact == 10L) // 1 + 0 + 9
  }

  test("fast ANN equals exact-arithmetic ANN ranking on real data") {
    val d = "/root/testdata/sf0.001"
    val fast = graft.ops.Vectors.annCosineTopKFast(spark, d)
      .select("query_id", "cand_id", "rnk")
    val exact = graft.ops.Vectors.annCosineTopK(spark, d)
      .select("query_id", "cand_id", "rnk")
    // quantization changes scores in the ~1e-6 range; rankings agree except
    // on near-ties — require ≥95% row agreement
    val n = fast.count().toDouble
    val agree = fast.intersect(exact).count().toDouble
    assert(agree / n >= 0.95, s"rank agreement $agree/$n")
  }

  test("codegen path is faster than the interpreted HOF path") {
    val emb = graft.etl.Feeds.table(spark, "/root/testdata/sf0.1", "embeddings")
      .select($"vec_id", $"embedding")
    // cache the pair set so the measurement isolates expression evaluation
    // from join cost (2000×500 = 1M pairs × 64 dims)
    val pairs = emb.as("a").crossJoin(broadcast(emb.limit(500).as("b"))).cache()
    pairs.count()
    val hof = """aggregate(zip_with(a.embedding, b.embedding,
         (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         CAST(0 AS DOUBLE), (acc, x) -> acc + x)"""
    def time(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both codepaths, then measure
    time(pairs.limit(100).select(vec_dot($"a.embedding", $"b.embedding")).collect())
    time(pairs.limit(100).select(expr(hof)).collect())
    val tFast = time(pairs.select(vec_dot($"a.embedding", $"b.embedding")
      .as("d")).agg(sum("d")).collect())
    val tHof = time(pairs.select(expr(hof).as("d")).agg(sum("d")).collect())
    pairs.unpersist()
    info(f"native codegen: $tFast%.2fs, interpreted HOF: $tHof%.2fs " +
      f"(${tHof / tFast}%.1fx)")
    assert(tFast < tHof) // measured ~6-12x on this box
  }
}
