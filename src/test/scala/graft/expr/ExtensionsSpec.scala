package graft.expr

import graft.SparkSpec
import graft.ext.{GraftExtensions, VecDotRewrite}
import org.apache.spark.sql.functions._

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (s, v) -> s + v)"

  // inputs come from range() — a local Seq would be constant-folded into a
  // LocalRelation before the plan assertion could see the rewrite
  private def rangeVecs =
    spark.range(2).select(
      expr("array(id + 1, id + 2, id + 3)").as("a"),
      expr("array(id + 4, id + 5, id + 6)").as("b"))

  test("VecDotRewrite: HOF dot product plans as the codegen kernel") {
    spark.experimental.extraOptimizations = Seq(VecDotRewrite)
    try {
      val df = rangeVecs.select(expr(hofDot).as("dot"))
      assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot_q"),
             df.queryExecution.optimizedPlan.toString.take(400))
      assert(df.as[Long].collect().sorted.toSeq == Seq(32L, 56L))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("VecDotRewrite preserves HOF semantics on unequal-length inputs") {
    // zip_with pads the shorter side with nulls → the HOF form yields NULL;
    // the rewritten IF(size=size, …, NULL) must agree
    val rows = Seq((Array(1L, 2L, 3L), Array(4L, 5L)))
    def run(): Seq[Option[Long]] = {
      val df = rows.toDF("a", "b").select(expr(hofDot).as("dot"))
      df.as[Option[Long]].collect().toSeq
    }
    val plain = run()
    spark.experimental.extraOptimizations = Seq(VecDotRewrite)
    val rewritten = try run() finally {
      spark.experimental.extraOptimizations = Nil
    }
    assert(plain == Seq(None) && rewritten == plain)
  }

  test("VecDotRewrite leaves non-matching aggregates untouched") {
    spark.experimental.extraOptimizations = Seq(VecDotRewrite)
    try {
      // sum (not product) inside zip_with — must NOT be rewritten
      val df = rangeVecs
        .select(expr(
          "aggregate(zip_with(a, b, (x, y) -> x + y), CAST(0 AS BIGINT), (s, v) -> s + v)")
          .as("r"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("vec_dot_q"))
      // id=0: (1+4)+(2+5)+(3+6) = 21; id=1: each term +2 → 27
      assert(df.as[Long].collect().sorted.toSeq == Seq(21L, 27L))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("GraftExtensions installs rule and SQL functions (fresh session)") {
    // the shared session predates extension config, so exercise the class
    // through a sibling session context: register the same functions the
    // injector exposes and check SQL-level use end-to-end
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    VecFunctions.register(spark)
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark,
      "vec_dot_q", (cs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        VecDotQ(cs(0), cs(1)))
    val d = spark.sql(
      """SELECT vec_dot_q(array(CAST(2 AS BIGINT), CAST(3 AS BIGINT)),
                          array(CAST(4 AS BIGINT), CAST(5 AS BIGINT))) AS q,
                vec_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS f""")
      .as[(Long, Double)].head()
    assert(d == ((23L, 3.0)))
  }

  test("text-hash kernels register as SQL functions") {
    val B = org.apache.spark.sql.graftbridge.Bridge
    B.registerFunction(spark, "simhash32",
      (cs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashN(cs(0), 32))
    B.registerFunction(spark, "simhash64",
      (cs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashN(cs(0), 64))
    B.registerFunction(spark, "minhash_bands",
      (cs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashBands(cs(0), cs(1)))
    val r = spark.sql(
      """SELECT simhash32(array('quick', 'fox')) AS h32,
                simhash64(array('quick', 'fox')) AS h64,
                size(minhash_bands(array('a'), 'a')) AS nb""")
      .as[(Long, Long, Int)].head()
    // SQL results match the Column-API kernels exactly
    val (c32, c64) = Seq(Seq("quick", "fox")).toDF("w")
      .select(SimHashN(org.apache.spark.sql.functions.col("w"), 32),
              SimHashN(org.apache.spark.sql.functions.col("w"), 64))
      .as[(Long, Long)].head()
    assert(r._1 == c32 && r._2 == c64 && r._3 == 4)
    assert((r._2 & 0xFFFFFFFFL) == r._1)
  }
}
