package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the PRODUCTION registration path: a session built with only
  * the config string
  *
  *   spark.sql.extensions=graft.ext.GraftExtensions
  *
  * and no programmatic `withExtensions`/`experimental` injection — the same
  * reflective class-load a `spark-submit --conf` deployment goes through.
  * `SparkSession.Builder.getOrCreate` reads `spark.sql.extensions` from the
  * underlying SparkContext's conf whenever it builds a session object, so
  * setting the key on the (shared) context and clearing the
  * active/default session forces the next getOrCreate through the
  * string → reflection → inject path on a fresh session. */
class ExtensionsConfigSpec extends AnyFunSuite {

  test("config-string session registers kernels and the optimizer rule") {
    val shared = SparkSpec.session // materialize the shared context first
    val sc = shared.sparkContext
    org.apache.spark.graftbridge.TestConfBridge.set(
      sc, "spark.sql.extensions", "graft.ext.GraftExtensions")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().getOrCreate()
      assert(s ne shared, "builder must construct a NEW session object")

      // SQL functions resolve by name — no programmatic registration here
      val row = s.sql(
        """SELECT simhash64(array('alpha', 'beta')) AS h,
                  vec_dot_q(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
                  zorder2(3L, 5L) AS z""").head()
      assert(row.getLong(1) == 32L)

      // cross-check values against the programmatic expression forms
      import org.apache.spark.sql.functions.{array, lit}
      val want = shared.range(1).select(
        graft.expr.SimHashN(array(lit("alpha"), lit("beta")), 64).as("h"),
        graft.expr.ZOrder2(lit(3L), lit(5L)).as("z")).head()
      assert(row.getLong(0) == want.getLong(0))
      assert(row.getLong(2) == want.getLong(1))

      // the optimizer rule rode in on the same config string: the HOF dot
      // product plans as the codegen kernel (range() input so constant
      // folding can't collapse it first)
      val df = s.range(2)
        .selectExpr("array(id + 1, id + 2) AS a", "array(id + 3, id + 4) AS b")
        .selectExpr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (s, v) -> s + v) AS dot")
      assert(df.queryExecution.optimizedPlan.toString.contains("vec_dot_q"),
             df.queryExecution.optimizedPlan.toString.take(400))
      import s.implicits._
      assert(df.as[Long].collect().sorted.toSeq == Seq(11L, 23L))
    } finally {
      // hand the JVM back to the shared session exactly as we found it
      org.apache.spark.graftbridge.TestConfBridge.remove(
        sc, "spark.sql.extensions")
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
