package graft

import org.apache.spark.sql.functions._

class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("every driver query has an oracle and vice versa (no silent rows-only)") {
    // a queries key without an oracleSql entry silently downgrades that
    // query to the driver's weaker rows-only check; an oracle without a
    // query is dead SQL — keep the two maps in lockstep
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet,
      (SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet).toString +
      " / " +
      (SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet).toString)
  }

  test("dense assigns 1..N in sort order") {
    val df = Seq(("c", 30), ("a", 10), ("b", 20)).toDF("k", "v")
    val got = Ids.dense(df, Seq("k"), "id")
      .orderBy("id").select("id", "k").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("offset continues a previous sequence") {
    val df = Seq(("x", 1), ("y", 2)).toDF("k", "v")
    val got = Ids.dense(df, Seq("k"), "id", offset = 100L)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(101L, 102L))
  }

  test("multi-column sort key; ids are dense and unique across partitions") {
    val df = (1 to 1000).map(i => (i % 7, i)).toDF("a", "b")
      .repartition(8)
    val ids = Ids.dense(df, Seq("a", "b"), "id").select("id").as[Long].collect()
    assert(ids.length == 1000)
    assert(ids.sorted.toSeq == (1L to 1000L))
  }

  test("empty input yields empty output with id column") {
    val df = Seq.empty[(String, Int)].toDF("k", "v")
    val out = Ids.dense(df, Seq("k"), "id")
    assert(out.columns.head == "id" && out.count() == 0)
  }
}
