package graft.expr

import graft.SparkSpec
import graft.ops.{Dedup, TextOps}

class MinHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator signature equals the expression-pipeline signature") {
    val docs = TextOps.normalize(Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "short doc"))
      .toDF("doc_id", "text"))
    val shingles = TextOps.shinglesOf(TextOps.withWords(docs))

    // expression pipeline (what the oracle checks)
    val viaExpr = Dedup.minhashOf(shingles)
      .as[(Long, Int, String)].collect()
      .groupBy(_._1)
      .map { case (d, rows) => d -> rows.sortBy(_._2).map(_._3).toSeq }

    // typed Aggregator over the same shingles
    val viaAgg = shingles.as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAgg.toColumn.name("sig"))
      .collect()
      .map { case (d, sig) => d -> sig.toSeq }.toMap

    assert(viaExpr == viaAgg)
  }

  test("merge is order-independent (partial aggregation safe)") {
    val a = MinHashAgg.reduce(MinHashAgg.zero, "x y z")
    val b = MinHashAgg.reduce(MinHashAgg.zero, "p q r")
    val m1 = MinHashAgg.merge(a.clone(), b.clone()).toSeq
    val m2 = MinHashAgg.merge(b.clone(), a.clone()).toSeq
    assert(m1 == m2)
  }
}
