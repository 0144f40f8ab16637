package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12c operators: PQ distortion, cluster-size histogram,
  * pair-degree histogram, mixture epochs. */
class Round12cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pq distortion: exact integer sums and decimal-safe ppm") {
    // fake codes frame: vec 0 has d2 = 3+1 over two subspaces, vec 1 = 0
    val codes = Seq((0L, 0L, 7L, 3L), (0L, 1L, 2L, 1L), (1L, 0L, 7L, 0L),
                    (1L, 1L, 2L, 0L))
      .toDF("vec_id", "m", "code", "d2")
    val quant = Seq((0L, 5, 100L), (1L, 5, 60L))
      .toDF("vec_id", "label", "n2")
    val r = Vectors.pqDistortionOf(codes, quant)
      .as[(Long, Long, Long, Long, Long)].head()
    // label 5: n=2, sum_d2=4, sum_norm2=160, ppm = 4e6/160 = 25000
    assert(r == ((5L, 2L, 4L, 160L, 25000L)))
  }

  test("cluster sizes histogram: power-of-2 buckets, yield readable") {
    // clusters: {0,1,2} (sz 3 -> bucket 1), {3} {4} (sz 1 -> bucket 0)
    val cl = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 4L))
      .toDF("doc_id", "cluster")
    val r = Dedup.clusterSizesHistOf(cl)
      .as[(Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(r(1L) == ((1L, 3L, 3L)))
    assert(r(0L) == ((2L, 2L, 1L)))
  }

  test("pair degree histogram counts both pair ends") {
    // pairs: (0,1),(0,2),(0,3) -> deg(0)=3 bucket 1; deg(1..3)=1 bucket 0
    val p = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("doc_a", "doc_b")
    val r = Dedup.pairDegreeDistOf(p)
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(1L) == ((1L, 3L)))
    assert(r(0L) == ((3L, 3L)))
  }

  test("mix epochs: rare sources repeat, dominant sources thin") {
    // two sources 100 vs 1: share 990099/9900 ppm, sqrt weights 10 vs 1
    val docs = (0L until 100L).map(i => (i, "big")) :+ (100L, "small")
    val w = Corpus.mixWeightsOf(
      docs.toDF("doc_id", "source").withColumn("norm", lit("x")))
    val r = Corpus.mixEpochsOf(w)
      .select("source", "epochs_ppm").as[(String, Long)].collect().toMap
    // big: w=909090/share=990099 -> <1e6 (thinned)
    // small: w=90909/share=9900 -> ~9.18e6 (repeated ~9x)
    assert(r("big") < 1000000L && r("small") > 9000000L)
  }
}
