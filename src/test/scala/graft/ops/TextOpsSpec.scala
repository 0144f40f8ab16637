package graft.ops

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = TextOps.normalize(Seq(
    (0L, "en", "The quick, brown fox is on the mat!"),
    (1L, "de", "der hund und die katze ist nicht da"))
    .toDF("doc_id", "lang", "text"))

  test("normalization lowercases, collapses whitespace, trims") {
    val n = docs.where($"doc_id" === 0L).select("norm").as[String].head()
    assert(n == "the quick, brown fox is on the mat!")
  }

  test("text stats: tokens, word tokens, punctuation, stopwords") {
    val s = TextOps.textStatsOf(TextOps.withWords(docs))
      .where($"doc_id" === 0L)
      .select("n_tokens", "n_word_tokens", "punct_cnt", "stop_cnt")
      .as[(Long, Long, Long, Long)].head()
    // tokens: the quick, brown fox is on the mat! -> 8 ws tokens
    // word tokens: 8; punct: ',' + '!' = 2; stop: the, is, on, the = 4
    assert(s == ((8L, 8L, 2L, 4L)))
  }

  test("quality score stays in [0,1]") {
    val q = TextOps.qualityScoreOf(TextOps.textStatsOf(TextOps.withWords(docs)))
      .select("quality").as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("langId picks the marker-dominant language") {
    val m = TextOps.langIdOf(TextOps.withWords(docs))
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(m(0L) == "en")
    assert(m(1L) == "de")
  }

  test("fingerprint: identical normalized docs get identical fingerprints") {
    val two = TextOps.normalize(Seq(
      (0L, "same text here okay"), (1L, "Same   text here okay"))
      .toDF("doc_id", "text"))
    val fp = TextOps.fingerprintOf(two,
      TextOps.shinglesOf(TextOps.withWords(two)))
      .select("md5_norm", "min_shingle_hash").as[(String, String)].collect()
    assert(fp.distinct.length == 1)
  }
}
