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

  test("tfidf: integer-log2 idf scores and per-doc ranks") {
    // N=4 docs; "apple" in 1 doc (ilog2(4/1)=2), "banana" in 2 (ilog2 1),
    // "cherry" in all 4 (ilog2 0)
    val d = TextOps.withWords(TextOps.normalize(Seq(
      (0L, "apple apple banana cherry"),
      (1L, "banana cherry"),
      (2L, "cherry"),
      (3L, "cherry"))
      .toDF("doc_id", "text")))
    val got = TextOps.tfidfTopOf(d, k = 3)
      .select("doc_id", "w", "tf", "df", "score", "rank")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got((0L, "apple")) == ((0L, "apple", 2L, 1L, 4L, 1L)))
    assert(got((0L, "banana")) == ((0L, "banana", 1L, 2L, 1L, 2L)))
    assert(got((0L, "cherry"))._5 == 0L) // ubiquitous term scores 0
    assert(got((1L, "banana"))._6 == 1L) // doc 1's top term
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
