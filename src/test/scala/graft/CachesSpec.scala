package graft

/** The session-teardown contract of [[Caches.invalidateAll]]: a retired
  * session's entries vanish from every memo registry (Pipeline, Dedup,
  * TextOps, Vectors) while other sessions' entries are untouched —
  * without this hook a long-lived multi-session JVM pins every retired
  * session's frames for its own lifetime (the r7 ADVICE finding). */
class CachesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("invalidateAll drops a retired session's entries and no others") {
    val s2 = spark.newSession() // shares the context, distinct memo keys
    // populate all four registries for s2 (plan construction only — the
    // memo maps fill at computeIfAbsent, no job needs to run)
    etl.Pipeline.of(s2, dir)
    ops.TextOps.shingles(s2, dir)
    ops.Dedup.minhashPairs(s2, dir)
    ops.Vectors.annCosineTopK(s2, dir)
    assert(etl.Pipeline.cacheSize(s2) == 1)
    assert(ops.TextOps.cacheSize(s2) == 1)
    assert(ops.Dedup.cacheSize(s2) >= 1)
    assert(ops.Vectors.cacheSize(s2) >= 1)

    // the MAIN session's entries (whatever other suites built) must
    // survive s2's teardown untouched
    val mainBefore = Caches.size(spark)
    Caches.invalidateAll(s2)
    assert(Caches.size(s2) == 0, "retired session still holds entries")
    assert(Caches.size(spark) == mainBefore,
      "teardown of one session touched another's entries")

    // idempotent: tearing down an already-clean session is a no-op
    Caches.invalidateAll(s2)
    assert(Caches.size(s2) == 0)

    // the registries still work after teardown: re-population re-memoizes
    etl.Pipeline.of(s2, dir)
    assert(etl.Pipeline.cacheSize(s2) == 1)
    Caches.invalidateAll(s2)
  }

  test("Ids.dense registers its sorted persist; invalidateAll drops it") {
    import spark.implicits._
    val before = Ids.persistedCount(spark)
    val ids = Ids.dense(Seq(3L, 1L, 2L).toDF("k"), Seq("k"), "id")
    assert(Ids.persistedCount(spark) == before + 1,
      "dense did not register its persisted sort frame")
    assert(ids.as[(Long, Long)].collect().toSeq.sorted ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    Caches.invalidateAll(spark)
    assert(Ids.persistedCount(spark) == 0,
      "teardown left dense-sort frames registered")
  }
}
