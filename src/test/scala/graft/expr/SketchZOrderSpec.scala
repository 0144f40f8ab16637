package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchZOrderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (1L to 1000L).toDF("k")

  test("bloom probe admits every inserted key (no false negatives)") {
    val inserted = keys.where($"k" % 3 === 0)
    val bloom = spark.sparkContext.broadcast(
      inserted.stat.bloomFilter("k", 400, 0.01))
    val admitted = keys.where(BloomMightContainLong($"k", bloom))
      .as[Long].collect().toSet
    val truth = inserted.as[Long].collect().toSet
    assert(truth.subsetOf(admitted))
    // and at 1% fpp over this range the superset is close to the truth
    assert(admitted.size <= truth.size + 50)
  }

  test("CMS estimate upper-bounds the true count") {
    val rows = (1 to 5000).map(i => (i % 100).toLong).toDF("k")
    val cms = spark.sparkContext.broadcast(
      rows.stat.countMinSketch(col("k"), 0.001, 0.999, 7))
    val est = rows.select($"k", CmsEstimateLong($"k", cms).as("e"))
      .groupBy("k").agg(max("e").as("e"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect()
    est.foreach { case (_, e, c) => assert(e >= c) }
  }

  test("bloom sizing is capped at an inflated key count") {
    import graft.ops.RuntimeFilters.{boundedBloomItems, MaxBloomKeys}
    // 3 billion qualifying keys (the 100 TB shape) must not size the filter:
    // the builder sees the cap, so bitSize is that of a MaxBloomKeys filter
    assert(boundedBloomItems(3L * 1000 * 1000 * 1000) == MaxBloomKeys)
    assert(boundedBloomItems(0L) == 1L)
    assert(boundedBloomItems(12345L) == 12345L)
    val capped = org.apache.spark.util.sketch.BloomFilter
      .create(boundedBloomItems(3L * 1000 * 1000 * 1000), 0.01)
    val atCap = org.apache.spark.util.sketch.BloomFilter
      .create(MaxBloomKeys, 0.01)
    assert(capped.bitSize() == atCap.bitSize())
    // ~4.6 MB — broadcast-sized, never data-sized
    assert(capped.bitSize() / 8 < 6L * 1000 * 1000)
  }

  /** Reference Morton interleave, written independently of the expression. */
  private def zRef(x: Long, y: Long): Long = {
    def bits(v: Long): Seq[Long] =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i))
    bits(x & 0xFFFF).sum | (bits(y & 0xFFFF).sum << 1)
  }

  test("ZOrder2 matches the bit-by-bit reference on a value grid") {
    val pts = for (x <- Seq(0L, 1L, 2L, 255L, 256L, 65535L, 70000L);
                   y <- Seq(0L, 1L, 3L, 128L, 32767L, 65535L))
      yield (x, y)
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder2($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == zRef(x, y), s"($x,$y)") }
  }

  test("z-order layout clusters both dimensions better than row order") {
    import graft.ops.Layout
    // a 64x64 lattice visited in row-major order — the worst case for
    // 2-dim locality under the natural layout
    val grid = (0 until 4096).map(i => ((i % 64).toLong, (i / 64).toLong))
      .toDF("x", "y")
    val natural = Layout.bboxArea(grid.repartition(16), "x", "y")
    val zed = Layout.bboxArea(Layout.zorderBy(grid, "x", "y", 16), "x", "y")
    assert(zed < natural / 2,
      s"z-order area $zed not better than natural $natural")
  }
}
