package graft.ops

import graft.etl.Feeds
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining over the order feed — the frequent
  * pairwise-itemset slice of an association-rules pipeline (training-data
  * curation uses the same shape for co-occurring n-grams / co-cited docs).
  *
  * Scale shape (the reason this is written as a key-equi self-join, not an
  * all-pairs product): the self-join shuffles BOTH sides on `l_orderkey` —
  * one exchange per side, then a co-partitioned sort-merge — and the
  * per-order fanout is bounded by basket size (TPC-H-ish orders hold ≤7
  * items ⇒ ≤21 pairs), so the pair stream is a small constant times the
  * input, never quadratic in |parts|. The support filter runs inside the
  * pair aggregation (partial map-side combine), and the per-part frequency
  * table joined for the lift denominators is dimension-sized → broadcast.
  * At 100 TB the only knob is basket-size skew: a pathological giant order
  * would need the same star-pair guard as Dedup's giant LSH buckets.
  */
object Basket {

  /** Distinct (order, part) pairs — basket semantics are set-based: a part
    * listed on two lines of one order counts once. */
  def itemsOf(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_partkey")).distinct()

  /** Co-occurring part pairs with support ≥ `minSupport`, plus lift
    * (= P(a,b) / (P(a)·P(b))) from exact integer counts; the single double
    * division at the end is the only floating-point op (bit-identical to
    * the DuckDB oracle's). */
  def partPairsOf(lineitem: DataFrame, minSupport: Int = 2): DataFrame = {
    // items feeds FIVE plan positions (both join sides, two lift
    // denominators, the order total) — persist so the scan+distinct runs
    // once (CacheManager dedupes the canonicalized subplan; the house
    // shared-subplan pattern, see Dedup.minhashPairsOf)
    val items = itemsOf(lineitem)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nOrders = items.select(countDistinct("l_orderkey").as("n_orders"))
    val freq = items.groupBy("l_partkey").agg(count(lit(1)).as("n"))

    val a = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("part_b"))
    val pairs = a.join(b, Seq("l_orderkey"))
      .where(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minSupport)

    pairs
      .join(broadcast(freq.select(col("l_partkey").as("part_a"), col("n").as("n_a"))), Seq("part_a"))
      .join(broadcast(freq.select(col("l_partkey").as("part_b"), col("n").as("n_b"))), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .select(
        col("part_a"), col("part_b"), col("n_both"), col("n_a"), col("n_b"),
        ((col("n_both") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  def partPairs(spark: SparkSession, dir: String): DataFrame =
    partPairsOf(Feeds.table(spark, dir, "lineitem"))
}
