package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation flow a real LLM-data user runs — the
  * composition of the north-star operators into one materializable query
  * (normalize → exact-dedup collapse → MinHash near-dup clusters → keeper
  * selection → quality filter → deterministic train/val/test split):
  *
  *   keepers = cluster representatives (doc_id == cluster, i.e. the min
  *   doc_id of each near-dup component), annotated with their exact-dup
  *   group size, quality score and split assignment; rows below the
  *   quality floor are dropped.
  *
  * The exact-dedup stage is PROVABLY subsumed by the cluster stage —
  * exact duplicates share every shingle, hence every MinHash signature and
  * band bucket, so they always land in one cluster and the cluster's min
  * doc_id is also its exact group's keeper; the inner join on
  * `keeper_doc_id` therefore never drops a representative, and surfaces
  * each keeper's exact-dup multiplicity (`n_dups`) in the output.
  *
  * Plan shape at scale: the cluster labels come from the memoized guarded
  * pair graph ([[Dedup.minhashPairs]] — bucket-collision candidates only,
  * giant buckets degrade linearly), so this query REUSES the persisted
  * bands/pairs work shared with the dedup queries; everything downstream
  * is hash equi-joins on doc_id plus map-side scoring/splitting — no new
  * shuffle structure beyond the joins, all keyed on the same column.
  */
object Corpus {

  /** Quality floor for curated output (see DocsOracleSql `corpus_curated`
    * — the oracle uses the identical literal). */
  val qualityFloor = 0.5

  def curatedOf(docsNorm: DataFrame, clusters: DataFrame,
                quality: DataFrame, exact: DataFrame,
                split: DataFrame): DataFrame =
    clusters.where(col("doc_id") === col("cluster"))
      .select("doc_id")
      .join(docsNorm.select("doc_id", "lang"), "doc_id")
      .join(quality, "doc_id")
      .where(col("quality") >= qualityFloor)
      .join(exact.select(col("keeper_doc_id").as("doc_id"), col("n_dups")),
            "doc_id")
      .join(split.select("doc_id", "split"), "doc_id")
      .select("doc_id", "lang", "quality", "n_dups", "split")

  def curated(spark: SparkSession, dir: String): DataFrame =
    curatedOf(
      TextOps.docs(spark, dir),
      Dedup.clusters(spark, dir),
      TextOps.qualityScore(spark, dir),
      Dedup.exact(spark, dir),
      Sampling.trainValTestSplit(spark, dir))
}
