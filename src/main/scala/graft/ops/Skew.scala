package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / prompt: "salting for skew").
  *
  * AQE's skew-join splitting handles most cases at runtime; these are the
  * explicit, deterministic forms for when the skew is known a priori
  * (hot keys in a 100 TB fact) or when AQE's thresholds don't trigger.
  * Salts are derived with `pmod(hash(...))` — deterministic per row, no RNG.
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt) — spreading a hot key over `nSalts` reducers — then final
    * aggregate on key. Semantically identical to a direct groupBy-sum for
    * any decomposable aggregate. */
  def saltedSum(df: DataFrame, keyCol: String, valCol: String,
                saltSource: Column, nSalts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as(s"sum_$valCol"))

  /** Skew-safe equi-join of a big (skewed) side against a small side:
    * the big side gets a deterministic salt in [0, nSalts); the small side
    * is replicated once per salt value; the join key becomes (key, salt) —
    * a hot key's rows land on `nSalts` different reducers instead of one.
    * Output equals the plain inner join (row multiset). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSource: Column, nSalts: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
    val replicated = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${nSalts - 1})")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
