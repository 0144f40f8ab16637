package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only access to SparkContext's private[spark] live SparkConf:
  * `SparkSession.Builder.getOrCreate` reads `spark.sql.extensions` from
  * THIS conf (not a `getConf` copy) when it builds a session object, so the
  * config-string extension spec must mutate it in place. */
object TestConfBridge {
  def set(sc: SparkContext, key: String, value: String): Unit =
    sc.conf.set(key, value)
  def remove(sc: SparkContext, key: String): Unit =
    sc.conf.remove(key)
}
