package graft

import graft.catalog.{PipelineRunner, Warehouse}
import graft.etl.{Pipeline, Retention, Sales}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-run benchmark. Prints TWO JSON lines to stdout:
  *
  *  1. the FULL line — canonical query names, 3-decimal seconds, separate
  *     `cold`/`warm` per-query maps (first-touch vs steady-state) for both
  *     series, warehouse detail, errors. Also written to `BENCH_full.json`.
  *  2. the COMPACT driver line, printed LAST — the driver captures only the
  *     final 2000 characters of stdout (measured from the r3/r4 artifacts:
  *     `tail` is exactly 2000 chars and ends with sbt's `[success] …` line,
  *     ~80 chars), so this line must fit entirely inside ~1900 bytes or the
  *     artifact's `parsed` field is null. With 85 canonical names at
  *     2-decimal precision the map alone is ~2.2 KB, so the compact line
  *     applies [[Bench.shortKey]] — a mechanical, collision-checked token
  *     substitution (q_→'', dedup_→dd_, …) documented in ARCHITECTURE.md;
  *     canonical names live in line 1 / BENCH_full.json.
  *
  * Two series:
  *  - `queries` (pipeline mode): every SparkEntry query timed end-to-end,
  *    twice. Pass 1 (`cold`) starts from an empty JVM: queries that first
  *    touch a shared memoized subplan (the order feed, shingles, bands,
  *    cluster labels) pay its build; pass 2 (`warm`) is the steady state.
  *    The single `queries` map reports min(cold, warm) — comparable to the
  *    r1-r4 series, which also reported min-of-two-passes.
  *  - `warehouse` mode: PipelineRunner materializes staging+marts to
  *    parquet ONCE (timed as `materialize_sec`; it reuses the shared
  *    Pipeline's cached staging frames — the honest cost of materializing
  *    after the query series, not a cold rebuild), then EVERY in-session
  *    cache is invalidated (Pipeline/Dedup/TextOps memo maps +
  *    `catalog.clearCache()`) so the read-back queries run against the
  *    warehouse parquet with no cross-series cache pressure or flattery —
  *    r4's w_* read-back drag was exactly this interference.
  *
  * Failures are recorded explicitly: a crashing query reports -1 and its
  * name lands in `errors` — it can neither inflate nor deflate the total.
  */
object Bench {

  /** Mechanical key compression for the compact driver line (stdout tail
    * window is 2000 chars). Applied left-to-right; collision-freedom over
    * SparkEntry.queries ∪ warehouse names is asserted in BenchLineSpec. */
  private[graft] val keyTokens: Seq[(String, String)] = Seq(
    "q_" -> "", "w_" -> "", "dedup_" -> "dd_", "minhash" -> "mh",
    "simhash" -> "sh", "customers" -> "custs", "customer" -> "cust",
    "calendar" -> "cal", "retention" -> "ret", "compact" -> "cmp",
    "embedding" -> "emb", "corpus_curated" -> "corpus_cur",
    "user_order_log" -> "uol", "user_activity_log" -> "ual",
    "multimodal" -> "mm", "split_train_val_test" -> "split",
    "quantiles" -> "qnt", "fingerprint" -> "fp", "clusters" -> "cls",
    "heavy_hitters" -> "hh", "histogram" -> "hist",
    "sessionize" -> "sess", "stratified" -> "strat",
    // round 5: the query set grew to 95 — tighter tokens keep the
    // worst-case line (every value "123.45") under ~1850 B (1841 B
    // measured; BenchLineSpec pins the <1900 budget)
    "sales" -> "sl", "pairs" -> "prs", "returned" -> "retd",
    "refunded" -> "refd", "guarded" -> "grd", "contamination" -> "contam",
    "repetition" -> "rept", "cosine" -> "cos", "kmeans" -> "km",
    "assign" -> "asn", "totalprice" -> "tp", "profile" -> "prf",
    "shipping" -> "ship", "priority" -> "prio", "salted" -> "slt",
    "passages" -> "psgs", "passage" -> "psg", "deciles" -> "dec",
    "quality" -> "qual", "jaccard" -> "jac", "research" -> "rsch",
    "rolling" -> "roll", "summary" -> "sum", "stats" -> "st",
    "weeks" -> "wks", "sample_" -> "smp_", "latest_order" -> "lo",
    "topk" -> "tk", "probe2" -> "p2", "bigram" -> "bg",
    "items_per_city" -> "ipc", "pricing" -> "prc", "zorder" -> "zo",
    "bloom" -> "bl", "recall" -> "rcl", "frames" -> "frm",
    "exact" -> "ex", "ngram" -> "ng", "audit" -> "aud",
    "funnel" -> "fnl", "custs_cmp" -> "cc",
    // round 6: 99 queries — recover headroom for the three new keys.
    // (No "ivfpq" token: the leading "q_"->"" replacement already eats the
    // embedded q_ of every ivfpq_* name — they short to ivfptk/ivfprcl/
    // ivfprr via the suffix tokens.)
    "sketch" -> "sk", "verified" -> "ver",
    "grain" -> "gr", "ann_" -> "a_", "rerank" -> "rr",
    "event_type" -> "evt")

  private[graft] def shortKey(name: String): String =
    keyTokens.foldLeft(name) { case (s, (from, to)) => s.replace(from, to) }

  /** Recursive local temp-dir cleanup (shared with ScaleProbe's warehouse
    * probe — both materialize a throwaway warehouse per run). */
  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  /** 2-decimal, trailing-zero-stripped JSON number ("0.08", "1.5", "32"). */
  private[graft] def r2(v: Double): String = {
    val s = new java.math.BigDecimal(v)
      .setScale(2, java.math.RoundingMode.HALF_UP).toPlainString
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').reverse
      .stripSuffix(".")
    else s
  }

  private def r3(v: Double): String =
    new java.math.BigDecimal(v).setScale(3, java.math.RoundingMode.HALF_UP)
      .toPlainString

  private def jmap(m: Seq[(String, Double)], f: Double => String,
                   key: String => String = identity): String =
    m.map { case (k, v) => "\"" + key(k) + "\":" + f(v) }
      .mkString("{", ",", "}")

  /** Shared with ScaleProbe, which probes the same read-back series. */
  private[graft] def warehouseQueries(spark: SparkSession,
                               root: String): Seq[(String, () => DataFrame)] = {
    val wh = new Warehouse(spark, root)
    def v2 = wh.read("staging", "user_order_log_v2")
    def weeks = wh.read("mart", "d_calendar_weeks")
    def tagged = Retention.withPeriod(v2, weeks)
    Seq(
      "w_f_sales" -> (() =>
        Sales.fSales(wh.read("staging", "user_order_log"),
                     wh.read("mart", "d_calendar"))),
      "w_new_customers" -> (() => Retention.newCust(tagged, true)),
      "w_returned_customers" -> (() => Retention.returnedCust(tagged, true)),
      "w_refunded_customers" -> (() => Retention.refundedCust(tagged, true)),
      "w_retention_compact" -> (() =>
        Retention.retentionCompact(Retention.newCust(tagged, false),
          Retention.returnedCust(tagged, false),
          Retention.refundedCust(tagged, false))),
      "w_f_customer_retention_grain" -> (() =>
        Retention.fCustomerRetentionGrain(Retention.newCust(tagged, true),
          Retention.returnedCust(tagged, true),
          Retention.refundedCust(tagged, true))),
      // the pruned read path — one month of the 80-month fact through
      // readRange: lists/opens ~1/80th of the files the full-scan w_*
      // queries pay for, i.e. the payoff side of the month layout
      "w_uol_v2_month" -> (() =>
        wh.readRange("staging", "user_order_log_v2", Warehouse.PartCol,
                     "1997-01", "1997-01")
          .groupBy("status")
          .agg(org.apache.spark.sql.functions.sum("payment_amount")
            .as("amt"))))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: stderr noise is harmless to the driver's stdout tail
    // but keeps interactive runs readable
    spark.sparkContext.setLogLevel("ERROR")

    // warmup: scan + shuffle + codegen once, untimed
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()

    val errors = scala.collection.mutable.LinkedHashSet[String]()

    def time(fn: => Unit): (Double, Boolean) = {
      val t0 = System.nanoTime()
      try { fn; ((System.nanoTime() - t0) / 1e9, true) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] FAILED: ${e.getMessage}")
        ((System.nanoTime() - t0) / 1e9, false)
      }
    }

    /** Two passes, name-sorted: (cold, warm). Failures -> -1 + errors. */
    def series(qs: Seq[(String, () => DataFrame)], tag: String)
        : (Seq[(String, Double)], Seq[(String, Double)]) = {
      def pass(p: Int): Map[String, Double] = qs.map { case (name, fn) =>
        val (t, ok) = time { fn().count(); () }
        if (!ok) errors += s"$tag:$name:p$p"
        name -> (if (ok) t else -1.0)
      }.toMap
      val cold = pass(1)
      val warm = pass(2)
      val keys = qs.map(_._1).sorted
      (keys.map(k => k -> cold(k)), keys.map(k => k -> warm(k)))
    }

    def minMerge(cold: Seq[(String, Double)],
                 warm: Seq[(String, Double)]): Seq[(String, Double)] = {
      val w = warm.toMap
      cold.map { case (k, c) =>
        k -> (if (c < 0 || w(k) < 0) -1.0 else math.min(c, w(k)))
      }
    }

    def okSum(m: Seq[(String, Double)]): Double =
      m.map(_._2).filter(_ >= 0).sum

    val pipelineQs = SparkEntry.queries.toSeq.sortBy(_._1)
      .map { case (n, f) => n -> (() => f(spark, sfDir)) }
    val (pCold, pWarm) = series(pipelineQs, "pipeline")
    val pMin = minMerge(pCold, pWarm)

    val whRootPath = java.nio.file.Files.createTempDirectory("graft_bench_wh")
    val whRoot = whRootPath.toString
    val (matSec, wCold, wWarm) =
      try {
        val (sec, ok) = time { PipelineRunner.run(spark, sfDir, whRoot); () }
        if (!ok) errors += "warehouse:materialize"
        // Isolation barrier: the read-back series must measure the
        // warehouse parquet alone, not compete with (or borrow from) the
        // query series' persisted frames.
        Pipeline.invalidate(spark, sfDir)
        ops.Dedup.invalidate(spark, sfDir)
        ops.TextOps.invalidate(spark, sfDir)
        ops.Vectors.invalidate(spark, sfDir)
        spark.catalog.clearCache()
        if (ok) {
          val (c, w) = series(warehouseQueries(spark, whRoot), "warehouse")
          (sec, c, w)
        } else (sec, Nil, Nil)
      } finally { // don't leak a full warehouse copy per bench run
        deleteRecursively(whRootPath)
      }
    val wMin = minMerge(wCold, wWarm)

    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullLine =
      s"""{"metric":"total","value":${r3(okSum(pMin))},"unit":"sec",""" +
      s""""queries":${jmap(pMin, r3)},"sf":"$sfDir",""" +
      s""""cold":${jmap(pCold, r3)},"warm":${jmap(pWarm, r3)},""" +
      s""""warehouse":{"materialize_sec":${r3(matSec)},""" +
      s""""total":${r3(okSum(wMin))},"queries":${jmap(wMin, r3)},""" +
      s""""cold":${jmap(wCold, r3)},"warm":${jmap(wWarm, r3)}},""" +
      s""""errors":$errJson}"""
    // sf tag alone ("sf0.1"), not the full path: compact-line byte budget
    val sfTag = sfDir.split('/').last
    // warehouse per-query times live in the full line / BENCH_full.json
    // only: with them the compact line would overrun the tail window
    val compact =
      s"""{"metric":"total","value":${r2(okSum(pMin))},"unit":"sec",""" +
      s""""queries":${jmap(pMin, r2, shortKey)},"sf":"$sfTag",""" +
      s""""wh":{"mat":${r2(matSec)},"total":${r2(okSum(wMin))}}""" +
      (if (errors.isEmpty) "}" else s""","errors":$errJson}""")

    // the full line lands in a file the driver (or a human) can always
    // pick up whole, then both lines go to stdout — compact LAST so it
    // sits inside the driver's 2000-char tail window
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH_full.json: $e") }
    println(fullLine)
    println(compact)
    spark.stop()
  }
}
