package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness: synthesizes an N× dataset from sf0.1 by key-shifted
  * self-union (orderkeys/event ids/doc ids shifted per copy so cardinalities
  * genuinely grow; dims stay fixed like real dimensions), then times a
  * representative query subset at 1× and N× to show the plans scale
  * near-linearly (documented in ARCHITECTURE.md).
  *
  *   sbt "runMain graft.ScaleProbe 8"
  */
object ScaleProbe {

  val probeQueries: Seq[String] = Seq(
    "q_user_order_log_v2", "q_d_calendar", "q_d_customer", "q_f_sales",
    "q_d_calendar_weeks", "q_new_customers_compact", "q_refunded_customers",
    "q_retention_compact", "q_dedup_exact", "q_dedup_minhash_pairs",
    "q_dedup_simhash", "q_dedup_simhash64_pairs", "q_dedup_clusters",
    "q_corpus_curated", "q_text_stats", "q_quality_score",
    "q_multimodal_meta",
    "q_sessionize", "q_sales_rolling_7d", "q_tfidf_top",
    "q_dedup_pairs_inc", "q_contamination", "q_repetition",
    // round-4/5 additions: sketches, grouping sets, rank marts, layout,
    // funnel, SCD2, as-of and the banded interval join
    "q_bloom_join", "q_heavy_hitters", "q_sales_cube", "q_sales_rollup",
    "q_sales_pivot", "q_top_items_per_city", "q_customer_deciles",
    "q_customer_cumrev", "q_zorder_key", "q_funnel", "q_d_customer_scd",
    "q_asof_latest_order", "q_ann_recall", "q_event_pairs",
    // round-5 additions: salted agg/join, passage dedup, PQ encode + ADC,
    // IVF-PQ composition, verified LSH pairs
    "q_priority_sales_salted", "q_brand_qty_salted", "q_dedup_passages",
    "q_passage_dup_ratio", "q_pq_codes", "q_pq_adc_topk", "q_ivfpq_topk",
    "q_dedup_pairs_verified", "q_corpus_stats",
    "q_dedup_clusters_verified",
    // round-6 additions: IVF-PQ recall monitor, sketch-quantile contract,
    // two-stage shortlist+rerank serving
    "q_ivfpq_recall", "q_profile_quantiles_sketch", "q_ivfpq_rerank",
    // round-7 additions: multi-probe payoff + ingest-drift monitor (the
    // latter is O(|Q|·N) exact ground truth BY DESIGN — a recall monitor
    // pays brute force on its query sample; the probe checks the constant)
    "q_ivf_probe_recall", "q_ivf_ingest_recall",
    // round-11: the remaining 49 queries — the probe now covers ALL of
    // SparkEntry.queries, so the "no query is super-linear" claim is
    // exhaustive rather than representative. Expected >N ratios are the
    // documented flat-scan/quadratic-by-construction baselines that
    // exist as exactness references beside their blocked/grained
    // production siblings: q_ann_cosine_topk[_fast] (brute force),
    // q_f_customer_retention (faithful period-only join, N6 quirk;
    // *_grain is the scale path), q_dedup_embedding (label-blocked
    // candidates grow quadratically within a label as copies share the
    // label set; the IVF/LSH siblings are the scale path).
    "q_ann_cosine_topk", "q_ann_cosine_topk_fast", "q_ann_ivf_assign",
    "q_ann_ivf_topk", "q_ann_ivf_topk_probe2", "q_ann_kmeans_assign",
    "q_bigram_freq", "q_corpus_curated_v2", "q_customer_research",
    "q_d_calendar_inc", "q_d_item", "q_dedup_clusters_fast",
    "q_dedup_embedding", "q_dedup_embedding_ivf", "q_dedup_embedding_lsh",
    "q_dedup_minhash_lsh", "q_dedup_minhash_pairs_guarded",
    "q_dedup_ngram_jaccard", "q_dedup_simhash64", "q_dedup_simhash_pairs",
    "q_doc_fingerprint", "q_event_type_stats", "q_f_customer_retention",
    "q_f_customer_retention_grain", "q_f_sales_inc", "q_f_sales_v2",
    "q_fk_audit", "q_histogram_totalprice", "q_lang_id", "q_lang_id_ngram",
    "q_multimodal_frames", "q_new_customers", "q_pii_scan", "q_price_log",
    "q_pricing_summary", "q_profile_orders", "q_profile_quantiles",
    "q_quantiles_by_flag", "q_refunded_customers_compact",
    "q_returned_customers", "q_returned_customers_compact",
    "q_sample_stratified", "q_shipping_priority", "q_split_train_val_test",
    "q_top_customers", "q_user_activity_log", "q_user_order_log",
    "q_user_order_log_inc", "q_word_freq",
    // round-11b additions: KMV distinct sketch, Markov transitions, BM25
    "q_kmv_users", "q_event_transitions", "q_bm25_top",
    // round-11c: basket mining, rolling actives, blocked fuzzy match,
    // sequence packing, rolling anomaly, SCD2 point-in-time
    "q_basket_pairs", "q_rolling_active_users", "q_fuzzy_part_pairs",
    "q_pack_sequences", "q_revenue_anomaly", "q_scd_pit",
    "q_triangle_stats", "q_vocab_coverage", "q_quality_pct_rank",
    "q_order_gaps", "q_rrf_fusion", "q_d_customer_scd_inc",
    "q_basket_components",
    // round-11f: JSON props extraction, cohort matrix, domain quota,
    // keep-best canonical, doc-length histogram, snapshot diff, PageRank
    "q_props_json", "q_cohort_retention", "q_domain_quota",
    "q_dedup_keep_best", "q_doclen_hist", "q_snapshot_diff", "q_pagerank",
    // round-11g: sketch calibration, degree distribution, revenue HHI,
    // one-scan DQ profile
    "q_minhash_est_err", "q_degree_dist", "q_revenue_hhi", "q_dq_profile",
    // round-11h: language confusion matrix, join-key skew report,
    // last-touch attribution, incremental cluster maintenance
    "q_lang_confusion", "q_skew_report", "q_attribution",
    "q_dedup_clusters_inc",
    // round-11i: consensus dedup tier, PMI collocations, mixture weights
    "q_dedup_consensus", "q_colloc_pmi", "q_mix_weights",
    // round-11j: bag dedup, deterministic shuffle, fertility, surprisal,
    // cross-source vocab overlap, telemetry debounce
    "q_dedup_bag", "q_shuffle_shards", "q_token_fertility",
    "q_unigram_logprob", "q_source_vocab_overlap", "q_event_debounce",
    // round-11k: MoM growth, event-rate hist, norm hist, char entropy,
    // neighbor Jaccard
    "q_sales_mom", "q_event_rate_hist", "q_emb_norm_hist",
    "q_char_entropy", "q_copurchase_jaccard",
    // round-11l: Q5 snowflake anchor, edit-distance dedup tier, dup-rate
    // attribution, packing fill factor
    "q_local_supplier_volume", "q_dedup_pairs_editdist",
    "q_dup_rate_by_source", "q_pack_efficiency",
    // round-11m: filtered ANN, IVF balance, band stats, token drift
    "q_ann_filtered_topk", "q_ivf_cell_balance",
    "q_minhash_band_stats", "q_token_freq_drift",
    // round-11n: prefix dedup, near-dup/contamination attribution,
    // hour-of-day seasonality
    "q_dedup_prefix", "q_near_dup_rate_by_source",
    "q_contam_rate_by_source", "q_events_hour_profile",
    // round-11o: showcase top-k, syndication overlap, label agreement
    "q_top_docs_per_source", "q_cross_source_dup_pairs",
    "q_ann_label_agreement",
    // round-12: containment tier, novelty, budget/curriculum/weighted
    // curation, bucketed packing, embedding health
    "q_minhash_containment", "q_ngram_novelty", "q_token_budget_select",
    "q_curriculum_order", "q_weighted_sample", "q_pack_buckets",
    "q_emb_dim_profile", "q_emb_anisotropy",
    // round-12b: calibration, jaccard hist, incremental novelty,
    // charset profile, label cohesion, user lifecycle
    "q_quality_dup_calibration", "q_jaccard_hist", "q_ngram_novelty_inc",
    "q_charset_profile", "q_emb_label_cohesion", "q_user_lifecycle",
    // round-12c: PQ distortion, cluster sizes, pair degrees, mix epochs
    "q_pq_distortion", "q_dedup_cluster_sizes", "q_pair_degree_dist",
    "q_mix_epochs",
    // round-12d: Benford profile, IQR fences, BFS hops, frame dedup,
    // bigram surprisal, lexical diversity, token Gini, cluster purity
    "q_benford_totalprice", "q_price_outliers_iqr", "q_graph_hops",
    "q_multimodal_frame_dedup", "q_bigram_surprisal", "q_lexical_diversity",
    "q_token_gini", "q_cluster_purity",
    // round-12e: split leakage, threshold sweep, length trim, bigram
    // diversity, session concurrency
    "q_split_leakage", "q_dedup_threshold_sweep", "q_length_trim",
    "q_source_bigram_diversity", "q_session_concurrency",
    // round-12f: Q4 semi-join, Q13 outer-join distribution, RFM cube
    "q_late_orders", "q_cust_order_dist", "q_customer_rfm",
    // round-12g: contrastive keywords, ANN MRR, funnel latency
    "q_contrastive_terms", "q_ann_mrr", "q_funnel_time",
    // round-12h additions: the TPC-H classic shapes (Q7/Q8/Q10/Q14/Q18/
    // Q22) + hapax vocabulary tail + per-user event-type entropy
    "q_q7_volume", "q_q8_market_share", "q_q10_returned_top",
    "q_q14_promo_share", "q_q18_bulk_orders", "q_q22_idle_balance",
    "q_hapax_rate", "q_event_entropy",
    // round-12i additions: Q6/Q15/Q17 classics + curation funnel,
    // length-shift card and kNN mutuality monitor
    "q_q6_forecast", "q_q15_top_supplier", "q_q17_small_qty",
    "q_curation_funnel", "q_dedup_length_shift", "q_knn_mutual",
    // round-12j additions: asymmetric grouping sets, SCD churn rate,
    // session-duration/media-size histograms, principal-direction dims
    "q_sales_grouping_sets", "q_scd_change_rate",
    "q_session_duration_hist", "q_multimodal_size_hist",
    "q_emb_principal_dims",
    // round-12k additions: corpus-health statistics (Zipf fit, KS
    // source drift, length/token moments, SimHash bit balance,
    // boilerplate shingles), mutual-kNN components, cohort LTV, Q9
    // profit shape, event burstiness + Markov surprisal
    "q_zipf_fit", "q_ks_source_drift", "q_length_token_moments",
    "q_simhash_bit_balance", "q_boilerplate_shingles", "q_knn_components",
    "q_cohort_ltv", "q_q9_profit", "q_user_burstiness",
    "q_event_seq_surprisal",
    // round-12l additions: stopword profile, dup token inflation,
    // day-of-week seasonality, monthly customer-revenue Gini
    "q_stopword_profile", "q_dup_inflation", "q_sales_dow_profile",
    "q_customer_gini_monthly",
    // round-12m additions: token byte-length histogram, shard-size
    // skew, order backlog curve, price/qty moments, weekly event-value
    // drift card
    "q_token_len_hist", "q_shard_skew_profile", "q_order_backlog",
    "q_price_qty_moments", "q_event_value_weekly",
    // round-13 additions: the remaining TPC-H classic shapes
    "q_q2_min_cost_supp", "q_q11_important_share", "q_q12_priority_ship",
    "q_q16_part_supplier_cnt", "q_q19_disc_revenue",
    "q_q20_dominant_supplier", "q_q21_late_only_supplier",
    "q_ann_range_count", "q_readability", "q_token_doc_freq",
    "q_heaps_law", "q_simhash_precision_curve", "q_dup_lang_pairs",
    "q_source_quality_matrix", "q_supplier_leadtime",
    "q_brand_price_drift",
    "q_degree_assortativity", "q_cos_score_hist",
    "q_value_sigma_outliers", "q_partition_planner",
    "q_dedup_pairs_cosine", "q_lsh_recall_sampled",
    "q_multimodal_near_dup")

  def makeBig(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    // the embedding rotation below is the identity at i = 64 (reintroducing
    // the clone-collapse degeneracy) and slice() underflows past it
    require(copies <= 64, s"makeBig supports at most 64 copies, got $copies")
    def shifted(name: String, shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val big = (0 until copies).map(i => shift(base, i)).reduce(_ unionAll _)
      big.write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    val K = 100000000L
    shifted("lineitem", (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * K)))
    shifted("orders", (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * K)))
    // events: shift ids AND time (raw nanos + i·40 days) so each copy is a
    // disjoint collection window — keeps event DENSITY constant, the way a
    // bigger real corpus grows. Without the time shift every copy lands in
    // the same month and the proximity/sessionization queries would measure
    // a quadratic OUTPUT blow-up (8 copies in one hour bucket ⇒ 64× pairs),
    // not the engine's scaling.
    shifted("events", (df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * K))
        .withColumn("ts",
          if (df.schema("ts").dataType ==
              org.apache.spark.sql.types.LongType)
            col("ts") + lit(i * 40L * 86400L * 1000000000L) // raw nanos
          else col("ts") + expr(s"INTERVAL '${i * 40}' DAY")))
    // documents/embeddings: copies must be DISTINCT CONTENT, same reason as
    // the event time-shift — a self-union of identical docs makes every doc
    // an 8-way exact clone, so candidate PAIRS grow 64× (quadratic per dup
    // group) and identical centroid clones collapse the IVF cells; the
    // probe would measure a degenerate corpus, not the plans. Suffixing
    // every word per copy keeps each copy's INTERNAL dup structure exactly
    // (dup density constant, like a real corpus growing) while no shingle
    // collides across copies; rotating embedding dimensions keeps norms and
    // pairwise geometry within a copy while pointing copies in genuinely
    // different directions.
    shifted("documents", (df, i) =>
      df.withColumn("doc_id", col("doc_id") + lit(i * K))
        .withColumn("text",
          if (i == 0) col("text")
          else expr(s"array_join(transform(split(text, ' '), " +
                    s"x -> concat(x, '_c$i')), ' ')")))
    shifted("embeddings", (df, i) =>
      df.withColumn("vec_id", col("vec_id") + lit(i * K))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else expr(s"concat(slice(embedding, ${i + 1}, ${64 - i}), " +
                    s"slice(embedding, 1, $i))")))
    for (t <- Seq("customer", "part", "nation", "region", "supplier"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(8)
    // optional subset: `ScaleProbe 64 only q_a q_b ...` probes just those
    // queries (skips the warehouse/guard/cust phases) — the fast path for
    // a deeper-tier (e.g. 64x) run over the heaviest plans or for giving
    // late-added queries their queries_index.json probe row
    val only: Set[String] = {
      val i = args.indexOf("only")
      if (i >= 0) args.drop(i + 1).toSet else Set.empty
    }
    val src = "/root/testdata/sf0.1"
    val dst = s"/tmp/graft_sf_x$copies"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // events.parquet has shipped as TIMESTAMP(NANOS) and as micros-NTZ;
    // nanosAsLong lets the NANOS vintage load (as raw longs), and
    // Feeds.normalizeEventTs converts either representation identically
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if (args.contains("cust-only")) { // fast path: just the custkey probe
      custProbe(spark, src, copies)
      spark.stop()
      return
    }
    makeBig(spark, src, dst, copies)
    println(s"[scale] built ${copies}x dataset at $dst")

    def runAll(dir: String): Map[String, Double] = {
      // drop BOTH cache layers so every timed pass recomputes from parquet:
      // CacheManager data (persist frames) and ALL memo maps of the WHOLE
      // session — not just this dir's (the other dir's leftover frames
      // would otherwise sit in the block manager and evict this pass's
      // staging cache mid-run) — 1× and N× then pay identical first-touch
      // costs and the ratio measures the plans, not cache luck
      spark.catalog.clearCache()
      Caches.invalidateAll(spark)
      probeQueries
        .filter(q => only.isEmpty || only(q))
        .map { q =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, dir).count()
          q -> (System.nanoTime() - t0) / 1e9
        }.toMap
    }
    runAll(src) // warm code paths
    val t1 = runAll(src)
    val tN = runAll(dst)
    println(f"[scale] ${"query"}%-28s 1x(s)   ${copies}x(s)  ratio")
    probeQueries.filter(q => only.isEmpty || only(q)).foreach { q =>
      println(f"[scale] $q%-28s ${t1(q)}%6.2f ${tN(q)}%7.2f ${tN(q) / t1(q)}%6.1f")
    }
    val s1 = t1.values.sum; val sN = tN.values.sum
    println(f"[scale] TOTAL 1x=$s1%.1fs ${copies}x=$sN%.1fs ratio=${sN / s1}%.1f (ideal ≤ $copies)")
    if (only.nonEmpty) { spark.stop(); return } // subset run: queries only

    // ---- warehouse series: materialize + w_* read-backs at 1x and Nx ----
    // (exactly where the r5 small-file regression hid: the pipeline probes
    // never touched the partitioned warehouse read path)
    def runWh(dir: String): (Double, Map[String, Double]) = {
      def barrier(): Unit = {
        spark.catalog.clearCache()
        Caches.invalidateAll(spark)
      }
      barrier()
      val rootPath = java.nio.file.Files.createTempDirectory("graft_swh")
      val root = rootPath.toString
      val t0 = System.nanoTime()
      catalog.PipelineRunner.run(spark, dir, root)
      val mat = (System.nanoTime() - t0) / 1e9
      barrier() // read-backs measure the warehouse parquet alone
      val times = Bench.warehouseQueries(spark, root).map { case (n, fn) =>
        val s = System.nanoTime()
        fn().count()
        n -> (System.nanoTime() - s) / 1e9
      }.toMap
      // daily cycle against this history: the SAME fixed-size day (one 1x
      // week of orders' lineitems, src-joined so the day's content is
      // byte-identical at 1x and Nx) drained + partition-pruned-merged +
      // scope-compacted into the materialized 80-month fact. The claim
      // this pins: the cycle pays the day's rows + the TOUCHED months
      // (1/80th of history at this layout), never a history scan — so
      // its Nx ratio tracks the touched-month growth, far below the
      // full-scan read-backs' ratio.
      val day = spark.read.parquet(s"$src/lineitem.parquet").join(
        spark.read.parquet(s"$src/orders.parquet")
          .where(col("o_orderdate").between("1997-03-01", "1997-03-07"))
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      val watch = s"$root/.dc_watch"
      day.coalesce(1).write.mode("overwrite").parquet(watch)
      val tdc = System.nanoTime()
      streaming.IncrementStream.runDailyCycle(spark, src, watch,
        s"$root/.dc_sink", s"$root/.dc_ckpt",
        new catalog.Warehouse(spark, root), "staging", "user_order_log_v2")
      val dc = (System.nanoTime() - tdc) / 1e9
      Bench.deleteRecursively(rootPath)
      (mat, times + ("w_daily_cycle" -> dc))
    }
    val (m1, w1) = runWh(src)
    val (mN, wN) = runWh(dst)
    println(f"[scale] ${"warehouse"}%-28s 1x(s)   ${copies}x(s)  ratio")
    println(f"[scale] ${"materialize"}%-28s $m1%6.2f $mN%7.2f ${mN / m1}%6.1f")
    w1.keys.toSeq.sorted.foreach { q =>
      println(f"[scale] $q%-28s ${w1(q)}%6.2f ${wN(q)}%7.2f ${wN(q) / w1(q)}%6.1f")
    }
    val ws1 = w1.values.sum; val wsN = wN.values.sum
    println(f"[scale] WH TOTAL 1x=$ws1%.1fs ${copies}x=$wsN%.1fs ratio=${wsN / ws1}%.1f (ideal ≤ $copies)")

    guardProbe(spark, src, dst, copies)
    custProbe(spark, src, copies)
    spark.stop()
  }

  /** Custkey-shifted probe variant (r12 verdict task 4). The default
    * builder shifts o_orderkey but NOT o_custkey, so every copy lands in
    * the same per-customer partitions: order histories genuinely deepen
    * N× and q_order_gaps' per-customer sort pays the extra log factor
    * (cross-run min-ratio 9.9 at 8× in r12 — adjudicated, not a plan
    * defect). Real corpus growth adds CUSTOMERS at roughly constant
    * history depth; this variant shifts o_custkey per copy exactly like
    * the doc/event keys, keeping per-group depth constant, and measures
    * q_order_gaps there — pinning the "linear at real growth" claim.
    * Only the orders table is synthesized (the customer dim is copied
    * unshifted by the main builder, so custkey JOINS would miss by
    * construction — q_order_gaps reads orders alone). */
  def custProbe(spark: SparkSession, src: String, copies: Int): Unit = {
    val dstCust = s"/tmp/graft_sf_cust_x$copies"
    val K = 100000000L
    val base = spark.read.parquet(s"$src/orders.parquet")
    (0 until copies)
      .map(i => base
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * K))
        .withColumn("o_custkey", col("o_custkey") + lit(i * K)))
      .reduce(_ unionAll _)
      .write.mode("overwrite").parquet(s"$dstCust/orders.parquet")
    def time(dir: String): Double = {
      spark.catalog.clearCache()
      Caches.invalidateAll(spark)
      val t0 = System.nanoTime()
      SparkEntry.queries("q_order_gaps")(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    time(src) // warm code paths
    val t1 = time(src)
    val tN = time(dstCust)
    println(f"[scale-cust] q_order_gaps (o_custkey shifted) 1x=$t1%.2fs " +
      f"${copies}x=$tN%.2fs ratio=${tN / t1}%.1f (ideal ≤ $copies; " +
      "constant per-customer depth)")
  }

  /** Measured (not asserted) payoff of the giant-bucket star guard: seed
    * 1% of docs with one identical boilerplate string — the degenerate
    * bucket a boilerplate-heavy web corpus produces — and count/time the
    * guarded (maxBucket=256) vs dense (guard off) candidate lists, plus
    * the edit-distance verify tier composed on each. The boilerplate
    * bucket holds B docs (B grows linearly with corpus copies), so dense
    * candidates grow B²/2 while star pairing emits B-1: the dense/guarded
    * pair ratio at Nx vs 1x is the quadratic blow-up the guard removes,
    * and the verify timings show the O(len²) Levenshtein cost that would
    * ride on it. Results cited in ARCHITECTURE.md §giant-bucket guard. */
  def guardProbe(spark: SparkSession, src: String, dst: String,
                 copies: Int): Unit = {
    val boiler = "all rights reserved terms of service privacy policy " +
      "cookie notice subscribe to our newsletter contact us about"
    def seeded(dir: String): DataFrame =
      ops.TextOps.withWords(ops.TextOps.normalize(
        spark.read.parquet(s"$dir/documents.parquet")
          .withColumn("text",
            when(col("doc_id") % 100 === 0, lit(boiler))
              .otherwise(col("text")))))
    def run(tag: String, dir: String): Unit = {
      val bands = ops.Dedup.minhashBandsFastOf(seeded(dir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bands.count()
      val docsNorm = seeded(dir).select("doc_id", "norm")
      def timed(pairs: DataFrame): (Long, Double, Double) = {
        val t0 = System.nanoTime()
        val n = pairs.persist().count()
        val tp = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        ops.Dedup.minhashPairsEditVerifiedOf(pairs, docsNorm).count()
        val tv = (System.nanoTime() - t1) / 1e9
        pairs.unpersist()
        (n, tp, tv)
      }
      val (ng, tg, vg) = timed(ops.Dedup.minhashPairsOf(bands, 256))
      // denseGate off: this probe MEASURES the dense blowup the gate exists
      // to prevent — the seeded boilerplate bucket must be allowed to run
      val (nd, td, vd) = timed(
        ops.Dedup.minhashPairsOf(bands, Int.MaxValue, Int.MaxValue))
      bands.unpersist()
      println(f"[guard] $tag%-4s guarded pairs=$ng%9d (${tg}%6.2fs, " +
        f"editdist ${vg}%6.2fs)  dense pairs=$nd%9d (${td}%6.2fs, " +
        f"editdist ${vd}%6.2fs)  dense/guarded=${nd.toDouble / ng}%6.1fx")
    }
    run("1x", src)
    run(s"${copies}x", dst)
  }
}
