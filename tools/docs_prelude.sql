WITH RECURSIVE
docs AS (
  SELECT doc_id, text, lang, source, n_chars,
         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm
  FROM documents),
docs_words AS (
  SELECT *, string_split(norm, ' ') AS words FROM docs),
words_flat AS (
  SELECT doc_id, unnest(words) AS w FROM docs_words),
words_dist AS (SELECT DISTINCT doc_id, w FROM words_flat),
docs_sh AS (
  SELECT doc_id, unnest(CASE WHEN len(words) >= 3
      THEN [words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]
            for i in range(0, len(words)-2)]
      ELSE [norm] END) AS shingle
  FROM docs_words),
docs_sh_d AS (SELECT DISTINCT doc_id, shingle FROM docs_sh),
sh_sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM docs_sh_d GROUP BY 1),
dedup_exact AS (
  SELECT md5(norm) AS fp, min(doc_id) AS keeper_doc_id,
         CAST(count(*) AS BIGINT) AS n_dups
  FROM docs GROUP BY 1),
minhash AS (
  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS sig
  FROM docs_sh_d, range(0, 8) t(seed)
  GROUP BY 1, 2),
minhash_bands AS (
  SELECT doc_id, CAST(seed // 2 AS BIGINT) AS band,
         md5(string_agg(sig, '|' ORDER BY seed)) AS band_hash
  FROM minhash GROUP BY 1, 2),
minhash_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM minhash_bands a JOIN minhash_bands b
    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
mh_bstats AS (
  SELECT band, band_hash, CAST(count(*) AS BIGINT) AS bsz, min(doc_id) AS bmin
  FROM minhash_bands GROUP BY 1, 2),
minhash_pairs_guarded AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM minhash_bands a
    JOIN minhash_bands b
      ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
    JOIN mh_bstats s ON s.band = a.band AND s.band_hash = a.band_hash
    WHERE s.bsz <= 256
    UNION ALL
    SELECT s.bmin AS doc_a, a.doc_id AS doc_b
    FROM minhash_bands a
    JOIN mh_bstats s ON s.band = a.band AND s.band_hash = a.band_hash
    WHERE s.bsz > 256 AND a.doc_id <> s.bmin) u),
sim_bits AS (
  SELECT doc_id, bit,
         sum(CASE WHEN ((strpos('0123456789abcdef',
                    substr(md5(w), 1 + CAST(bit // 4 AS INTEGER), 1)) - 1)
                   >> (bit % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM words_dist, range(0, 32) t(bit) GROUP BY 1, 2),
simhash AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(bit AS INTEGER)
                  ELSE 0 END) AS BIGINT) AS simhash
  FROM sim_bits GROUP BY 1),
sh_bands AS (
  SELECT doc_id, simhash, band, (simhash >> CAST(band * 8 AS INTEGER)) & 255 AS chunk
  FROM simhash, range(0, 4) t(band)),
simhash_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM sh_bands a JOIN sh_bands b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
sim_bits64 AS (
  SELECT doc_id, bit,
         sum(CASE WHEN ((strpos('0123456789abcdef',
                    substr(md5(w), 1 + CAST(bit // 4 AS INTEGER), 1)) - 1)
                   >> (bit % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM words_dist, range(0, 64) t(bit) GROUP BY 1, 2),
simhash64 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s <= 0 THEN CAST(0 AS BIGINT)
                  WHEN bit = 63 THEN CAST(-9223372036854775807 AS BIGINT) - CAST(1 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) << CAST(bit AS INTEGER) END) AS BIGINT) AS simhash64
  FROM sim_bits64 GROUP BY 1),
sh64_bands AS (
  SELECT doc_id, simhash64, band,
         (simhash64 >> CAST(band * 16 AS INTEGER)) & 65535 AS chunk
  FROM simhash64, range(0, 4) t(band)),
simhash64_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash64, b.simhash64)) AS BIGINT) AS hamming
  FROM sh64_bands a JOIN sh64_bands b
    ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash64, b.simhash64)) <= 3),
jacc_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.norm AS norm_a, b.norm AS norm_b
  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1 WHERE a.doc_id % 2 = 0),
jacc_inter AS (
  SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS i
  FROM jacc_pairs p
  JOIN docs_sh_d a ON a.doc_id = p.doc_a
  JOIN docs_sh_d b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2),
ngram_jaccard AS (
  SELECT p.doc_a, p.doc_b, COALESCE(i.i, 0) AS n_common,
         sa.n_sh + sb.n_sh - COALESCE(i.i, 0) AS n_union,
         CAST(COALESCE(i.i, 0) AS DOUBLE)
           / CAST(sa.n_sh + sb.n_sh - COALESCE(i.i, 0) AS DOUBLE) AS jaccard
  FROM jacc_pairs p
  LEFT JOIN jacc_inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
  JOIN sh_sizes sa ON sa.doc_id = p.doc_a
  JOIN sh_sizes sb ON sb.doc_id = p.doc_b),
stop_stats AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN w IN ('the','a','of','and','to','in','is','it',
                                  'for','on') THEN 1 ELSE 0 END) AS BIGINT) AS stop_cnt
  FROM words_flat GROUP BY 1),
text_stats AS (
  SELECT d.doc_id,
         CAST(length(d.norm) AS BIGINT) AS n_chars_norm,
         CAST(len(w.words) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(d.norm, '[a-z0-9]+')) AS BIGINT) AS n_word_tokens,
         CAST(length(d.norm)
              - length(regexp_replace(d.norm, '[.,;:!?]', '', 'g')) AS BIGINT) AS punct_cnt,
         s.stop_cnt
  FROM docs d JOIN docs_words w ON w.doc_id = d.doc_id
  JOIN stop_stats s ON s.doc_id = d.doc_id),
quality_score AS (
  SELECT doc_id,
         least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
         + (1.0 - least(CAST(punct_cnt AS DOUBLE) / CAST(n_chars_norm AS DOUBLE) * 5.0, 1.0)) * 0.3
         + least(CAST(stop_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 4.0, 1.0) * 0.2
           AS quality
  FROM text_stats),
lang_scores AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN w IN ('the','a','of','and','to','is') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
    CAST(sum(CASE WHEN w IN ('der','die','das','und','ist','nicht') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
    CAST(sum(CASE WHEN w IN ('le','la','les','et','est','dans') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
    CAST(sum(CASE WHEN w IN ('el','los','las','y','es','en') THEN 1 ELSE 0 END) AS BIGINT) AS s_es
  FROM words_flat GROUP BY 1),
lang_id AS (
  SELECT l.doc_id, s_en, s_de, s_fr, s_es,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS pred_lang,
         d.lang,
         (CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
               WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
               WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END) = d.lang AS correct
  FROM lang_scores l JOIN docs d ON d.doc_id = l.doc_id),
lang_id_ngram AS (
  SELECT doc_id, t_en, t_de, t_fr, t_es,
         CASE WHEN t_en >= t_de AND t_en >= t_fr AND t_en >= t_es THEN 'en'
              WHEN t_de >= t_fr AND t_de >= t_es THEN 'de'
              WHEN t_fr >= t_es THEN 'fr' ELSE 'es' END AS pred_lang,
         lang,
         (CASE WHEN t_en >= t_de AND t_en >= t_fr AND t_en >= t_es THEN 'en'
               WHEN t_de >= t_fr AND t_de >= t_es THEN 'de'
               WHEN t_fr >= t_es THEN 'fr' ELSE 'es' END) = lang AS correct
  FROM (SELECT doc_id, lang,
          CAST(len(regexp_extract_all(norm, '(the|and|ing|ion)')) AS BIGINT) AS t_en,
          CAST(len(regexp_extract_all(norm, '(der|sch|ein|ich)')) AS BIGINT) AS t_de,
          CAST(len(regexp_extract_all(norm, '(les|ent|des|une)')) AS BIGINT) AS t_fr,
          CAST(len(regexp_extract_all(norm, '(los|ado|una|ción)')) AS BIGINT) AS t_es
        FROM docs) tn),
word_freq AS (
  SELECT w, n, CAST(row_number() OVER (ORDER BY n DESC, w) AS BIGINT) AS rank
  FROM (SELECT w, CAST(count(*) AS BIGINT) AS n FROM words_flat GROUP BY 1) f
  QUALIFY rank <= 100),
doc_fingerprint AS (
  SELECT d.doc_id, md5(d.norm) AS md5_norm, min(md5(s.shingle)) AS min_shingle_hash
  FROM docs d JOIN docs_sh_d s ON s.doc_id = d.doc_id
  GROUP BY 1, 2),
mm_meta AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         CAST(64 + octet_length(encode(text)) % 577 AS BIGINT) AS width,
         CAST(64 + (octet_length(encode(text)) * 31) % 433 AS BIGINT) AS height,
         CAST(1 + octet_length(encode(text)) // 256 AS BIGINT) AS n_frames
  FROM documents),
mm_frames AS (
  SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
         md5(md5(doc_text) || '#' || CAST(f AS VARCHAR)) AS frame_fp
  FROM (SELECT m.doc_id, d.text AS doc_text,
               unnest(range(0, m.n_frames)) AS f
        FROM mm_meta m JOIN documents d ON d.doc_id = m.doc_id) e),
emb_n AS (
  SELECT vec_id, label, qv,
         CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
  FROM (SELECT vec_id, label,
               list_transform(embedding,
                 v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        FROM embeddings)),
emb_nn AS (
  SELECT a.vec_id, b.vec_id AS nn_vec_id, a.label, b.label AS nn_label,
         CAST(list_sum(list_transform(list_zip(a.qv, b.qv), x -> x[1] * x[2])) AS BIGINT) AS dot,
         a.n2 AS na2, b.n2 AS nb2
  FROM emb_n a JOIN emb_n b ON a.label = b.label AND b.vec_id != a.vec_id),
dedup_embedding AS (
  SELECT vec_id, nn_vec_id, label, score, score >= 0.90 AS is_dup
  FROM (SELECT vec_id, nn_vec_id, label,
               CAST(dot AS DOUBLE) / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)) AS score,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)) DESC,
                          nn_vec_id) AS rn
        FROM emb_nn) WHERE rn = 1),
ann_scores AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         CAST(list_sum(list_transform(list_zip(q.qv, c.qv), x -> x[1] * x[2])) AS BIGINT) AS dot,
         q.n2 AS qa2, c.n2 AS ca2
  FROM emb_n q JOIN emb_n c ON c.vec_id != q.vec_id
  WHERE q.vec_id % 50 = 0),
ann_cosine_topk AS (
  SELECT query_id, cand_id, score, CAST(rnk AS BIGINT) AS rnk FROM (
    SELECT query_id, cand_id,
           CAST(dot AS DOUBLE) / sqrt(CAST(qa2 AS DOUBLE) * CAST(ca2 AS DOUBLE)) AS score,
           row_number() OVER (PARTITION BY query_id
             ORDER BY CAST(dot AS DOUBLE) / sqrt(CAST(qa2 AS DOUBLE) * CAST(ca2 AS DOUBLE)) DESC,
                      cand_id) AS rnk
    FROM ann_scores) s WHERE rnk <= 5),
ivf_cells AS (
    SELECT v.vec_id, c.vec_id AS centroid_id,
           CAST(list_sum(list_transform(list_zip(v.qv, c.qv), x -> x[1] * x[2])) AS BIGINT) AS cdot,
           v.n2 AS vn2, c.n2 AS cn2,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(v.qv, c.qv), x -> x[1] * x[2])) AS DOUBLE)
                      / sqrt(CAST(v.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)) DESC,
                      c.vec_id) AS rn
    FROM emb_n v JOIN emb_n c ON c.vec_id % 40 = 0),
ivf_assign AS (
  SELECT vec_id, centroid_id, CAST(cdot AS DOUBLE) / sqrt(CAST(vn2 AS DOUBLE) * CAST(cn2 AS DOUBLE)) AS score
  FROM ivf_cells
  WHERE rn = 1),
ivf_topk_probe2 AS (
  SELECT query_id, cand_id, score, CAST(rnk AS BIGINT) AS rnk FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) AS score,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv), x -> x[1] * x[2])) AS DOUBLE)
                      / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) DESC,
                      c.vec_id) AS rnk
    FROM (SELECT vec_id, centroid_id FROM ivf_cells WHERE rn <= 2) q
    JOIN (SELECT vec_id, centroid_id FROM ivf_cells WHERE rn = 1) c
      ON c.centroid_id = q.centroid_id AND c.vec_id != q.vec_id
    JOIN emb_n qe ON qe.vec_id = q.vec_id
    JOIN emb_n ce ON ce.vec_id = c.vec_id
    WHERE q.vec_id % 50 = 0) s WHERE rnk <= 3),
rh_planes AS (
  SELECT b, d,
         CAST(strpos('0123456789abcdef',
                substr(md5(CAST(b AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 1))
              - 9 AS BIGINT) AS c
  FROM range(0, 8) tb(b), range(0, 64) td(d)),
rh_sig AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN s > 0
                  THEN CAST(1 AS BIGINT) << CAST(7 - b AS INTEGER)
                  ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
  FROM (SELECT ev.vec_id, p.b, sum(ev.v_el * p.c) AS s
        FROM (SELECT vec_id, unnest(qv) AS v_el,
                     unnest(range(0, len(qv))) AS d FROM emb_n) ev
        JOIN rh_planes p ON p.d = ev.d
        GROUP BY 1, 2) z
  GROUP BY 1),
dedup_embedding_lsh AS (
  SELECT vec_id, nn_vec_id, score, score >= 0.90 AS is_dup FROM (
    SELECT q.vec_id, c.vec_id AS nn_vec_id,
           CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) AS score,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv), x -> x[1] * x[2])) AS DOUBLE)
                      / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) DESC,
                      c.vec_id) AS rn
    FROM rh_sig q
    JOIN rh_sig c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
    JOIN emb_n qe ON qe.vec_id = q.vec_id
    JOIN emb_n ce ON ce.vec_id = c.vec_id) s WHERE rn = 1),
dedup_embedding_ivf AS (
  SELECT vec_id, nn_vec_id, score, score >= 0.90 AS is_dup FROM (
    SELECT q.vec_id, c.vec_id AS nn_vec_id,
           CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) AS score,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv), x -> x[1] * x[2])) AS DOUBLE)
                      / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) DESC,
                      c.vec_id) AS rn
    FROM ivf_assign q
    JOIN ivf_assign c ON c.centroid_id = q.centroid_id AND c.vec_id != q.vec_id
    JOIN emb_n qe ON qe.vec_id = q.vec_id
    JOIN emb_n ce ON ce.vec_id = c.vec_id) s WHERE rn = 1),
ivf_topk AS (
  SELECT query_id, cand_id, score, CAST(rnk AS BIGINT) AS rnk FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) AS score,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv), x -> x[1] * x[2])) AS DOUBLE)
                      / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) DESC,
                      c.vec_id) AS rnk
    FROM ivf_assign q
    JOIN ivf_assign c ON c.centroid_id = q.centroid_id AND c.vec_id != q.vec_id
    JOIN emb_n qe ON qe.vec_id = q.vec_id
    JOIN emb_n ce ON ce.vec_id = c.vec_id
    WHERE q.vec_id % 50 = 0) s WHERE rnk <= 3),
km_c0 AS (
  SELECT vec_id AS cell, qv AS cqv, n2 AS cn2 FROM emb_n WHERE vec_id % 40 = 0),
km_a1 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             CAST(list_sum(list_transform(list_zip(e.qv, c.cqv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(e.n2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) DESC, c.cell) AS rn
    FROM emb_n e, km_c0 c) t WHERE rn = 1),
km_s1 AS (
  SELECT cell, dim, sum(val) AS s, count(*) AS n FROM (
    SELECT a.cell, unnest(e.qv) AS val, unnest(range(0, len(e.qv))) AS dim
    FROM km_a1 a JOIN emb_n e ON e.vec_id = a.vec_id) z
  GROUP BY 1, 2),
km_c1 AS (
  SELECT cell, cqv, CAST(list_sum(list_transform(cqv, x -> x * x)) AS BIGINT) AS cn2 FROM (
    SELECT cell, array_agg(CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) ORDER BY dim) AS cqv
    FROM km_s1 GROUP BY 1) g),
km_a2 AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             CAST(list_sum(list_transform(list_zip(e.qv, c.cqv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(e.n2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) DESC, c.cell) AS rn
    FROM emb_n e, km_c1 c) t WHERE rn = 1),
km_s2 AS (
  SELECT cell, dim, sum(val) AS s, count(*) AS n FROM (
    SELECT a.cell, unnest(e.qv) AS val, unnest(range(0, len(e.qv))) AS dim
    FROM km_a2 a JOIN emb_n e ON e.vec_id = a.vec_id) z
  GROUP BY 1, 2),
km_c2 AS (
  SELECT cell, cqv, CAST(list_sum(list_transform(cqv, x -> x * x)) AS BIGINT) AS cn2 FROM (
    SELECT cell, array_agg(CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) ORDER BY dim) AS cqv
    FROM km_s2 GROUP BY 1) g),
ann_kmeans_assign AS (
  SELECT vec_id, cell, score FROM (
    SELECT e.vec_id, c.cell,
           CAST(list_sum(list_transform(list_zip(e.qv, c.cqv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(e.n2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) AS score,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             CAST(list_sum(list_transform(list_zip(e.qv, c.cqv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(e.n2 AS DOUBLE) * CAST(c.cn2 AS DOUBLE)) DESC, c.cell) AS rn
    FROM emb_n e, km_c2 c) t WHERE rn = 1),
sym_edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM minhash_pairs
  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM minhash_pairs),
reach AS (
  SELECT doc_id AS node, doc_id AS label FROM docs
  UNION
  SELECT e.dst AS node, r.label FROM reach r JOIN sym_edges e ON e.src = r.node),
dedup_clusters AS (
  SELECT node AS doc_id, min(label) AS cluster FROM reach GROUP BY node),
sample_stratified AS (
  SELECT doc_id, lang FROM docs
  WHERE md5(CAST(doc_id AS VARCHAR)) <
        CASE WHEN lang = 'en' THEN '4' ELSE 'c' END),
split_tvt AS (
  SELECT doc_id, lang,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
              ELSE 'test' END AS split
  FROM docs),
corpus_curated AS (
  SELECT c.doc_id, d.lang, q.quality, e.n_dups, s.split
  FROM dedup_clusters c
  JOIN docs d ON d.doc_id = c.doc_id
  JOIN quality_score q ON q.doc_id = c.doc_id
  JOIN dedup_exact e ON e.keeper_doc_id = c.doc_id
  JOIN split_tvt s ON s.doc_id = c.doc_id
  WHERE c.doc_id = c.cluster AND q.quality >= 0.5),
inc_cut AS (
  SELECT CAST(max(doc_id) * 9 // 10 AS BIGINT) AS cutoff FROM docs),
dedup_pairs_inc AS (
  SELECT doc_a, doc_b FROM minhash_pairs, inc_cut WHERE doc_b > cutoff),
words_tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM words_flat GROUP BY 1, 2),
words_df AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM words_dist GROUP BY 1),
n_docs_t AS (
  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM docs),
tfidf_top AS (
  SELECT doc_id, w, tf, df, score, rank FROM (
    SELECT t.doc_id, t.w, t.tf, d.df,
           t.tf * CAST(length(bin(n.n_docs // d.df)) - 1 AS BIGINT) AS score,
           CAST(row_number() OVER (PARTITION BY t.doc_id
                  ORDER BY t.tf * CAST(length(bin(n.n_docs // d.df)) - 1 AS BIGINT) DESC,
                           t.w) AS BIGINT) AS rank
    FROM words_tf t JOIN words_df d ON d.w = t.w, n_docs_t n) s
  WHERE rank <= 3),
contam_needles AS (
  SELECT DISTINCT shingle FROM docs_sh_d WHERE doc_id < 5),
contamination AS (
  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM docs_sh_d s JOIN contam_needles n ON n.shingle = s.shingle
  GROUP BY 1),
pii_scan AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(norm,
              '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+')) AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(norm,
              '[0-9][0-9][0-9][- ][0-9][0-9][0-9][- ][0-9][0-9][0-9][0-9]')) AS BIGINT) AS n_phone,
         (len(regexp_extract_all(norm, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+'))
          + len(regexp_extract_all(norm, '[0-9][0-9][0-9][- ][0-9][0-9][0-9][- ][0-9][0-9][0-9][0-9]'))) > 0 AS has_pii
  FROM docs),
repetition AS (
  SELECT w.doc_id,
         CAST(greatest(len(w.words) - 2, 1) AS BIGINT) AS n_total,
         s.n_sh AS n_distinct,
         1.0 - CAST(s.n_sh AS DOUBLE)
             / CAST(greatest(len(w.words) - 2, 1) AS DOUBLE) AS rep_ratio
  FROM docs_words w JOIN sh_sizes s ON s.doc_id = w.doc_id),
bigrams AS (
  SELECT bigram FROM docs_words w,
       unnest(CASE WHEN len(words) >= 2
         THEN [words[i+1] || ' ' || words[i+2] for i in range(0, len(words)-1)]
         ELSE CAST([] AS VARCHAR[]) END) b(bigram)),
bigram_freq AS (
  SELECT bigram, n,
         CAST(row_number() OVER (ORDER BY n DESC, bigram) AS BIGINT) AS rank
  FROM (SELECT bigram, CAST(count(*) AS BIGINT) AS n
        FROM bigrams GROUP BY 1) f
  QUALIFY rank <= 50),
corpus_curated_v2 AS (
  SELECT c.doc_id, c.lang, c.quality, r.rep_ratio, c.n_dups, c.split
  FROM corpus_curated c
  JOIN pii_scan p ON p.doc_id = c.doc_id AND NOT p.has_pii
  JOIN repetition r ON r.doc_id = c.doc_id AND r.rep_ratio <= 0.5
  WHERE c.doc_id NOT IN (SELECT doc_id FROM contamination)),
passages AS (
  SELECT doc_id, unnest(CASE WHEN len(words) >= 8
      THEN [array_to_string(words[i*8+1 : i*8+8], ' ')
            for i in range(0, len(words)//8)]
      ELSE CAST([] AS VARCHAR[]) END) AS passage
  FROM docs_words),
pass_h AS (SELECT doc_id, md5(passage) AS passage_hash FROM passages),
pass_stats AS (
  SELECT passage_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_occ, min(doc_id) AS keeper_doc_id
  FROM pass_h GROUP BY 1),
dedup_passages AS (
  SELECT passage_hash, n_docs, n_occ, keeper_doc_id
  FROM pass_stats WHERE n_docs >= 2),
passage_dup_ratio AS (
  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_passages,
         CAST(sum(CASE WHEN s.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         CAST(sum(CASE WHEN s.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS dup_ratio
  FROM pass_h p JOIN pass_stats s ON s.passage_hash = p.passage_hash
  GROUP BY 1),
pq_sub AS (
  SELECT vec_id, m, qv[m*16+1 : m*16+16] AS sub
  FROM emb_n, range(0, 4) t(m)),
pq_cb0 AS (SELECT m, vec_id AS cb_id, sub AS csub
          FROM pq_sub WHERE vec_id % 32 = 0 AND vec_id < 512),
pq_e1 AS (
  SELECT vec_id, m, cb_id FROM (
    SELECT s.vec_id, s.m, c.cb_id,
      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        CAST(list_sum(list_transform(list_zip(s.sub, c.csub),
               x -> (x[1]-x[2])*(x[1]-x[2]))) AS BIGINT), c.cb_id) AS rn
    FROM pq_sub s JOIN pq_cb0 c ON c.m = s.m) z WHERE rn = 1),
pq_s1 AS (
  SELECT m, cb_id, dim, sum(val) AS s, count(*) AS n FROM (
    SELECT e.m, e.cb_id, unnest(s.sub) AS val,
           unnest(range(0, len(s.sub))) AS dim
    FROM pq_e1 e JOIN pq_sub s ON s.vec_id = e.vec_id AND s.m = e.m) z
  GROUP BY 1, 2, 3),
pq_cb1 AS (
  SELECT m, cb_id,
         array_agg(CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
                   ORDER BY dim) AS csub
  FROM pq_s1 GROUP BY 1, 2),
pq_e2 AS (
  SELECT vec_id, m, cb_id FROM (
    SELECT s.vec_id, s.m, c.cb_id,
      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        CAST(list_sum(list_transform(list_zip(s.sub, c.csub),
               x -> (x[1]-x[2])*(x[1]-x[2]))) AS BIGINT), c.cb_id) AS rn
    FROM pq_sub s JOIN pq_cb1 c ON c.m = s.m) z WHERE rn = 1),
pq_s2 AS (
  SELECT m, cb_id, dim, sum(val) AS s, count(*) AS n FROM (
    SELECT e.m, e.cb_id, unnest(s.sub) AS val,
           unnest(range(0, len(s.sub))) AS dim
    FROM pq_e2 e JOIN pq_sub s ON s.vec_id = e.vec_id AND s.m = e.m) z
  GROUP BY 1, 2, 3),
pq_cb AS (
  SELECT m, cb_id,
         array_agg(CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
                   ORDER BY dim) AS csub
  FROM pq_s2 GROUP BY 1, 2),
pq_codes AS (
  SELECT vec_id, m, cb_id AS code, d2 FROM (
    SELECT s.vec_id, s.m, c.cb_id,
      CAST(list_sum(list_transform(list_zip(s.sub, c.csub),
             x -> (x[1]-x[2])*(x[1]-x[2]))) AS BIGINT) AS d2,
      row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        CAST(list_sum(list_transform(list_zip(s.sub, c.csub),
               x -> (x[1]-x[2])*(x[1]-x[2]))) AS BIGINT), c.cb_id) AS rn
    FROM pq_sub s JOIN pq_cb c ON c.m = s.m) z WHERE rn = 1),
pq_dtab AS (
  SELECT q.vec_id AS query_id, c.m, c.cb_id,
    CAST(list_sum(list_transform(list_zip(q.sub, c.csub),
           x -> (x[1]-x[2])*(x[1]-x[2]))) AS BIGINT) AS d2
  FROM pq_sub q JOIN pq_cb c ON c.m = q.m WHERE q.vec_id % 50 = 0),
pq_adc AS (
  SELECT d.query_id, p.vec_id AS cand_id, CAST(sum(d.d2) AS BIGINT) AS adc_d2
  FROM pq_codes p JOIN pq_dtab d ON d.m = p.m AND d.cb_id = p.code
  WHERE p.vec_id != d.query_id GROUP BY 1, 2),
pq_adc_topk AS (
  SELECT query_id, cand_id, adc_d2, CAST(rnk AS BIGINT) AS rnk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                ORDER BY adc_d2, cand_id) AS rnk
    FROM pq_adc) z WHERE rnk <= 5),
ivfpq_ranked AS (
  SELECT a.query_id, a.cand_id, a.adc_d2,
         row_number() OVER (PARTITION BY a.query_id
           ORDER BY a.adc_d2, a.cand_id) AS rnk
  FROM pq_adc a
  JOIN (SELECT vec_id, centroid_id FROM ivf_cells WHERE rn <= 2) q
    ON q.vec_id = a.query_id
  JOIN ivf_assign c ON c.vec_id = a.cand_id
                   AND c.centroid_id = q.centroid_id),
ivfpq_topk AS (
  SELECT query_id, cand_id, adc_d2, CAST(rnk AS BIGINT) AS rnk
  FROM ivfpq_ranked WHERE rnk <= 3),
ivfpq_rerank AS (
  SELECT query_id, cand_id, score, CAST(rnk AS BIGINT) AS rnk FROM (
    SELECT s.query_id, s.cand_id,
           CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv),
                  x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) AS score,
           row_number() OVER (PARTITION BY s.query_id
             ORDER BY CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv),
                             x -> x[1] * x[2])) AS DOUBLE)
                      / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE))
                        DESC, s.cand_id) AS rnk
    FROM (SELECT query_id, cand_id FROM ivfpq_ranked WHERE rnk <= 10) s
    JOIN emb_n qe ON qe.vec_id = s.query_id
    JOIN emb_n ce ON ce.vec_id = s.cand_id) z
  WHERE rnk <= 3),
ver_inter AS (
  SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS i
  FROM minhash_pairs_guarded p
  JOIN docs_sh_d a ON a.doc_id = p.doc_a
  JOIN docs_sh_d b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2),
dedup_pairs_verified AS (
  SELECT p.doc_a, p.doc_b, COALESCE(i.i, 0) AS n_common,
         sa.n_sh + sb.n_sh - COALESCE(i.i, 0) AS n_union,
         CAST(COALESCE(i.i, 0) AS DOUBLE)
           / CAST(sa.n_sh + sb.n_sh - COALESCE(i.i, 0) AS DOUBLE) AS jaccard
  FROM minhash_pairs_guarded p
  LEFT JOIN ver_inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
  JOIN sh_sizes sa ON sa.doc_id = p.doc_a
  JOIN sh_sizes sb ON sb.doc_id = p.doc_b
  WHERE CAST(COALESCE(i.i, 0) AS DOUBLE)
        / CAST(sa.n_sh + sb.n_sh - COALESCE(i.i, 0) AS DOUBLE) >= 0.7),
ver_sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM dedup_pairs_verified
  UNION ALL SELECT doc_b AS src, doc_a AS dst FROM dedup_pairs_verified),
reach_v AS (
  SELECT doc_id AS node, doc_id AS label FROM docs
  UNION
  SELECT e.dst AS node, r.label FROM reach_v r JOIN ver_sym e ON e.src = r.node),
dedup_clusters_verified AS (
  SELECT node AS doc_id, min(label) AS cluster FROM reach_v GROUP BY node),
corpus_stats AS (
  SELECT d.lang, d.source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(t.n_tokens) AS BIGINT) AS total_tokens,
         CAST(sum(t.n_chars_norm) AS BIGINT) AS total_chars,
         CAST(sum(CAST(round(q.quality * 1000000) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) * 1000000 AS DOUBLE) AS avg_quality,
         CAST(sum(CASE WHEN p.has_pii THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pii_docs,
         CAST(sum(CAST(round(r.rep_ratio * 1000000) AS BIGINT)) AS DOUBLE)
           / CAST(count(*) * 1000000 AS DOUBLE) AS avg_rep_ratio
  FROM docs d
  JOIN text_stats t ON t.doc_id = d.doc_id
  JOIN quality_score q ON q.doc_id = d.doc_id
  JOIN pii_scan p ON p.doc_id = d.doc_id
  JOIN repetition r ON r.doc_id = d.doc_id
  GROUP BY 1, 2),
ing_inc AS (
  SELECT vec_id,
         list_concat(qv[1:32], list_transform(qv[33:64], v -> -v)) AS qv, n2
  FROM emb_n WHERE vec_id % 10 = 7),
ing_idx AS (
  SELECT vec_id, qv, n2 FROM emb_n WHERE vec_id % 10 != 7
  UNION ALL SELECT vec_id, qv, n2 FROM ing_inc),
ing_v2 AS (
  SELECT vec_id,
         list_concat(qv[1:32], list_transform(qv[33:64], v -> -v)) AS qv, n2
  FROM emb_n),
ing_assign AS (
  SELECT vec_id, centroid_id, rn FROM (
    SELECT v.vec_id, c.vec_id AS centroid_id,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
             CAST(list_sum(list_transform(list_zip(v.qv, c.qv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(v.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)) DESC,
             c.vec_id) AS rn
    FROM ing_idx v JOIN emb_n c ON c.vec_id % 40 = 0) t WHERE rn <= 2),
ing_served AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             CAST(list_sum(list_transform(list_zip(qe.qv, ce.qv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(qe.n2 AS DOUBLE) * CAST(ce.n2 AS DOUBLE)) DESC,
             c.vec_id) AS rnk
    FROM ing_assign q
    JOIN (SELECT * FROM ing_assign WHERE rn = 1) c
      ON c.centroid_id = q.centroid_id AND c.vec_id != q.vec_id
    JOIN ing_idx qe ON qe.vec_id = q.vec_id
    JOIN ing_idx ce ON ce.vec_id = c.vec_id
    WHERE q.vec_id % 20 = 17) s WHERE rnk <= 3),
ing_truth AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             CAST(list_sum(list_transform(list_zip(q.qv, c.qv), x -> x[1] * x[2])) AS DOUBLE)
             / sqrt(CAST(q.n2 AS DOUBLE) * CAST(c.n2 AS DOUBLE)) DESC,
             c.vec_id) AS rnk
    FROM ing_v2 q JOIN ing_v2 c ON c.vec_id != q.vec_id
    WHERE q.vec_id % 20 = 17) s WHERE rnk <= 3),
ivf_ingest_recall AS (
  SELECT q.query_id, CAST(count(h.cand_id) AS BIGINT) AS n_hits,
         CAST(count(h.cand_id) AS DOUBLE) / 3 AS recall
  FROM (SELECT DISTINCT query_id FROM ing_truth) q
  LEFT JOIN (SELECT e.query_id, e.cand_id FROM ing_truth e
             JOIN ing_served a ON a.query_id = e.query_id
                              AND a.cand_id = e.cand_id) h
    ON h.query_id = q.query_id
  GROUP BY 1)

-- round-11 additions (prototyped here, embedded in DocsOracleSql.scala):
-- ensemble consensus pairs, PMI-surrogate collocations, mixture weights.
-- dedup_consensus AS (
--   SELECT m.doc_a, m.doc_b, s.hamming
--   FROM minhash_pairs_guarded m  -- r12: guarded list (star guard applied)
--   JOIN simhash_pairs s ON s.doc_a = m.doc_a AND s.doc_b = m.doc_b)
-- colloc_bi / colloc_tot / colloc_uni / colloc_pmi, mix_src / mix_weights:
-- see DocsOracleSql.scala (canonical embedded text) — this prototype file
-- predates the later CTEs and is kept as the original scratchpad.
