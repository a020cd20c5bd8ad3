package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-6 batch (q120+): hard-negative mining, JL random projection,
  * the distributed covariance pass, leakage-free cluster splitting,
  * DSIR importance weighting, and the contamination-depth ladder.
  * Reference scope: LLM-pipeline surface (builder brief) — no PUMLE
  * counterpart.
  */
object Ext3Queries {

  // --------------------------------------------------------------- q120
  // Hard negatives for contrastive training: per query (vec_id % 37),
  // top-4 most-cosine-similar vectors with a DIFFERENT label. q54's
  // exact ranking contract with the label-mismatch pair filter.
  private val q120 = Q(
    "q120_hard_negatives",
    (s, d) => {
      graft.ext.Similarity.hardNegatives(s, Tables.embeddings(s, d),
          col("vec_id") % 37 === 0, k = 4)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH base AS (
        SELECT vec_id, CAST(label AS BIGINT) AS label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      nrm AS (
        SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM base),
      pairs AS (
        SELECT q.vec_id AS q_id, q.label AS q_label, c.vec_id AS n_id,
          c.label AS n_label,
          round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4)
            + 0.0 AS cosine
        FROM nrm q, nrm c
        WHERE q.vec_id % 37 = 0 AND q.vec_id <> c.vec_id
          AND q.label <> c.label),
      ranked AS (
        SELECT q_id, q_label, n_id, n_label, cosine,
          CAST(row_number() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, n_id) AS BIGINT) AS rank
        FROM pairs)
      SELECT q_id, q_label, rank, n_id, n_label, cosine FROM ranked
      WHERE rank <= 4 ORDER BY q_id, rank"""))

  // --------------------------------------------------------------- q121
  // Johnson–Lindenstrauss projection 64 → 16 with the deterministic
  // md5-parity Rademacher matrix: ZERO-shuffle narrow pass (the matrix
  // is a literal), vs lshBuckets' crossJoin+groupBy. Projections are
  // 4-dp rounded (q54's dot-product rounding discipline). The oracle's
  // `+ 0.0` after round() is the repo-wide -0.0 normalization (IEEE
  // `-0.0 + 0.0 = +0.0`): DuckDB round() preserves the sign bit when a
  // negative value rounds to zero, Spark's BigDecimal HALF_UP cannot
  // represent -0.0 — the driver's hash is bitwise, so any
  // negative-capable rounded double column must carry it.
  private val q121 = Q(
    "q121_random_proj",
    (s, d) => {
      graft.ext.Similarity.randomProject(s, Tables.embeddings(s, d),
          outDims = 16)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "y")))
        .orderBy(col("vec_id"), col("j"))
    },
    Some("""WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings),
      sgn AS (
        SELECT CAST(j.generate_series AS INT) AS j,
          list(CASE WHEN CAST(('0x' || substr(md5('rp:' || j.generate_series
                 || ':' || d.generate_series), 1, 6)) AS BIGINT) % 2 = 0
               THEN 1.0 ELSE -1.0 END ORDER BY d.generate_series) AS sw
        FROM generate_series(0, 15) j, generate_series(0, 63) d
        GROUP BY 1)
      SELECT vec_id, j,
        round(list_dot_product(v.v, s.sw) / sqrt(CAST(16 AS DOUBLE)), 4)
          + 0.0 AS y
      FROM v, sgn s ORDER BY vec_id, j"""))

  // --------------------------------------------------------------- q122
  // Centered covariance of the embedding matrix, upper triangle —
  // THE map-side-combinable d² pass, run through the compiled
  // cov_moments aggregate (shuffle = one buffer per task,
  // corpus-size-independent). Terms are TRUNCATED to integer nanos on
  // both engines ((long)(x·10⁹) ↔ CAST(trunc(x * 1e9) AS BIGINT) on
  // the identical IEEE product), so sums are order-free integers; the
  // final double math is spelled operation-for-operation identically.
  // `+ 0.0` after the oracle's round(): the -0.0 normalization (see
  // q121) — a tiny negative covariance that rounds to zero keeps its
  // IEEE sign bit in DuckDB but not in Spark's HALF_UP.
  private val q122 = Q(
    "q122_embed_cov",
    (s, d) => {
      graft.ext.EmbedStats.covariance(Tables.embeddings(s, d))
        .orderBy(col("i"), col("j"))
    },
    Some("""WITH v AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE embedding IS NOT NULL),
      pr AS (
        SELECT CAST(i.generate_series AS BIGINT) AS i,
          CAST(j.generate_series AS BIGINT) AS j,
          CAST(trunc(v[CAST(i.generate_series + 1 AS INT)]
                   * v[CAST(j.generate_series + 1 AS INT)]
                   * 1000000000.0) AS BIGINT) AS p
        FROM v, generate_series(0, 63) i, generate_series(0, 63) j
        WHERE j.generate_series >= i.generate_series),
      s2 AS (SELECT i, j, sum(p) AS sxy, count(*) AS n FROM pr GROUP BY i, j),
      ds AS (
        SELECT CAST(d.generate_series AS BIGINT) AS d,
          sum(CAST(trunc(v[CAST(d.generate_series + 1 AS INT)]
              * 1000000000.0) AS BIGINT)) AS sx
        FROM v, generate_series(0, 63) d GROUP BY 1)
      SELECT i, j,
        round((CAST(sxy AS DOUBLE) / 1000000000.0
               - (CAST(a.sx AS DOUBLE) / 1000000000.0)
                 * (CAST(b.sx AS DOUBLE) / 1000000000.0) / n) / n, 6)
          + 0.0 AS cov
      FROM s2 JOIN ds a ON a.d = i JOIN ds b ON b.d = j
      ORDER BY i, j"""))

  // --------------------------------------------------------------- q123
  // Leakage-free split: near-duplicate clusters (q65's EXACT clustering
  // — the CTE chain is shared verbatim) assigned train/test as a UNIT
  // by md5 over the cluster id. Two near-dups can never straddle the
  // eval boundary.
  private val q123 = Q(
    "q123_cluster_split",
    (s, d) => {
      graft.ext.Sampling.clusterSplit(s, Tables.documents(s, d))
        .select(col("doc_id"), col("cluster_id"), col("bucket"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ${ExtQueries.clusterCtes},
      cl AS (
        SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a),
      alld AS (
        SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
      bk AS (
        SELECT doc_id, cluster_id,
          CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 AS bucket
        FROM alld)
      SELECT doc_id, cluster_id, bucket,
        CASE WHEN bucket < 90 THEN 'train' ELSE 'test' END AS split
      FROM bk ORDER BY doc_id"""))

  // --------------------------------------------------------------- q124
  // DSIR importance weights against the English subcorpus as target:
  // hashed-bigram features (md5 → 1024 buckets), +1-smoothed log-ratio
  // λ table (bucket-bounded, broadcast), per-doc mean λ. The principled
  // "looks like the target distribution" score.
  private val q124 = Q(
    "q124_dsir_weight",
    (s, d) => {
      graft.ext.TextStats.dsirWeights(Tables.documents(s, d),
          col("lang") === "en")
        .orderBy(col("doc_id"))
    },
    Some("""WITH f AS (
        SELECT doc_id, is_target,
          CAST(('0x' || substr(md5(ws[CAST(g.generate_series AS INT)] || ' '
                || ws[CAST(g.generate_series + 1 AS INT)]), 1, 8))
               AS BIGINT) % 1024 AS b
        FROM (SELECT doc_id, (lang = 'en') AS is_target,
                string_split(text, ' ') AS ws
              FROM documents WHERE text IS NOT NULL),
             generate_series(1, 4096) g
        WHERE CAST(g.generate_series AS BIGINT) <= CAST(len(ws) AS BIGINT) - 1),
      cnt AS (
        SELECT b, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
          count(*) AS cr
        FROM f GROUP BY b),
      tot AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM cnt),
      lam AS (
        SELECT b,
          CAST(round(ln(CAST(ct + 1 AS DOUBLE) / (nt + 1024))
                   - ln(CAST(cr + 1 AS DOUBLE) / (nr + 1024)), 9)
               AS DECIMAL(18,9)) AS lam
        FROM cnt, tot),
      sc AS (
        SELECT f.doc_id, count(*) AS n_feats,
          round(CAST(sum(l.lam) AS DOUBLE) / count(*), 6)
            + 0.0 AS dsir_weight
        FROM f JOIN lam l USING (b) WHERE NOT is_target GROUP BY f.doc_id)
      SELECT d.doc_id, CAST(coalesce(sc.n_feats, 0) AS BIGINT) AS n_feats,
        coalesce(sc.dsir_weight, 0.0) AS dsir_weight
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      WHERE d.lang <> 'en'
      ORDER BY d.doc_id"""))

  // --------------------------------------------------------------- q125
  // Contamination-depth ladder: q77's decontamination at n = 4/8/16 in
  // ONE tagged pass — "mentions the benchmark's phrasing" (short rungs)
  // vs "contains the benchmark verbatim" (long rungs).
  private val q125 = Q(
    "q125_contam_ladder",
    (s, d) => {
      graft.ext.TextStats.contamLadder(Tables.documents(s, d),
          col("doc_id") % 50 === 0)
        .orderBy(col("doc_id"))
    },
    Some("""WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws, (doc_id % 50 = 0) AS is_eval
        FROM documents),
      g AS (
        SELECT doc_id, is_eval, 4 AS n,
          array_to_string(ws[CAST(gs.generate_series + 1 AS INT) :
                             CAST(gs.generate_series + 4 AS INT)], ' ') AS gram
        FROM w, generate_series(0, 4096) gs
        WHERE gs.generate_series <= least(greatest(len(ws) - 4, 0), 4096)
        UNION ALL
        SELECT doc_id, is_eval, 8,
          array_to_string(ws[CAST(gs.generate_series + 1 AS INT) :
                             CAST(gs.generate_series + 8 AS INT)], ' ')
        FROM w, generate_series(0, 4096) gs
        WHERE gs.generate_series <= least(greatest(len(ws) - 8, 0), 4096)
        UNION ALL
        SELECT doc_id, is_eval, 16,
          array_to_string(ws[CAST(gs.generate_series + 1 AS INT) :
                             CAST(gs.generate_series + 16 AS INT)], ' ')
        FROM w, generate_series(0, 4096) gs
        WHERE gs.generate_series <= least(greatest(len(ws) - 16, 0), 4096)),
      eg AS (SELECT DISTINCT n, gram FROM g WHERE is_eval),
      sh2 AS (
        SELECT g.doc_id,
          sum(CASE WHEN g.n = 4 THEN 1 ELSE 0 END) AS s4,
          sum(CASE WHEN g.n = 8 THEN 1 ELSE 0 END) AS s8,
          sum(CASE WHEN g.n = 16 THEN 1 ELSE 0 END) AS s16
        FROM g JOIN eg ON eg.n = g.n AND eg.gram = g.gram
        WHERE NOT is_eval GROUP BY g.doc_id)
      SELECT d.doc_id,
        CAST(coalesce(s4, 0) AS BIGINT) AS shared4,
        CAST(coalesce(s8, 0) AS BIGINT) AS shared8,
        CAST(coalesce(s16, 0) AS BIGINT) AS shared16,
        CAST(CASE WHEN coalesce(s16, 0) > 0 THEN 16
                  WHEN coalesce(s8, 0) > 0 THEN 8
                  WHEN coalesce(s4, 0) > 0 THEN 4
                  ELSE 0 END AS BIGINT) AS contam_depth
      FROM documents d LEFT JOIN sh2 ON sh2.doc_id = d.doc_id
      WHERE d.doc_id % 50 <> 0
      ORDER BY d.doc_id"""))

  // --------------------------------------------------------------- q126
  // The compiled-narrow DSIR scorer on q124's exact parameters, sharing
  // q124's oracle VERBATIM: trainDsirModel collects the same λ table
  // the relational form broadcasts, and dsirScoreNarrow re-sums the
  // identical DECIMAL(18,9) terms inside one expression (order-free
  // exact addition, same 6-dp mean) — the driver proves
  // narrow ≡ relational ≡ DuckDB, the q96/q119 oracle-twin pattern
  // applied to importance weighting.
  private val q126 = Q(
    "q126_dsir_narrow",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = graft.ext.TextStats.trainDsirModel(docs,
        col("lang") === "en")
      graft.ext.TextStats.dsirScoreNarrow(
          docs.filter(col("lang") =!= "en"), model)
        .orderBy(col("doc_id"))
    },
    q124.oracle) // q124's oracle VERBATIM

  // --------------------------------------------------------------- q127
  // PQ ADC search against a FIXED md5-derived codebook — the one
  // formulation that lets the ADC contract be ORACLE-checked end to
  // end (a trained codebook's FP means aren't reproducible by an
  // independent engine): encode = lexicographic (dist², code) argmin,
  // search = per-subspace table lookups summed in subspace order
  // (list(d2 ORDER BY s) on the oracle side pins the same fold order),
  // 6-dp (adc_dist2, n_id) ranking.
  private val q127 = Q(
    "q127_pq_adc",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cbs = graft.ext.Similarity.fixedCodebooks()
      graft.ext.Similarity.pqSearchADC(s, emb,
          graft.ext.Similarity.pqEncode(s, emb, cbs), cbs,
          queryPred = col("vec_id") % 41 === 0, topK = 3)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH cb AS (
        SELECT s.generate_series AS s, c.generate_series AS c,
          list((CAST(('0x' || substr(md5('pq:' || s.generate_series || ':'
                 || c.generate_series || ':' || d.generate_series), 1, 6))
                AS BIGINT) % 2001 - 1000) / 1000.0
               ORDER BY d.generate_series) AS cw
        FROM generate_series(0, 3) s, generate_series(0, 7) c,
             generate_series(0, 15) d
        GROUP BY 1, 2),
      v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
      sub AS (
        SELECT vec_id, CAST(g.generate_series AS INT) AS s,
          v[CAST(g.generate_series * 16 + 1 AS INT) :
            CAST(g.generate_series * 16 + 16 AS INT)] AS vs
        FROM v, generate_series(0, 3) g),
      dist AS (
        SELECT vec_id, sub.s, cb.c,
          list_sum(list_transform(list_zip(vs, cw),
            z -> (z[1] - z[2]) * (z[1] - z[2]))) AS d2
        FROM sub JOIN cb ON cb.s = sub.s),
      codes AS (
        SELECT vec_id, s, c FROM (
          SELECT vec_id, s, c,
            row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, c) AS rk
          FROM dist) WHERE rk = 1),
      qtbl AS (SELECT vec_id AS q_id, s, c, d2 FROM dist WHERE vec_id % 41 = 0),
      adc AS (
        SELECT q.q_id, n.vec_id AS n_id,
          round(list_sum(list(q.d2 ORDER BY q.s)), 6) AS adc_dist2
        FROM codes n JOIN qtbl q ON q.s = n.s AND q.c = n.c
        WHERE q.q_id <> n.vec_id
        GROUP BY q.q_id, n.vec_id),
      ranked AS (
        SELECT q_id, n_id, adc_dist2,
          CAST(row_number() OVER (PARTITION BY q_id
                                  ORDER BY adc_dist2, n_id) AS BIGINT) AS rank
        FROM adc)
      SELECT q_id, rank, n_id, adc_dist2 FROM ranked
      WHERE rank <= 3 ORDER BY q_id, rank"""))

  // --------------------------------------------------------------- q128
  // Per-source vocabulary drift: KL(source ‖ corpus) over hashed
  // unigrams (+1-smoothed over the FULL bucket grid — empty buckets
  // carry mass). Every table bucket- or source-bounded; 12-dp DECIMAL
  // term sums keep reassociation out of the verdict.
  private val q128 = Q(
    "q128_vocab_drift",
    (s, d) => {
      graft.ext.Corpus.vocabDrift(Tables.documents(s, d))
        .orderBy(col("source"))
    },
    Some("""WITH wd AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL),
      wb AS (
        SELECT source,
          CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 1024 AS b
        FROM wd),
      sb AS (SELECT source, b, count(*) AS c_sb FROM wb GROUP BY source, b),
      bb AS (SELECT b, sum(c_sb) AS c_b FROM sb GROUP BY b),
      ns AS (SELECT source, sum(c_sb) AS n_s FROM sb GROUP BY source),
      nn AS (SELECT sum(c_b) AS n FROM bb),
      grid AS (
        SELECT ns.source, ns.n_s, CAST(g.generate_series AS BIGINT) AS b
        FROM ns, generate_series(0, 1023) g),
      terms AS (
        SELECT grid.source, grid.n_s,
          CAST(round(
            (CAST(coalesce(sb.c_sb, 0) + 1 AS DOUBLE) / (grid.n_s + 1024))
            * ln((CAST(coalesce(sb.c_sb, 0) + 1 AS DOUBLE) / (grid.n_s + 1024))
                / (CAST(coalesce(bb.c_b, 0) + 1 AS DOUBLE) / (nn.n + 1024))),
            12) AS DECIMAL(26,12)) AS term
        FROM grid
        LEFT JOIN sb ON sb.source = grid.source AND sb.b = grid.b
        LEFT JOIN bb ON bb.b = grid.b, nn)
      SELECT source, CAST(n_s AS BIGINT) AS n_tokens,
        round(CAST(sum(term) AS DOUBLE), 6) + 0.0 AS kl
      FROM terms GROUP BY source, n_s ORDER BY source"""))

  // --------------------------------------------------------------- q129
  // Hashed linear quality classifier (fastText shape) with the FIXED
  // md5-derived milli-weight model — integer token-weight sums make the
  // relational scorer exactly replayable by an independent engine
  // (q127's fixed-codebook trick applied to classification). logit is
  // rounded to 9 dp from exact integers BEFORE the sigmoid, so both
  // engines feed exp the identical double.
  // The fixed-model scoring CTE chain (q129's oracle up to the final
  // SELECT), shared verbatim with the quality-bins oracle (q135) so
  // both replay the identical scores.
  private[queries] val qcCtes =
    """wt AS (
        SELECT CAST(g.generate_series AS BIGINT) AS b,
          CAST(('0x' || substr(md5('qc:' || g.generate_series), 1, 6))
               AS BIGINT) % 2001 - 1000 AS w_milli
        FROM generate_series(0, 255) g),
      tk AS (
        SELECT doc_id, CAST(least(len(ws), 4096) AS BIGINT) AS n_tokens,
          CAST(('0x' || substr(md5(ws[CAST(g.generate_series AS INT)]), 1, 8))
               AS BIGINT) % 256 AS b
        FROM (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents WHERE text IS NOT NULL),
             generate_series(1, 4096) g
        WHERE CAST(g.generate_series AS BIGINT)
              <= least(CAST(len(ws) AS BIGINT), 4096)),
      sm AS (
        SELECT doc_id, n_tokens, sum(w_milli) AS s
        FROM tk JOIN wt USING (b) GROUP BY doc_id, n_tokens),
      lg AS (
        SELECT doc_id, n_tokens,
          round(CAST(s AS DOUBLE) / (1000.0 * n_tokens)
                + CAST(0 AS DOUBLE) / 1000.0, 9) + 0.0 AS logit
        FROM sm)"""

  private val q129 = Q(
    "q129_qc_score",
    (s, d) => {
      graft.ext.Classifier.qcScore(s, Tables.documents(s, d),
          graft.ext.Classifier.fixedModel())
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $qcCtes
      SELECT doc_id, n_tokens, logit,
        round(1.0 / (1.0 + exp(-logit)), 6) AS score
      FROM lg ORDER BY doc_id"""))

  // --------------------------------------------------------------- q130
  // The compiled-narrow scorer on q129's exact model, sharing q129's
  // oracle VERBATIM (the q126 DSIR-twin pattern): the weight array is a
  // literal, the milli sum one aggregate expression — zero shuffles
  // before the orderBy, and exact-integer addition is order-free, so
  // fusing explode+join+groupBy into one expression cannot move a ulp.
  private val q130 = Q(
    "q130_qc_narrow",
    (s, d) => {
      graft.ext.Classifier.qcScoreNarrow(Tables.documents(s, d),
          graft.ext.Classifier.fixedModel())
        .orderBy(col("doc_id"))
    },
    q129.oracle) // q129's oracle VERBATIM

  // --------------------------------------------------------------- q131
  // Int8 scalar quantization of the embedding corpus: per-dimension
  // affine codes + 6-dp reconstruction error. min/max are selections
  // (exact doubles an independent engine reproduces from the same
  // parquet), and every downstream op is deterministic IEEE arithmetic
  // spelled identically on both engines — the whole compression
  // contract is hash-checked, unlike a trained codebook.
  private val q131 = Q(
    "q131_int8_quant",
    (s, d) => {
      graft.ext.Similarity.sqEncode(s, Tables.embeddings(s, d))
        .orderBy(col("vec_id"), col("d"))
    },
    Some("""WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE embedding IS NOT NULL),
      e AS (
        SELECT vec_id, CAST(d.generate_series AS BIGINT) AS d,
          v[CAST(d.generate_series + 1 AS INT)] AS x
        FROM v, generate_series(0, 63) d),
      mm AS (SELECT d, min(x) AS mn, max(x) AS mx FROM e GROUP BY d),
      q AS (
        SELECT vec_id, e.d, x, mn, mx,
          CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
               ELSE CAST(least(greatest(
                 floor((x - mn) / (mx - mn) * 255.0 + 0.5), 0.0), 255.0)
                 AS BIGINT) END AS code
        FROM e JOIN mm USING (d))
      SELECT vec_id, d, code,
        round(abs(x - (mn + CAST(code AS DOUBLE) / 255.0 * (mx - mn))), 6) AS err
      FROM q ORDER BY vec_id, d"""))

  // --------------------------------------------------------------- q132
  // Asymmetric top-k over the int8 codes: full-precision queries vs the
  // corpus's reconstruction (pqSearchADC's (dist² 6-dp, n_id) ranking
  // contract with a table-free per-dimension recon). The corpus never
  // shuffles — the query batch broadcasts.
  private val q132 = Q(
    "q132_sq_search",
    (s, d) => {
      graft.ext.Similarity.sqSearch(s, Tables.embeddings(s, d),
          queryPred = col("vec_id") % 53 === 0, topK = 4)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings WHERE embedding IS NOT NULL),
      e AS (
        SELECT vec_id, CAST(d.generate_series AS BIGINT) AS d,
          v[CAST(d.generate_series + 1 AS INT)] AS x
        FROM v, generate_series(0, 63) d),
      mm AS (SELECT d, min(x) AS mn, max(x) AS mx FROM e GROUP BY d),
      rc AS (
        SELECT vec_id, d,
          mn + CAST(CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
               ELSE CAST(least(greatest(
                 floor((x - mn) / (mx - mn) * 255.0 + 0.5), 0.0), 255.0)
                 AS BIGINT) END AS DOUBLE) / 255.0 * (mx - mn) AS r
        FROM e JOIN mm USING (d)),
      rl AS (SELECT vec_id, list(r ORDER BY d) AS recon FROM rc GROUP BY vec_id),
      q AS (SELECT vec_id AS q_id, v AS vq FROM v WHERE vec_id % 53 = 0),
      pairs AS (
        SELECT q.q_id, rl.vec_id AS n_id,
          round(list_sum(list_transform(list_zip(q.vq, rl.recon),
            z -> (z[1] - z[2]) * (z[1] - z[2]))), 6) AS dist2
        FROM rl, q WHERE q.q_id <> rl.vec_id),
      ranked AS (
        SELECT q_id, n_id, dist2,
          CAST(row_number() OVER (PARTITION BY q_id
                                  ORDER BY dist2, n_id) AS BIGINT) AS rank
        FROM pairs)
      SELECT q_id, rank, n_id, dist2 FROM ranked
      WHERE rank <= 4 ORDER BY q_id, rank"""))

  // --------------------------------------------------------------- q133
  // Winnowing fingerprints (the MOSS selection): hash every 3-gram,
  // keep each 4-window's minimum (hash·8192+pos key — leftmost-min tie
  // break both engines replay). Any shared ≥6-token run between two
  // docs shares a selected fingerprint — a recall FLOOR, vs MinHash's
  // probabilistic bound. Fully narrow on the Spark side; the oracle
  // replays the O(grams·w) window scan relationally.
  // The winnowing selection CTE chain (q133's oracle up to the final
  // SELECT), shared verbatim with the winnow-candidates oracle (q136)
  // and — parameterized over the source relation — with the one-call
  // winnow-dedup oracle (q137, which winnows the exact SURVIVORS).
  private[queries] def winnowCtesFrom(src: String): String =
    s"""wd AS (
        SELECT doc_id, string_split(text, ' ') AS ws,
          CAST(least(greatest(len(string_split(text, ' ')) - 2, 0), 4096)
               AS BIGINT) AS m
        FROM $src WHERE text IS NOT NULL),
      g AS (
        SELECT doc_id, m, CAST(i.generate_series AS BIGINT) AS i,
          CAST(('0x' || substr(md5(array_to_string(
                 ws[CAST(i.generate_series AS INT) :
                    CAST(i.generate_series + 2 AS INT)], ' ')), 1, 8))
               AS BIGINT) * 8192 + i.generate_series AS key
        FROM wd, generate_series(1, 4096) i
        WHERE CAST(i.generate_series AS BIGINT) <= m),
      wm AS (
        SELECT g.doc_id, min(key) AS key
        FROM g, generate_series(1, 4096) j
        WHERE m >= 4 AND CAST(j.generate_series AS BIGINT) <= m - 3
          AND i >= CAST(j.generate_series AS BIGINT)
          AND i <= CAST(j.generate_series + 3 AS BIGINT)
        GROUP BY g.doc_id, j.generate_series),
      sel AS (SELECT DISTINCT doc_id, key FROM wm)"""

  private[queries] val winnowCtes = winnowCtesFrom("documents")

  private val q133 = Q(
    "q133_winnowing",
    (s, d) => {
      graft.ext.TextStats.winnow(Tables.documents(s, d))
        .orderBy(col("doc_id"), col("pos"))
    },
    Some(s"""WITH $winnowCtes
      SELECT doc_id, key % 8192 AS pos, key // 8192 AS fp
      FROM sel ORDER BY doc_id, pos"""))

  // --------------------------------------------------------------- q134
  // Keep-best-per-cluster dedup: q65's exact near-dup components (the
  // CTE chain is shared VERBATIM) with the survivor chosen by quality
  // (longest n_chars, doc_id tie-break) instead of smallest id — keep
  // the best copy of a duplicate group, not an arbitrary one.
  private val q134 = Q(
    "q134_dedup_keep_best",
    (s, d) => {
      graft.ext.Dedup.keepBestPerCluster(s, Tables.documents(s, d))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ${ExtQueries.clusterCtes},
      cl AS (
        SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a),
      alld AS (
        SELECT d.doc_id, d.n_chars,
          coalesce(cl.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
      rk AS (
        SELECT doc_id, n_chars, cluster_id,
          row_number() OVER (PARTITION BY cluster_id
                             ORDER BY n_chars DESC, doc_id) AS rn
        FROM alld)
      SELECT doc_id, n_chars, cluster_id, (rn = 1) AS keep
      FROM rk ORDER BY doc_id"""))

  // --------------------------------------------------------------- q135
  // Curriculum/quality decile assignment over the fixed-model
  // classifier score — bit-identical to ntile(10) OVER (ORDER BY
  // score, doc_id), but the Spark plan is the two-phase value-bucket
  // rank (Corpus.scoreBins): no single-partition global sort anywhere.
  // Shares q129's scoring CTEs VERBATIM.
  private val q135 = Q(
    "q135_quality_bins",
    (s, d) => {
      val scored = graft.ext.Classifier.qcScoreNarrow(
        Tables.documents(s, d), graft.ext.Classifier.fixedModel())
      graft.ext.Corpus.scoreBins(scored, bins = 10)
        .select(col("doc_id"), col("score"), col("bin").cast("long").as("bin"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $qcCtes,
      sc AS (
        SELECT doc_id, round(1.0 / (1.0 + exp(-logit)), 6) AS score
        FROM lg)
      SELECT doc_id, score,
        CAST(ntile(10) OVER (ORDER BY score, doc_id) AS BIGINT) AS bin
      FROM sc ORDER BY doc_id"""))

  // --------------------------------------------------------------- q136
  // Winnow-candidates: the inverted-index near-dup pair generator over
  // q133's fingerprints (CTE chain shared VERBATIM) — the recall-floor
  // complement to q52's MinHash banding, with the same boilerplate-cap
  // discipline (df > 10 fingerprints dropped from a count aggregate
  // before any posting list materializes).
  private val q136 = Q(
    "q136_winnow_candidates",
    (s, d) => {
      graft.ext.TextStats.winnowCandidates(Tables.documents(s, d))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some(s"""WITH $winnowCtes,
      fpx AS (SELECT DISTINCT doc_id, key // 8192 AS fp FROM sel),
      small AS (
        SELECT fp FROM (
          SELECT fp, count(*) AS df FROM fpx GROUP BY fp)
        WHERE df BETWEEN 2 AND 10),
      pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM fpx a
        JOIN small s ON s.fp = a.fp
        JOIN fpx b ON b.fp = a.fp AND a.doc_id < b.doc_id)
      SELECT a_id, b_id, CAST(count(*) AS BIGINT) AS n_shared
      FROM pairs GROUP BY a_id, b_id HAVING count(*) >= 2
      ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------- q137
  // One-call corpus dedup on the WINNOWING candidate generator
  // (Dedup.dedupCorpusWinnow): exact → winnow candidates → Jaccard
  // verify → components → anti join — q104's pipeline with the
  // recall-floor pair stage in the candidate seat. The oracle composes
  // the q136 candidate chain (winnowed over the exact SURVIVORS — the
  // pipeline re-fingerprints after the exact stage) with q104's
  // verify/cluster/anti-join replay VERBATIM.
  private val q137 = Q(
    "q137_dedup_corpus_winnow",
    (s, d) => {
      graft.ext.Dedup.dedupCorpusWinnow(s, Tables.documents(s, d))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ${ExtQueries.shingleCte},
      surv AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      ${winnowCtesFrom("(SELECT d2.* FROM documents d2 JOIN surv USING (doc_id))")},
      fpx AS (SELECT DISTINCT doc_id, key // 8192 AS fp FROM sel),
      smallfp AS (
        SELECT fp FROM (
          SELECT fp, count(*) AS df FROM fpx GROUP BY fp)
        WHERE df BETWEEN 2 AND 10),
      wpairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id
        FROM fpx a
        JOIN smallfp s ON s.fp = a.fp
        JOIN fpx b ON b.fp = a.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= 2),
      counts AS (
        SELECT sh.doc_id, count(*) AS n FROM sh JOIN surv USING (doc_id)
        GROUP BY sh.doc_id),
      inter AS (
        SELECT p.a_id, p.b_id, count(*) AS i
        FROM wpairs p
        JOIN sh sa ON sa.doc_id = p.a_id
        JOIN sh sb ON sb.doc_id = p.b_id AND sb.sh = sa.sh
        GROUP BY p.a_id, p.b_id),
      confirmed AS (
        SELECT p.a_id, p.b_id
        FROM wpairs p
        JOIN counts ca ON ca.doc_id = p.a_id
        JOIN counts cb ON cb.doc_id = p.b_id
        LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id
        WHERE CAST(coalesce(i.i, 0) AS DOUBLE)
              / (ca.n + cb.n - coalesce(i.i, 0)) >= 0.7),
      edges AS (
        SELECT a_id AS a, b_id AS b FROM confirmed
        UNION SELECT b_id, a_id FROM confirmed),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      labels AS (
        SELECT a AS doc_id, least(a, min(b)) AS cluster_id
        FROM reach GROUP BY a),
      dropped AS (SELECT doc_id FROM labels WHERE doc_id != cluster_id)
      SELECT d.doc_id, d.source FROM documents d
      JOIN surv USING (doc_id)
      WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
      ORDER BY d.doc_id"""))

  val qs: Seq[Q] = Seq(q120, q121, q122, q123, q124, q125, q126, q127, q128,
    q129, q130, q131, q132, q133, q134, q135, q136, q137)
}
