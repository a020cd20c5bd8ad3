package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-7 batch (q146+): corpus-curation operators around selection
  * and tokenization — greedy k-center coreset selection, BPE tokenizer
  * TRAINING (merge-rule learning, not just application), asymmetric
  * containment verification, and semantic-cluster-capped balanced
  * subsampling. Reference scope: LLM-pipeline surface (builder brief)
  * — no PUMLE counterpart.
  */
object Ext5Queries {

  // --------------------------------------------------------------- q146
  // Greedy k-center (farthest-first) coreset selection, k=8: the whole
  // greedy trajectory — seed, every argmax pick with its selection
  // distance, and the final k-center radius — replayed by an unrolled
  // 8-step CTE chain. Every distance is the same IEEE arithmetic on
  // both engines (literal centers, identical left-fold dot products —
  // the q142 fixed-centroid contract), argmaxes rank the RAW double
  // with id tie-breaks, and only the FINAL reported columns round
  // (6-dp, `+ 0.0`-normalized).
  private val KCenterK = 8

  private def kCenterOracle: String = {
    val steps = (2 to KCenterK).map { r =>
      s"""p$r AS (SELECT vec_id, md FROM m${r - 1} ORDER BY md DESC, vec_id LIMIT 1),
         |      s$r AS (SELECT q.v, q.vv FROM sq q JOIN p$r USING (vec_id)),
         |      m$r AS (SELECT m.vec_id, m.v, m.vv,
         |        least(m.md, m.vv - 2 * list_dot_product(m.v, s.v) + s.vv) AS md
         |        FROM m${r - 1} m, s$r s)""".stripMargin
    }.mkString(",\n      ")
    val sel = (2 to KCenterK)
      .map(r => s"SELECT CAST($r AS BIGINT) AS rank, vec_id, md AS sel_d2 FROM p$r")
      .mkString("\n        UNION ALL ")
    s"""WITH base AS (
        SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings),
      sq AS (SELECT vec_id, v, list_dot_product(v, v) AS vv FROM base),
      s1 AS (SELECT vec_id, v, vv FROM sq ORDER BY vec_id LIMIT 1),
      m1 AS (SELECT q.vec_id, q.v, q.vv,
        q.vv - 2 * list_dot_product(q.v, s.v) + s.vv AS md
        FROM sq q, s1 s),
      $steps,
      rad AS (SELECT max(md) AS r2 FROM m$KCenterK),
      sel AS (
        SELECT CAST(1 AS BIGINT) AS rank, vec_id, 0.0 AS sel_d2 FROM s1
        UNION ALL $sel)
      SELECT rank, vec_id, round(sel_d2, 6) + 0.0 AS sel_d2,
        round((SELECT r2 FROM rad), 6) + 0.0 AS radius2
      FROM sel ORDER BY rank"""
  }

  private val q146 = Q(
    "q146_kcenter_coreset",
    (s, d) => graft.ext.Clustering.kCenter(s, Tables.embeddings(s, d), KCenterK),
    Some(kCenterOracle))

  // --------------------------------------------------------------- q147
  // BPE tokenizer TRAINING, 8 merge steps — the existing spec-pinned
  // TextStats.bpeTrain (vocab-bounded histogram iterations) now
  // oracle-checked end to end: per step the weighted adjacent-pair
  // census over the DISTINCT-WORD table, the (count DESC, pair ASC)
  // argmax (equivalent to the impl's (n, l, r) tuple order — the space
  // separator sorts below every symbol character), and the greedy
  // left-to-right merge, which the oracle replays as a space-padded
  // `replace` per step. All integers and strings — the learned merge
  // table hash-checks with no rounding discipline.
  private val BpeSteps = 8

  /** The shared 8-step merge-learning CTE chain (`wd`/`vc`/`v0` +
    * per-step `w_i, p_i, c_i, b_i, v_i`): `b_i` is step i's winning
    * pair, `v_i` the vocabulary after applying it via a `list_reduce`
    * that replays the trainer's pending-symbol fold EXACTLY — greedy
    * left-to-right non-overlapping. (A single space-padded `replace`
    * is NOT that fold: adjacent occurrences share one separator space,
    * so `replace(' a a a a ', ' a a ', ' aa ')` leaves ' aa a a ', and
    * even iterating to a fixed point mis-orders odd self-pair runs —
    * 'aaaaa' becomes [aa,a,aa] where the fold gives [aa,aa,a] —
    * corrupting the next step's pair census. The fold merges iff the
    * accumulator's LAST symbol equals lhs; a merge product lhs||rhs is
    * strictly longer than lhs so it can never false-positive, making
    * the reduce bit-equal to the trainer's (acc, pending) scan.)
    * `v_i` carries the raw word `w` so consumers (q150) can join the
    * trained vocabulary back onto the corpus. */
  private def bpeMergeCtes: String = {
    val cap = graft.functions.MinHash48.MaxShinglePos
    val steps = (1 to BpeSteps).map { i =>
      s"""w$i AS (SELECT string_split(trim(sym), ' ') AS ws, freq FROM v${i - 1}),
         |      p$i AS (
         |        SELECT ws[CAST(g.generate_series AS INT)] || ' ' ||
         |          ws[CAST(g.generate_series AS INT) + 1] AS pair, freq
         |        FROM w$i, generate_series(1, $cap) g
         |        WHERE len(ws) >= 2 AND g.generate_series <= len(ws) - 1),
         |      c$i AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
         |        FROM p$i GROUP BY pair),
         |      b$i AS (SELECT pair, cnt FROM c$i ORDER BY cnt DESC, pair LIMIT 1),
         |      bx$i AS (SELECT string_split(pair, ' ')[1] AS lhs,
         |          string_split(pair, ' ')[2] AS rhs FROM b$i),
         |      v$i AS (SELECT w,
         |          list_reduce(string_split(trim(sym), ' '),
         |            (acc, x) -> CASE WHEN x = b.rhs
         |                AND (acc = b.lhs OR ends_with(acc, ' ' || b.lhs))
         |              THEN left(acc, len(acc) - len(b.lhs)) || b.lhs || b.rhs
         |              ELSE acc || ' ' || x END) AS sym, freq
         |        FROM v${i - 1}, bx$i b)""".stripMargin
    }.mkString(",\n      ")
    s"""wd AS (
        SELECT unnest((string_split(text, ' '))[1:$cap]) AS w
        FROM documents WHERE text IS NOT NULL),
      vc AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM wd
        WHERE len(w) >= 1 GROUP BY w),
      v0 AS (SELECT w, ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' '
          AS sym, freq FROM vc),
      $steps"""
  }

  private def bpeTrainOracle: String = {
    val sel = (1 to BpeSteps)
      .map(i => s"SELECT CAST($i AS BIGINT) AS step, pair, cnt FROM b$i")
      .mkString("\n        UNION ALL ")
    s"""WITH $bpeMergeCtes,
      sel AS ($sel)
      SELECT step, string_split(pair, ' ')[1] AS lhs,
        string_split(pair, ' ')[2] AS rhs, cnt AS pair_count,
        replace(pair, ' ', '') AS new_token
      FROM sel ORDER BY step"""
  }

  private val q147 = Q(
    "q147_bpe_train",
    (s, d) => {
      import s.implicits._
      graft.ext.TextStats.bpeTrain(Tables.documents(s, d), nMerges = BpeSteps)
        .map { case (st, l, r, m, n) => (st.toLong, l, r, n, m) }
        .toDF("step", "lhs", "rhs", "pair_count", "new_token")
        .orderBy(col("step"))
    },
    Some(bpeTrainOracle))

  // --------------------------------------------------------------- q148
  // Asymmetric containment over the LSH candidate pairs: q72's exact
  // CTE chain (shingles → 48-bit minhash signatures → capped band
  // buckets → candidate pairs → set intersection) extended with BOTH
  // per-direction containment ratios in the exact integer 6-dp ratio6
  // discipline; pairs kept when either direction ≥ 0.5 — the
  // quote/subset detector Jaccard verification misses.
  private val q148 = Q(
    "q148_containment",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = graft.ext.Dedup.lshCandidates(s, docs)
      graft.ext.Dedup.containment(s, pairs, docs, threshold = 0.5)
        .orderBy(col("a_id"), col("b_id"))
    },
    Some(s"""WITH ${ExtQueries.shingleCte},
      h AS (SELECT doc_id, CAST(('0x' || substr(md5(sh),1,12)) AS BIGINT) AS h48 FROM sh),
      sig AS (
        SELECT doc_id,
          min(xor(h48, ${ExtQueries.salts(0)})) AS m0,
          min(xor(h48, ${ExtQueries.salts(1)})) AS m1,
          min(xor(h48, ${ExtQueries.salts(2)})) AS m2,
          min(xor(h48, ${ExtQueries.salts(3)})) AS m3
        FROM h GROUP BY doc_id),
      buckets AS (
        SELECT doc_id, 0 AS band, m0 AS bucket FROM sig UNION ALL
        SELECT doc_id, 1, m1 FROM sig UNION ALL
        SELECT doc_id, 2, m2 FROM sig UNION ALL
        SELECT doc_id, 3, m3 FROM sig),
      small AS (
        SELECT doc_id, band, bucket FROM (
          SELECT doc_id, band, bucket,
                 count(*) OVER (PARTITION BY band, bucket) AS bsize
          FROM buckets)
        WHERE bsize <= 10),
      pairs AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM small a JOIN small b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT p.a_id, p.b_id, count(*) AS i
        FROM pairs p
        JOIN sh sa ON sa.doc_id = p.a_id
        JOIN sh sb ON sb.doc_id = p.b_id AND sb.sh = sa.sh
        GROUP BY p.a_id, p.b_id),
      scored AS (
        SELECT p.a_id, p.b_id,
          CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
          CAST(coalesce(i.i, 0) AS BIGINT) AS n_inter,
          -- exact half-up 6-dp of the true rational in integer space
          -- (the Spark side's ratio6 discipline)
          CAST((2 * coalesce(i.i, 0) * 1000000 + ca.n)
               // (2 * ca.n) AS DOUBLE) / 1000000.0 AS c_ab,
          CAST((2 * coalesce(i.i, 0) * 1000000 + cb.n)
               // (2 * cb.n) AS DOUBLE) / 1000000.0 AS c_ba
        FROM pairs p
        JOIN counts ca ON ca.doc_id = p.a_id
        JOIN counts cb ON cb.doc_id = p.b_id
        LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id)
      SELECT a_id, b_id, n_a, n_b, n_inter, c_ab, c_ba FROM scored
      WHERE greatest(c_ab, c_ba) >= 0.5 ORDER BY a_id, b_id"""))

  // --------------------------------------------------------------- q149
  // Semantic-cluster-capped balanced subsampling: q142's fixed-grid
  // coarse assignment (literal md5-derived centroids, lexicographic
  // (dist², centroid) argmin — the same CTEs verbatim) followed by a
  // per-cluster rank with a cap of 16 — every row reported with its
  // rank and keep verdict, all integers/booleans.
  private val q149 = Q(
    "q149_cluster_cap",
    (s, d) => graft.ext.Sampling.clusterCap(s, Tables.embeddings(s, d),
      k = 16, cap = 16),
    Some("""WITH cgrid AS (
        SELECT CAST(j.generate_series AS BIGINT) AS j, d.generate_series AS d,
          CAST(CAST(('0x' || substr(md5('sc:' || j.generate_series || ':'
            || d.generate_series), 1, 6)) AS BIGINT) % 2001 - 1000 AS DOUBLE)
            / 1000.0 AS x
        FROM generate_series(0, 15) j, generate_series(0, 63) d),
      cents AS (SELECT j, list(x ORDER BY d) AS cw FROM cgrid GROUP BY j),
      base AS (
        SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings),
      dist AS (
        SELECT b.vec_id, c.j,
          list_dot_product(b.v, b.v) - 2 * list_dot_product(b.v, c.cw)
            + list_dot_product(c.cw, c.cw) AS d2
        FROM base b, cents c),
      asg AS (
        SELECT vec_id, j AS centroid FROM (
          SELECT vec_id, j,
            row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rk
          FROM dist) WHERE rk = 1),
      ranked AS (
        SELECT vec_id, centroid,
          CAST(row_number() OVER (PARTITION BY centroid ORDER BY vec_id)
            AS BIGINT) AS rk
        FROM asg)
      SELECT vec_id, centroid, rk, rk <= 16 AS kept
      FROM ranked ORDER BY vec_id"""))

  // --------------------------------------------------------------- q150
  // Tokenizer lifecycle roundtrip: train 8 merges on the corpus, then
  // encode the SAME corpus through the trained vocabulary and report
  // per-source compression — n_docs, words, tokens, chars, and
  // tokens-per-word (exact integer 6-dp ratio6). Encoding the training
  // corpus is a vocab JOIN + size(syms) — the final per-distinct-word
  // symbol table IS the encoding, so no per-row merge loop runs
  // (bpeEncodeFast stays the path for unseen text). The oracle replays
  // the identical 8 learning steps and reads token counts off v8.
  //
  // 100 TB shape: one corpus pass builds the word histogram, the
  // iterations are vocab-bounded, and the encode is one shuffle join
  // on the SAME key (w) the histogram grouped by, followed by
  // partial-aggregable per-source sums.
  private val q150 = Q(
    "q150_tokenizer_roundtrip",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val (_, vocab) = graft.ext.TextStats.bpeTrainVocab(docs, nMerges = BpeSteps)
      val words = docs.filter(col("text").isNotNull)
        .select(col("source"), explode(expr(
          s"slice(split(text, ' '), 1, ${graft.functions.MinHash48.MaxShinglePos})")).as("w"))
      val per = words.join(vocab, Seq("w"))
        .select(col("source"), size(col("syms")).cast("long").as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
      val ds = docs.filter(col("text").isNotNull)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      ds.join(per, Seq("source"))
        .withColumn("tokens_per_word",
          graft.ext.Dedup.ratio6(col("n_tokens"), col("n_words")))
        .orderBy(col("source"))
    },
    Some(s"""WITH $bpeMergeCtes,
      wd2 AS (
        SELECT source,
          unnest((string_split(text, ' '))[1:${graft.functions.MinHash48.MaxShinglePos}]) AS w
        FROM documents WHERE text IS NOT NULL),
      enc AS (
        SELECT d.source,
          CAST(len(string_split(trim(v.sym), ' ')) AS BIGINT) AS n_tok
        FROM wd2 d JOIN v$BpeSteps v USING (w)),
      per AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_words,
          CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM enc GROUP BY source),
      ds AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents WHERE text IS NOT NULL GROUP BY source)
      SELECT ds.source, n_docs, n_words, n_tokens, n_chars,
        CAST((2 * n_tokens * 1000000 + n_words)
             // (2 * n_words) AS DOUBLE) / 1000000.0 AS tokens_per_word
      FROM ds JOIN per USING (source) ORDER BY ds.source"""))

  // --------------------------------------------------------------- q151
  // Dedup savings report: what near-dup dedup would actually RECLAIM,
  // per source — doc and token counts of the non-survivor cluster
  // members (q65's exact clustering, CTE chain shared verbatim) against
  // the per-source totals, with the reclaimed-token fraction in exact
  // integer 6-dp ratio6. The go/no-go measurement run before committing
  // a corpus-wide dedup pass.
  //
  // 100 TB shape: everything rides q65's candidate-bounded machinery;
  // the report itself is one left-semi join (dropped ids are the small
  // side) + two partial-aggregable per-source rollups.
  private val q151 = Q(
    "q151_dedup_savings",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = graft.ext.Dedup.lshCandidates(s, docs)
      val dropped = graft.ext.Dedup.clusters(s, pairs)
        .filter(col("node") =!= col("cluster_id"))
        .select(col("node").as("doc_id"))
      val tok = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      val dup = tok.join(dropped, Seq("doc_id"), "left_semi")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("dup_docs"), sum(col("n_tok")).as("dup_tokens"))
      val tot = tok.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      tot.join(dup, Seq("source"), "left")
        .na.fill(0L, Seq("dup_docs", "dup_tokens"))
        .withColumn("savings",
          graft.ext.Dedup.ratio6(col("dup_tokens"), col("n_tokens")))
        .orderBy(col("source"))
    },
    Some(s"""WITH RECURSIVE ${ExtQueries.clusterCtes},
      labels AS (SELECT a AS doc_id, least(a, min(b)) AS cl
        FROM reach GROUP BY a),
      dropped AS (SELECT doc_id FROM labels WHERE cl <> doc_id),
      tok AS (
        SELECT doc_id, source,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents WHERE text IS NOT NULL),
      dup AS (
        SELECT source, CAST(count(*) AS BIGINT) AS dup_docs,
          CAST(sum(n_tok) AS BIGINT) AS dup_tokens
        FROM tok JOIN dropped USING (doc_id) GROUP BY source),
      tot AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM tok GROUP BY source)
      SELECT t.source, n_docs, n_tokens,
        coalesce(dup_docs, CAST(0 AS BIGINT)) AS dup_docs,
        coalesce(dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
        CAST((2 * coalesce(dup_tokens, 0) * 1000000 + n_tokens)
             // (2 * n_tokens) AS DOUBLE) / 1000000.0 AS savings
      FROM tot t LEFT JOIN dup USING (source) ORDER BY t.source"""))

  // --------------------------------------------------------------- q152
  // Persisted-incremental dedup on the WINNOWING index — q103's
  // crawl-increment shape (exact anti-join on the snapshot's hashes,
  // new↔seen candidates only, seen text scanned zero times) with the
  // recall-floor fingerprint generator in the blocking seat: new↔seen
  // pairs sharing ≥2 fingerprints, boilerplate fps (seen-side df > 10)
  // dropped from a count aggregate first, then the standard shingle
  // Jaccard ≥ 0.7 verify. The oracle winnows all docs once (q133's CTE
  // chain verbatim), splits fingerprints by side, and replays the
  // cap/candidate/verify stages.
  private val q152 = Q(
    "q152_incremental_winnow",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val seen = docs.filter(col("doc_id") % 3 =!= 0)
      val fresh = docs.filter(col("doc_id") % 3 === 0)
      // materialized once (production: writeWinnowSnapshot → parquet);
      // the checkpoint stands in for that artifact
      val snapshot = graft.ext.Dedup.winnowSnapshot(s, seen)
        .localCheckpoint(true)
      graft.ext.Dedup.dedupIncrementalWinnow(s, fresh, snapshot)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH ${ExtQueries.shingleCte},
      ${Ext3Queries.winnowCtes},
      notexact AS (
        SELECT n.* FROM documents n
        WHERE n.doc_id % 3 = 0 AND NOT EXISTS (
          SELECT 1 FROM documents s
          WHERE s.doc_id % 3 != 0 AND md5(s.text) = md5(n.text))),
      fpx AS (SELECT DISTINCT doc_id, key // 8192 AS fp FROM sel),
      fpn AS (SELECT ne.doc_id AS new_id, fp
        FROM fpx JOIN notexact ne USING (doc_id)),
      fpseen AS (SELECT doc_id AS seen_id, fp FROM fpx WHERE doc_id % 3 != 0),
      smallfp AS (
        SELECT fp FROM (SELECT fp, count(*) AS df FROM fpseen GROUP BY fp)
        WHERE df <= 10),
      cand AS (
        SELECT new_id, seen_id FROM fpn
        JOIN smallfp USING (fp) JOIN fpseen USING (fp)
        GROUP BY new_id, seen_id HAVING count(*) >= 2),
      counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT c.new_id, c.seen_id, count(*) AS i
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.new_id
        JOIN sh sb ON sb.doc_id = c.seen_id AND sb.sh = sa.sh
        GROUP BY c.new_id, c.seen_id),
      neardup AS (
        SELECT DISTINCT c.new_id
        FROM cand c
        JOIN counts ca ON ca.doc_id = c.new_id
        JOIN counts cb ON cb.doc_id = c.seen_id
        LEFT JOIN inter i ON i.new_id = c.new_id AND i.seen_id = c.seen_id
        WHERE CAST(coalesce(i.i, 0) AS DOUBLE)
              / (ca.n + cb.n - coalesce(i.i, 0)) >= 0.7)
      SELECT doc_id, lang, source FROM notexact
      WHERE doc_id NOT IN (SELECT new_id FROM neardup)
      ORDER BY doc_id"""))

  // --------------------------------------------------------------- q153
  // In-cluster k-NN graph: each vector's top-3 cosine neighbors among
  // its fixed-grid cluster (q142's assignment CTEs verbatim; q54's
  // 4-dp-rounded-cosine + id-tie ranking contract) — the graph
  // SemDeDup-style pipelines and graph coresets consume. Singleton
  // clusters emit no rows on either engine.
  private val q153 = Q(
    "q153_knn_graph",
    (s, d) => graft.ext.Similarity.knnGraph(s, Tables.embeddings(s, d), k = 3)
      .orderBy(col("a_id"), col("rank")),
    Some("""WITH cgrid AS (
        SELECT CAST(j.generate_series AS BIGINT) AS j, d.generate_series AS d,
          CAST(CAST(('0x' || substr(md5('sc:' || j.generate_series || ':'
            || d.generate_series), 1, 6)) AS BIGINT) % 2001 - 1000 AS DOUBLE)
            / 1000.0 AS x
        FROM generate_series(0, 15) j, generate_series(0, 63) d),
      cents AS (SELECT j, list(x ORDER BY d) AS cw FROM cgrid GROUP BY j),
      base AS (
        SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings),
      nrm AS (
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base),
      dist AS (
        SELECT b.vec_id, c.j,
          list_dot_product(b.v, b.v) - 2 * list_dot_product(b.v, c.cw)
            + list_dot_product(c.cw, c.cw) AS d2
        FROM base b, cents c),
      asg AS (
        SELECT vec_id, j AS centroid FROM (
          SELECT vec_id, j,
            row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rk
          FROM dist) WHERE rk = 1),
      pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id, aa.centroid,
          round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) + 0.0
            AS cosine
        FROM nrm a JOIN asg aa ON aa.vec_id = a.vec_id
        JOIN asg ab ON ab.centroid = aa.centroid
        JOIN nrm b ON b.vec_id = ab.vec_id AND a.vec_id <> b.vec_id),
      ranked AS (
        SELECT a_id, b_id, centroid, cosine,
          CAST(row_number() OVER (PARTITION BY a_id
                                  ORDER BY cosine DESC, b_id) AS BIGINT)
            AS rank
        FROM pairs)
      SELECT a_id, rank, b_id, centroid, cosine FROM ranked
      WHERE rank <= 3 ORDER BY a_id, rank"""))

  // --------------------------------------------------------------- q154
  // Cross-modal label-stratification audit: text table joined to the
  // embeddings' labels on doc_id = vec_id; per source, label count,
  // majority fraction (exact 6-dp ratio6), and label entropy in q89's
  // exact-DECIMAL discipline — the "is every source stratified the
  // same way" check run before a split trusts `source` as a blocking
  // key. (A length-vs-norm correlation was rejected here: the
  // embeddings are unit-normalized, making that statistic 0/0 by
  // construction.)
  private val q154 = Q(
    "q154_label_balance",
    (s, d) => graft.ext.Corpus.labelBalance(
      Tables.documents(s, d),
      Tables.embeddings(s, d).select(col("vec_id").as("doc_id"), col("label"))),
    Some("""WITH j AS (
        SELECT d.source, e.label
        FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        WHERE d.text IS NOT NULL),
      lc AS (SELECT source, label, count(*) AS c FROM j GROUP BY source, label),
      agg AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS n,
          count(*) AS n_labels, CAST(max(c) AS BIGINT) AS maxc,
          sum(CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9)) * c) AS s
        FROM lc GROUP BY source)
      SELECT source, n, n_labels,
        CAST((2 * maxc * 1000000 + n) // (2 * n) AS DOUBLE) / 1000000.0
          AS majority_frac,
        round(round(ln(CAST(n AS DOUBLE)), 9)
          - CAST(s AS DOUBLE) / n, 6) + 0.0 AS label_entropy
      FROM agg ORDER BY source"""))

  // --------------------------------------------------------------- q155
  // Histogram quantiles for a CONTINUOUS column — per-label p50/p90/p99
  // of each embedding's min dist² to the fixed centroid grid (q142's
  // assignment distances), through 256 equi-width dyadic bins over
  // [0, 64) and q144's pure-integer rank condition. The exact
  // order-statistic path (q144) degenerates on continuous doubles
  // (every value distinct → the "bounded" count table is the corpus);
  // binning restores the |groups|×256 bound at a declared 0.25
  // resolution. Bin indices and reported edges are exact IEEE dyadic
  // arithmetic — zero rounding discipline.
  private val q155 = Q(
    "q155_dist_quantiles",
    (s, d) => {
      // compiled centroid_min_d2 over the fixed grid instead of the
      // interpreted array_min(transform(...)) HOF — the lambda form
      // paid ~48 interpreted dot64 closures per row (16 centroids × 3
      // dots); arithmetic is bit-identical (same sequential folds,
      // same combine order, array_min's NaN-greatest min)
      val model = graft.functions.CentroidModelRef(
        graft.ext.Similarity.fixedCentroids(16, 64).zipWithIndex
          .map { case (cw, j) => (j.toLong, cw, 0.0) })
      graft.functions.CentroidMinD2.register(s, model)
      val base = Tables.embeddings(s, d)
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("d2", expr("centroid_min_d2(v)"))
        .select(col("label"), col("d2"))
      graft.ext.Corpus.histQuantiles(base, col("d2"), "label",
        lo = 0.0, width = 0.25, bins = 256, ps = Seq(50, 90, 99))
    },
    Some("""WITH cgrid AS (
        SELECT CAST(j.generate_series AS BIGINT) AS j, d.generate_series AS d,
          CAST(CAST(('0x' || substr(md5('sc:' || j.generate_series || ':'
            || d.generate_series), 1, 6)) AS BIGINT) % 2001 - 1000 AS DOUBLE)
            / 1000.0 AS x
        FROM generate_series(0, 15) j, generate_series(0, 63) d),
      cents AS (SELECT j, list(x ORDER BY d) AS cw FROM cgrid GROUP BY j),
      base AS (
        SELECT vec_id, label,
          list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
        FROM embeddings),
      dist AS (
        SELECT b.vec_id, b.label,
          list_dot_product(b.v, b.v) - 2 * list_dot_product(b.v, c.cw)
            + list_dot_product(c.cw, c.cw) AS d2
        FROM base b, cents c),
      mind AS (
        SELECT vec_id, label, min(d2) AS d2 FROM dist GROUP BY vec_id, label),
      binned AS (
        SELECT label,
          CAST(least(greatest(floor(d2 / 0.25), 0), 255) AS BIGINT) AS b
        FROM mind),
      bc AS (SELECT label, b, count(*) AS c FROM binned GROUP BY label, b),
      cum AS (
        SELECT label, b, c,
          sum(c) OVER (PARTITION BY label ORDER BY b) AS cum,
          sum(c) OVER (PARTITION BY label) AS n
        FROM bc)
      SELECT label, CAST(max(n) AS BIGINT) AS n,
        min(CASE WHEN 100 * cum >= 50 * n THEN (b + 1) * 0.25 END) AS p50,
        min(CASE WHEN 100 * cum >= 90 * n THEN (b + 1) * 0.25 END) AS p90,
        min(CASE WHEN 100 * cum >= 99 * n THEN (b + 1) * 0.25 END) AS p99
      FROM cum GROUP BY label ORDER BY label"""))

  val qs: Seq[Q] = Seq(q146, q147, q148, q149, q150, q151, q152, q153, q154,
    q155)
}
