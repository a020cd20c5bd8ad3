package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-14 batch (q175+): the trained multinomial Naive Bayes
  * classifier family ([[graft.ext.Classifier]] NB section) — trained
  * language-ID / domain attribution beside the heuristic q56 scorer
  * and the binary q129 quality classifier. The family's point for the
  * correctness gate: NB is the classifier whose TRAINING is exact
  * count arithmetic, so the trained model itself (not just a fixed
  * demo model, q129's concession) replays in pure SQL — the oracle
  * checks train AND score end to end.
  *
  * vocabSize is 24 against the synthetic corpus's 31 distinct tokens,
  * so the fully-tie-broken top-K truncation BITES (7 tokens land
  * out-of-vocabulary) and the OOV-drop scoring path is exercised, not
  * just declared.
  */
object Ext7Queries {

  private val VocabSize = 24

  /** Shared oracle CTE block: the trained dense model. Mirrors
    * [[graft.ext.Classifier.nbModelFrames]] hop for hop — top-K vocab
    * (count DESC, token ASC), per-(label, token) counts over vocab
    * occurrences only, add-one smoothing over (label total + V). */
  private val modelCtes =
    s"""wd AS (
      SELECT lang AS label, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL),
    hist AS (SELECT w, count(*) AS cu FROM wd GROUP BY w),
    vocab AS (SELECT w FROM hist ORDER BY cu DESC, w LIMIT $VocabSize),
    vsz AS (SELECT count(*) AS v FROM vocab),
    labels AS (SELECT DISTINCT label FROM wd),
    cnt AS (SELECT label, w, count(*) AS c FROM wd JOIN vocab USING (w)
            GROUP BY label, w),
    tot AS (SELECT label, sum(c) AS tot FROM cnt GROUP BY label)"""

  // --------------------------------------------------------------- q175
  // The TRAINED model as the query result: one row per (label, vocab
  // token) with the smoothed count and round(ln((c+1)/(tot+V)), 9).
  // An engine disagreeing anywhere in training — tokenization, the
  // tie-broken truncation, smoothing, rounding — fails this row before
  // any classification happens.
  private val q175 = Q(
    "q175_nb_model",
    (s, d) => {
      graft.ext.Classifier.nbModel(Tables.documents(s, d),
          labelCol = "lang", vocabSize = VocabSize)
        .orderBy(col("label"), col("token"))
    },
    Some(s"""WITH $modelCtes
      SELECT l.label, v.w AS token, coalesce(c.c, 0) AS c,
        round(ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
                 / CAST(coalesce(t.tot, 0) + z.v AS DOUBLE)), 9) AS ll
      FROM vocab v
      CROSS JOIN labels l
      LEFT JOIN cnt c ON c.label = l.label AND c.w = v.w
      LEFT JOIN tot t ON t.label = l.label, vsz z
      ORDER BY l.label, token"""))

  /** Shared q176 oracle (q177/q178 reuse it VERBATIM): train + argmax
    * classification. Totals stay exact DECIMAL(18,9) sums end to end
    * (order-free), the argmax orders on the EXACT totals with the
    * ascending-label tie-break, and only the winning score rounds to
    * 6 dp at the edge. */
  private val classifyOracle = Some(s"""WITH $modelCtes,
    dense AS (
      SELECT l.label, v.w AS token,
        CAST(round(ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE)
             / CAST(coalesce(t.tot, 0) + z.v AS DOUBLE)), 9)
          AS DECIMAL(18,9)) AS ll
      FROM vocab v
      CROSS JOIN labels l
      LEFT JOIN cnt c ON c.label = l.label AND c.w = v.w
      LEFT JOIN tot t ON t.label = l.label, vsz z),
    pri AS (
      SELECT lang AS label, count(*) AS n FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL GROUP BY 1),
    prior AS (
      SELECT label,
        CAST(round(ln(CAST(n AS DOUBLE) / CAST(t.nt AS DOUBLE)), 9)
          AS DECIMAL(18,9)) AS lp
      FROM pri, (SELECT sum(n) AS nt FROM pri) t),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents WHERE text IS NOT NULL),
    sums AS (
      SELECT t.doc_id, d.label, sum(d.ll) AS s
      FROM toks t JOIN dense d ON d.token = t.w
      GROUP BY t.doc_id, d.label),
    scored AS (
      SELECT dd.doc_id, p.label,
        p.lp + coalesce(s.s, CAST(0 AS DECIMAL(18,9))) AS total
      FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) dd
      CROSS JOIN prior p
      LEFT JOIN sums s ON s.doc_id = dd.doc_id AND s.label = p.label),
    r AS (
      SELECT doc_id, label, total,
        row_number() OVER (PARTITION BY doc_id
                           ORDER BY total DESC, label) AS rn
      FROM scored)
    SELECT doc_id, label AS pred, round(CAST(total AS DOUBLE), 6) AS score
    FROM r WHERE rn = 1 ORDER BY doc_id""")

  // --------------------------------------------------------------- q176
  // Train-and-classify in one query (the relational/oracle shape —
  // every intermediate SQL-visible): argmax label per doc. This is the
  // ORACLE form; q177 is what production runs.
  private val q176 = Q(
    "q176_nb_classify",
    (s, d) => {
      graft.ext.Classifier.nbClassify(s, Tables.documents(s, d),
          labelCol = "lang", vocabSize = VocabSize)
        .orderBy(col("doc_id"))
    },
    classifyOracle)

  // --------------------------------------------------------------- q177
  // The compiled-narrow twin on q176's exact parameters, sharing q176's
  // oracle VERBATIM: trainNbModel collects the same dense tables into
  // the nb_classify reference object (exact 10⁻⁹ integer units), and
  // the scorer is one narrow pass — zero joins, zero shuffles beyond
  // the output orderBy. The q96/q119 oracle-twin pattern applied to
  // classification.
  private val q177 = Q(
    "q177_nb_classify_narrow",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = graft.ext.Classifier.trainNbModel(docs,
        labelCol = "lang", vocabSize = VocabSize)
      graft.ext.Classifier.nbClassifyNarrow(s, docs, model)
        .orderBy(col("doc_id"))
    },
    classifyOracle) // q176's oracle VERBATIM

  // --------------------------------------------------------------- q178
  // Classification through a PERSISTED model (write → load → narrow
  // score), sharing q176's oracle VERBATIM — the q116/q156 lifecycle
  // pattern applied to the classifier: train once on the reference
  // corpus, reload and score every crawl increment after. The nano
  // units round-trip parquet exactly, so disk ≡ in-memory ≡ relational.
  private val q178 = Q(
    "q178_nb_model_indexed",
    (s, d) => {
      val dir = Ext6Queries.Fixtures.dir("nbmodel", d) { p =>
        graft.ext.Classifier.writeNbModel(s,
          graft.ext.Classifier.trainNbModel(Tables.documents(s, d),
            labelCol = "lang", vocabSize = VocabSize), p)
      }
      graft.ext.Classifier.nbClassifyNarrow(s,
          Tables.documents(s, d), graft.ext.Classifier.loadNbModel(s, dir))
        .orderBy(col("doc_id"))
    },
    classifyOracle) // q176's oracle VERBATIM

  val qs: Seq[Q] = Seq(q175, q176, q177, q178)
}
