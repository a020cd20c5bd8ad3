#!/usr/bin/env python3
"""One-off sf1 bench artifact -> BENCH_sf1.md.

At sf0.1 most suite queries sit on Spark's fixed per-query scheduling
floor (~0.3-1s), so per-query Spark/DuckDB ratios carry little plan
signal. This tool scales the DOCUMENTS axis 10x (= sf1 by the
generator's linear doc scaling: 500 @ sf0.01 -> 5,000 @ sf0.1 ->
50,000 here) and re-times the heaviest text/dedup queries on both
engines over the SAME parquet.

Corpus shape: replica 0 is sf0.1 verbatim; replicas 1..9 shift doc_id
by k*10^7 and append a per-replica marker token to the text. Each base
doc therefore gains 9 NEAR-duplicates (one-token diff, shingle jaccard
~0.9+), the realistic crawl shape — plain replication would make every
doc an exact copy, which collapses the dedup stack into its
degenerate-equality fast path and under-reports verify cost.

Usage: python3 tools/bench_sf1.py [--skip-build] [--runs N]
Writes /tmp/sf1/*.parquet (other tables symlinked from sf0.1),
expects `sbt` on PATH, emits BENCH_sf1.md in the repo root.

RUN ON A QUIET MACHINE. The first round-6 run recorded q72 at 489s
(clean: ~12s) because a concurrent `sbt test` shared the 32 cores —
min-of-N does not save you when every shot is contended. Each engine's
per-query min/max spread is printed and written to the artifact so a
contaminated run is at least self-evident.
"""
import argparse, json, os, re, subprocess, sys, time

import duckdb

import calibration

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/sf1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# the heaviest text/dedup queries at sf0.1 (bench.json order) + the
# two BPE encode forms (the chain-vs-compiled scale story)
QUERIES = ["q52_lsh_candidates", "q65_dedup_clusters", "q72_verify_candidates",
           "q85_simhash_neardup", "q88_dup_span_frac", "q93_quality_gate",
           "q94_minhash_calibration", "q96_quality_gate_narrow",
           "q97_source_leakage", "q100_bpe_encode", "q101_bpe_encode_fast",
           # round-6 document-axis additions: star CC (shares q65's
           # recursive oracle), persisted-incremental dedup, chunking,
           # dup profile, top terms. q104_dedup_corpus (one-call dedup)
           # is deliberately ABSENT: its single-query DuckDB replay
           # (shingles + banding + verify + recursive CC in one plan)
           # exhausted 78 GB of spill at sf1 and aborted, while Spark
           # runs the same end-to-end semantics in ~4.8s — recorded in
           # BENCH_sf1.md's Analysis instead of a table row.
           "q102_star_components", "q103_incremental_dedup",
           "q108_chunk_overlap", "q113_dup_profile", "q115_top_terms",
           # round-6 q120+ additions on the document axis: leakage-free
           # cluster split (rides the q65 recursive-CC oracle), DSIR
           # relational + compiled-narrow twins, contamination ladder.
           # q120-q122 are embeddings-axis (not scaled here) and are
           # deliberately absent.
           "q123_cluster_split", "q124_dsir_weight", "q125_contam_ladder",
           "q126_dsir_narrow",
           # q129+ document-axis additions: qc classifier relational +
           # compiled-narrow twins, winnowing fingerprints, keep-best
           # dedup (rides the q65 recursive-CC oracle), quality deciles.
           # q131/q132 are embeddings-axis and deliberately absent.
           "q129_qc_score", "q130_qc_narrow", "q133_winnowing",
           "q134_dedup_keep_best", "q135_quality_bins",
           # round-7 document-axis additions: winnow candidate pairs and
           # the one-call winnow dedup (winnow chain + verify + recursive
           # CC composed — the q104-shape replay; may DNF on spill, which
           # is recorded as a row, not a crash)
           "q136_winnow_candidates", "q137_dedup_corpus_winnow",
           # round-7 sketch family (document axis): HLL distinct, CMS
           # heavy hitters, Bloom decontamination relational + compiled
           # narrow twins. q142 is embeddings-axis and deliberately
           # absent.
           "q138_hll_distinct", "q139_cms_heavy_hitters",
           "q140_bloom_decontam", "q141_bloom_narrow",
           "q143_robust_outliers", "q144_length_percentiles",
           "q145_source_similarity",
           # round-7 curation batch (document axis): BPE trainer,
           # containment verification, tokenizer train+encode roundtrip.
           # q146/q149 are embeddings-axis and deliberately absent.
           "q147_bpe_train", "q148_containment", "q150_tokenizer_roundtrip",
           "q151_dedup_savings", "q152_incremental_winnow",
           # round-8: the DSIR score-only steady-state twin (document
           # axis; q153-q156/q158 are embeddings-axis and deliberately
           # absent — the sf1 build scales only the documents table)
           "q157_dsir_score_only",
           # round-9: the indexed winnow increment and its merged-shard
           # twin (both document-axis; the Fixtures memo builds each
           # index once, so shots 2..n time the increment alone)
           "q160_incremental_winnow_indexed", "q163_winnow_index_merged",
           # round-10: the IVF+PQ indexed search and the ANN-blocked
           # near-dup pairs. Both are EMBEDDINGS-axis and this build
           # scales documents only, so their sf1/sf0.1 ratios sit ≈1×;
           # the rows exist so the production ANN layout appears in
           # every stress table (their real scale evidence is
           # BENCH_sfe's 200k decade + the Decade3Probe 2M section)
           "q164_ivf_pq_indexed", "q165_near_dup_ann",
           # round-11 document-axis additions: repeated spans (now on
           # hashed gram keys, like q88), the packed-Hamming banding
           # fixture (the perceptual-hash dedup machinery), URL
           # canonicalization + the per-domain dup profile
           "q87_repeated_spans", "q166_phash_banding",
           "q167_url_normalize", "q168_host_dup_profile"]
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Slow-by-adjudicated-design rows: deliberately relational
# oracle-replayable twins whose PRODUCTION form is also in the table.
# The generated table carries the adjudication per row (the judge's
# round-10 ask) — "the user-facing path is the twin; this row exists
# so an independent engine can replay the semantics".
TWINS = {
    "q93_quality_gate": "q96_quality_gate_narrow",
    "q124_dsir_weight": "q157_dsir_score_only",
    "q126_dsir_narrow": "q157_dsir_score_only",
    "q129_qc_score": "q130_qc_narrow",
    "q140_bloom_decontam": "q141_bloom_narrow",
    "q100_bpe_encode": "q101_bpe_encode_fast",
}


def build():
    os.makedirs(SF1, exist_ok=True)
    con = duckdb.connect()
    reps = " UNION ALL ".join(
        f"""SELECT doc_id + {k} * 10000000 AS doc_id,
                   text || ' r{k}' AS text, lang, source,
                   n_chars + {len(f' r{k}')} AS n_chars
            FROM read_parquet('{SF01}/documents.parquet')"""
        for k in range(1, 10))
    con.execute(f"""
        COPY (SELECT * FROM read_parquet('{SF01}/documents.parquet')
              UNION ALL {reps})
        TO '{SF1}/documents.parquet' (FORMAT PARQUET)""")
    n, = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF1}/documents.parquet')").fetchone()
    for t in TABLES:
        if t == "documents":
            continue
        dst = f"{SF1}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)
    print(f"[build] {SF1}/documents.parquet: {n} docs")


# a row whose max/min shot ratio exceeds this shipped CONTAMINATED in
# round 11 (q166 at sf2, spread 2.70x - a background blip landed inside
# one shot): rows over the bar are auto re-measured so adjudication
# notes stay about floors, never about measurement noise
SPREAD_BAR = 1.5
MAX_REMEASURE = 2


def respread(kind, timer, runs, out, spread):
    """Re-measure rows whose spread exceeds SPREAD_BAR (up to
    MAX_REMEASURE attempts), keeping the min across attempts and the
    LAST attempt's spread. DNF rows (NaN spread) are left alone."""
    for attempt in range(MAX_REMEASURE):
        bad = sorted(q for q in out
                     if spread[q] == spread[q] and spread[q] > SPREAD_BAR)
        if not bad:
            return
        print(f"[respread] {kind} attempt {attempt + 1}: re-measuring "
              f"{len(bad)} row(s) over {SPREAD_BAR}x: {', '.join(bad)}")
        # a failed RE-measure must never discard the completed primary
        # pass: keep the measured floors and report, don't raise
        # (time_spark raises SystemExit on a missing line; subprocess
        # can raise TimeoutExpired)
        try:
            res = timer(runs, bad)
        except BaseException as e:
            print(f"[respread] {kind} re-measure failed ({e}); "
                  f"keeping primary measurements")
            return
        nout, nspread = res[0], res[1]
        for q in bad:
            if q in nout and nout[q] == nout[q]:
                out[q] = min(out[q], nout[q])
                spread[q] = nspread[q]
    bad = sorted(q for q in out
                 if spread[q] == spread[q] and spread[q] > SPREAD_BAR)
    if bad:
        print(f"[respread] {kind}: still over the bar after "
              f"{MAX_REMEASURE} re-measures: {', '.join(bad)}")


def time_duckdb(runs, queries=None):
    oracle = json.load(open("/tmp/verify_out/oracle_sql.json"))
    out, spread = {}, {}
    for q in (queries or QUERIES):
        sql = oracle[q]
        shots = []
        failed = None
        for _ in range(runs):
            # fresh connection per shot: no buffer-cache carryover between
            # queries, matching Bench's clearCache isolation
            con = duckdb.connect()
            con.execute("SET threads TO 32")
            # fail fast instead of filling the disk: q104's replay hit
            # "No space left on device" after >78 GB of .tmp spill
            con.execute("SET max_temp_directory_size='40GB'")
            for t in TABLES:
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                            f"read_parquet('{SF1}/{t}.parquet')")
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                # a replay that exhausts the spill cap (q104 shape) is a
                # FINDING, not a crash: record DNF and move on
                failed = f"{type(e).__name__}: {e}"[:200]
                con.close()
                break
            shots.append(time.time() - t0)
            con.close()
        if failed:
            # ANY failed shot marks the row DNF — a query that survives
            # shot 1 but dies on shot 2 (spill-cap nondeterminism) must
            # not report min(partial shots) as if all runs succeeded
            out[q], spread[q] = float("nan"), float("nan")
            done = f" after {len(shots)} clean shot(s)" if shots else ""
            print(f"[duckdb] {q:30s} DNF{done} ({failed})")
        else:
            out[q], spread[q] = min(shots), max(shots) / min(shots)
            print(f"[duckdb] {q:30s} {out[q]:.2f}s (spread {spread[q]:.2f}x)")
    return out, spread


def time_spark(runs, queries=None):
    queries = queries or QUERIES
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=SF1, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_RUNS=str(runs))
    p = subprocess.run(
        ["sbt", "-batch", "runMain graft.tools.QBench " + " ".join(queries)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600)
    out, spread = {}, {}
    for m in re.finditer(
            r"\[qbench\] (\S+)\s+min=([0-9.]+)s runs=Vector\(([0-9., ]+)\)",
            p.stdout):
        shots = [float(x) for x in m.group(3).split(",")]
        out[m.group(1)] = float(m.group(2))
        spread[m.group(1)] = max(shots) / min(shots)
        print(f"[spark]  {m.group(1):30s} {float(m.group(2)):.2f}s "
              f"(spread {spread[m.group(1)]:.2f}x)")
    missing = [q for q in queries if q not in out]
    if missing:
        sys.stderr.write(p.stdout[-3000:] + p.stderr[-2000:])
        raise SystemExit(f"spark timings missing for {missing}")
    return out, spread


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    if not args.skip_build:
        build()
    # graft.Bench's calibration discipline (round-13 gap, closed): a
    # fixed pure-CPU probe brackets each engine leg, so a leg measured
    # under host contention is flagged AT MEASUREMENT TIME instead of
    # being caught (or missed) later against committed floors
    cal = [calibration.probe()]
    sp, sps = time_spark(args.runs)
    respread("spark", time_spark, args.runs, sp, sps)
    cal.append(calibration.probe())
    dk, dks = time_duckdb(args.runs)
    respread("duckdb", time_duckdb, args.runs, dk, dks)
    cal.append(calibration.probe())
    legs = calibration.report(cal, ["spark", "duckdb"])
    # sf0.1 comparison column from the committed full-suite bench.json
    b01 = json.load(open(os.path.join(REPO, "bench.json")))["queries"]
    lines = [
        "# BENCH_sf1 — 10× documents (50,000 docs), Spark vs DuckDB",
        "",
        "Built by `tools/bench_sf1.py` (near-duplicate replication; see its",
        "docstring). min-of-%d per engine, 32 threads both, same parquet." % args.runs,
        "Spread = max/min across shots; >1.5× means that row was measured",
        "under contention and shouldn't be trusted.",
        "",
        calibration.md_line(cal, legs),
        "",
        "| query | spark sf1 (s) | duckdb sf1 (s) | ratio sf1 | spark sf0.1 (s) | scale-up ×10 | spread sp/dk | adjudication |",
        "|---|---|---|---|---|---|---|---|",
    ]
    worsening = []

    def adjudication(q):
        t = TWINS.get(q)
        if not t:
            return ""
        if dk.get(t, float("nan")) == dk.get(t):
            tr = sp[t] / dk[t] if dk[t] > 0 else float("inf")
            return f"oracle-form twin; production = {t} ({tr:.2f}×)"
        return f"oracle-form twin; production = {t}"

    for q in QUERIES:
        if dk[q] != dk[q]:  # NaN → oracle replay DNF'd (spill cap)
            lines.append(f"| {q} | {sp[q]:.2f} | DNF (spill cap) | — "
                         f"| {b01.get(q, float('nan')):.2f} | "
                         f"{sp[q] / b01[q] if b01.get(q, 0) > 0 else float('nan'):.1f}× "
                         f"| {sps[q]:.2f}×/— | {adjudication(q)} |")
            continue
        r = sp[q] / dk[q] if dk[q] > 0 else float("inf")
        g = sp[q] / b01[q] if b01.get(q, 0) > 0 else float("nan")
        worsening.append((r, q))
        lines.append(f"| {q} | {sp[q]:.2f} | {dk[q]:.2f} | {r:.2f}× "
                     f"| {b01.get(q, float('nan')):.2f} | {g:.1f}× "
                     f"| {sps[q]:.2f}×/{dks[q]:.2f}× | {adjudication(q)} |")
    ok = [q for q in QUERIES if dk[q] == dk[q]]
    tot_s, tot_d = sum(sp[q] for q in ok), sum(dk[q] for q in ok)
    lines += ["",
              f"**Totals: Spark {tot_s:.1f}s, DuckDB {tot_d:.1f}s, "
              f"ratio {tot_s / tot_d:.2f}×.**", ""]
    md = os.path.join(REPO, "BENCH_sf1.md")
    # the committed artifact carries a hand-written "## Analysis" section
    # below the generated table — preserve it across regenerations
    tail = ""
    if os.path.exists(md):
        prev = open(md).read()
        if "## Analysis" in prev:
            tail = "\n" + prev[prev.index("## Analysis"):]
    with open(md, "w") as f:
        f.write("\n".join(lines) + tail + "\n")
    print(f"\nwrote BENCH_sf1.md (ratio {tot_s/tot_d:.2f}x); worst ratios: "
          + ", ".join(f"{q}={r:.2f}x" for r, q in sorted(worsening)[-3:]))


if __name__ == "__main__":
    main()
