"""Fixed pure-CPU calibration probe for the scale harnesses — the
graft.Bench discipline (probe at start / between legs / end; identical
work each time, so any dispersion across probes is the HOST's, never
the suite's) ported to the Python side, closing the round-13 gap where
bench_sf3's primary sf2 leg was measured under heavy load and only
caught later against committed floors.

Usage (bench_sf1/2/3):

    import calibration
    probes = [calibration.probe()]
    ... measure leg 1 ...
    probes.append(calibration.probe())
    ... measure leg 2 ...
    probes.append(calibration.probe())
    flags = calibration.report(probes, ["spark", "duckdb"])
    # -> per-leg dispersion printed + returned; legs > BAR are
    #    contaminated AT MEASUREMENT TIME (re-run them), and the .md
    #    should carry the probe row so a reader can audit the leg.

The probe is a CPU-bound DuckDB aggregate over a fixed range (32
threads, min-of-2 with one untimed warm shot — the same
first-shot-compiles correction graft.Bench applies). ~1-2s on a quiet
host; absolute value is irrelevant, only dispersion across probes.
"""
import time

import duckdb

PROBE_SQL = "SELECT sum(hash(range) % 1000000) FROM range(200000000)"
BAR = 1.3
_warmed = False


def _shot():
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    t0 = time.time()
    con.execute(PROBE_SQL).fetchall()
    con.close()
    return time.time() - t0


def probe():
    """One calibration reading: min-of-2 timed shots (first call warms
    untimed so compilation never reads as contention)."""
    global _warmed
    if not _warmed:
        _shot()
        _warmed = True
    return min(_shot() for _ in range(2))


def report(probes, leg_names):
    """Print per-leg dispersion (probes bracketing each leg) and return
    {leg_name: dispersion}. Legs over BAR are flagged loudly — their
    rows were measured under host contention and adjudicate nothing."""
    out = {}
    for i, name in enumerate(leg_names):
        pair = probes[i:i + 2]
        d = max(pair) / min(pair)
        out[name] = d
        flag = f"  ** OVER {BAR}x — LEG CONTAMINATED, RE-RUN **" if d > BAR else ""
        print(f"[calibration] {name} leg dispersion {d:.3f}x "
              f"(probes {pair[0]:.2f}s/{pair[1]:.2f}s){flag}")
    return out


def md_line(probes, legs):
    """One line for the generated .md: the audit trail a reader needs to
    trust (or reject) each leg without re-running the world."""
    ps = "/".join(f"{p:.2f}s" for p in probes)
    ds = ", ".join(f"{k} {v:.2f}x" for k, v in legs.items())
    return (f"Calibration probe (fixed pure-CPU, min-of-2, start/middle/end): "
            f"{ps} — leg dispersion {ds}; legs over {BAR}x were measured "
            f"under host contention and must be re-run.")
