#!/usr/bin/env python3
"""Local self-check mimicking the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Reads the parquet dumps written by `graft.Verify` (one dir per query) and
`oracle_sql.json`, runs each oracle SQL in DuckDB against views named after
the testdata tables, then compares: columns sorted by name, rows sorted by
all columns, values compared exactly (floats bit-compared, with max-abs-diff
reported on mismatch so tolerance problems are visible).
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        s = df[c]
        # normalize datetime-ish columns to ns epoch ints
        if np.issubdtype(s.dtype, np.datetime64):
            df[c] = s.astype("datetime64[ns]").astype("int64")
        elif s.dtype == object and len(s) and all(
                (v is None) or hasattr(v, "isoformat") for v in s):
            df[c] = pd.to_datetime(s).astype("datetime64[ns]").astype("int64")
        elif s.dtype == object:
            # decimals etc -> float if numeric
            try:
                df[c] = s.astype(float)
            except (ValueError, TypeError):
                df[c] = s.astype(str)
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok, fail = [], []
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = norm(con.sql(sql).df())
        except Exception as e:
            fail.append(name); print(f"FAIL {name}: oracle error: {e}"); continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            fail.append(name); print(f"FAIL {name}: no spark output"); continue
        got = norm(duckdb.sql(f"SELECT * FROM read_parquet({files!r})").df())
        if list(exp.columns) != list(got.columns):
            fail.append(name)
            print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}")
            continue
        if len(exp) != len(got):
            fail.append(name)
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            continue
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            # The driver's hash is dtype-sensitive: an oracle column that
            # lands as float64 while Spark emits int64 hash-mismatches even
            # when values are equal (r1 s7 decimal literal, r2 pack_sequences
            # HUGEINT bin_id). Flag int-vs-float dtype splits explicitly.
            if (e.dtype.kind in "iu") != (g.dtype.kind in "iu"):
                bad.append(
                    f"{c} (DTYPE exp={e.dtype} got={g.dtype} — integer/float "
                    f"split; CAST the oracle output column)")
                continue
            if e.dtype.kind == "f" or g.dtype.kind == "f":
                ev = e.astype(float).values
                gv = g.astype(float).values
                same = (ev == gv) | (np.isnan(ev) & np.isnan(gv))
                if not same.all():
                    with np.errstate(invalid="ignore"):
                        mx = float(np.nanmax(np.abs(ev - gv)))
                    bad.append(f"{c} (float, n_mismatch={int((~same).sum())}, maxdiff={mx:.3e})")
            else:
                ev = e.astype(str).values
                gv = g.astype(str).values
                if not (ev == gv).all():
                    i = int(np.argmax(ev != gv))
                    bad.append(f"{c} (first: exp={ev[i]!r} got={gv[i]!r})")
        if bad:
            fail.append(name)
            print(f"FAIL {name}: value mismatch: {'; '.join(bad)}")
        else:
            ok.append(name)
            print(f"OK   {name} ({len(exp)} rows)")
    print(f"\n{len(ok)} ok, {len(fail)} fail out of {len(oracle)}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
