#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle compare.

Usage: python3 tools/check_parity.py [--strict] <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB with views over the same
parquet tables, and compares: schema (column names sorted), row count,
and values (columns sorted by name, rows sorted by all columns).

--strict (VERDICT r13 item 2): mimic the driver's rendered-value hash.
The driver hashes the RENDERED frame, so an int64 `1` vs a float64 `1.0`
(the DuckDB HUGEINT class that escaped in rounds 11-13) is a mismatch
even though the values are numerically equal. Strict mode applies NO
numeric coercion: every non-float column is compared as astype(str);
float columns keep only the round(6) rule before rendering. Run strict
in every pre-commit sweep; the default loose mode remains for value-level
debugging (it tells you whether a strict diff is type-class or value).

Dev-only tool — not part of the shipped library.
"""
import sys, os, json, math
import duckdb
import pandas as pd

STRICT = False

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        isna = s.isna()
        if pd.api.types.is_datetime64_any_dtype(s):
            # tz-aware (e.g. Spark TIMESTAMP_MICROS with isAdjustedToUTC)
            # and naive (INT96, DuckDB TIMESTAMP) must normalize alike:
            # both engines run in UTC, so strip the tz label after
            # converting to UTC
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            s = s.dt.floor("ms")
            out[c] = s.astype("datetime64[ms]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.round(6).astype(str) if STRICT else s.round(6)
        elif STRICT:
            # driver-mimic: rendered values, no numeric coercion —
            # int64 1 vs HUGEINT-float 1.0 must MISMATCH here like it
            # does under the driver hash
            out[c] = s.astype(str)
        else:
            # dates, ints, strings, lists; duckdb hugeint -> object
            try:
                out[c] = pd.to_numeric(s)
            except (ValueError, TypeError):
                out[c] = s.astype(str)
        if STRICT:
            # canonical null token: a Spark object-column None and a
            # DuckDB datetime NaT / float nan are the SAME null — the
            # driver's renderer treats them as equal (verified: both
            # forms are green in driver artifacts), so strict must not
            # flag the token difference, only real type-class drift
            rendered = out[c]
            if rendered.dtype != object:
                rendered = rendered.astype(str)
            out[c] = rendered.mask(isna, "<null>")
    r = pd.DataFrame(out)
    r = r.sort_values(by=list(r.columns), ignore_index=True)
    return r


def cmp(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~((av.isna() & bv.isna()) |
                    (av.sub(bv).abs() <= 1e-9 + 1e-9 * bv.abs()))
        else:
            bad = ~((av.isna() & bv.isna()) | (av == bv))
        if bad.any():
            i = bad.idxmax()
            return (f"VALUES col={c} row={i} "
                    f"spark={a[c][i]!r} duck={b[c][i]!r} "
                    f"({int(bad.sum())} diffs)")
    return None


def main():
    global STRICT
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = "--strict" in sys.argv[1:]
    sf_dir, out_dir = argv[0], argv[1]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_noor = 0
    for name in names:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            n_noor += 1
            print(f"  NO-ORACLE {name}: rows={len(spark_df)}"
                  f"{' EMPTY!' if len(spark_df) == 0 else ''}")
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            n_fail += 1
            print(f"  FAIL {name}: oracle SQL error: {e}")
            continue
        err = cmp(name, spark_df, duck_df)
        if err:
            n_fail += 1
            print(f"  FAIL {name}: {err}")
        else:
            n_pass += 1
            print(f"  pass {name} ({len(spark_df)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noor} no-oracle ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
