#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: read the Spark parquet result,
run the matching oracle SQL (oracle_sql.json) in DuckDB over the same
testdata parquet tables, sort columns by name + rows by all columns, and
compare exactly (with a tolerance-diagnostic when exact fails).
"""
import json
import sys

import duckdb
import pandas as pd
import numpy as np
from pathlib import Path

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None) if getattr(s.dt, "tz", None) else s
        elif s.dtype == object:
            # date objects -> timestamps for uniform compare
            if s.map(lambda v: hasattr(v, "year") or v is None).all() and s.notna().any():
                try:
                    df[c] = pd.to_datetime(s)
                except Exception:
                    pass
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(name, spark_df, oracle_df):
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA sparkcols={list(a.columns)} oraclecols={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    issues = []
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver HASHES stringified values, so an int64 column on one
        # side vs float64 on the other ("3" vs "3.0") hash-mismatches even
        # when values are numerically equal (e.g. DuckDB windowed sum(int)
        # -> HUGEINT -> pandas float64). Flag the drift loudly.
        int_a, int_b = pd.api.types.is_integer_dtype(av), pd.api.types.is_integer_dtype(bv)
        if int_a != int_b and (pd.api.types.is_numeric_dtype(av) and pd.api.types.is_numeric_dtype(bv)):
            issues.append(f"col {c}: DTYPE-DRIFT spark={av.dtype} oracle={bv.dtype} "
                          f"(driver hash would mismatch — cast the oracle column)")
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = pd.to_numeric(av, errors="coerce").to_numpy(dtype=float)
            bvf = pd.to_numeric(bv, errors="coerce").to_numpy(dtype=float)
            exact = ((avf == bvf) | (np.isnan(avf) & np.isnan(bvf))).all()
            if not exact:
                close = np.allclose(avf, bvf, rtol=1e-6, atol=1e-6, equal_nan=True)
                mask = ~((avf == bvf) | (np.isnan(avf) & np.isnan(bvf)))
                i = int(np.argmax(mask))
                issues.append(f"col {c}: {'CLOSE-ONLY' if close else 'DIFF'} "
                              f"row{i} spark={avf[i]!r} oracle={bvf[i]!r} ndiff={int(mask.sum())}")
        else:
            eq = (av.astype(str).where(av.notna(), "<NA>") == bv.astype(str).where(bv.notna(), "<NA>"))
            if not eq.all():
                i = int((~eq).idxmax())
                issues.append(f"col {c}: VAL row{i} spark={av.iloc[i]!r} oracle={bv.iloc[i]!r} ndiff={int((~eq).sum())}")
    return "; ".join(issues) if issues else None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    results = {}
    qdirs = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    for name in qdirs:
        files = list(Path(out_dir, name).glob("*.parquet"))
        if not files:
            results[name] = "NO-SPARK-OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)} rows)" if len(spark_df) else "rows-only EMPTY!"
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {str(e)[:300]}"
            continue
        try:
            diff = compare(name, spark_df, oracle_df)
        except Exception as e:
            results[name] = f"COMPARE-ERROR: {str(e)[:200]}"
            continue
        results[name] = diff or "OK"
    for k in sorted(oracle):
        if k not in results:
            results[k] = "MISSING-SPARK-DIR"
    npass = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only ("))
    for k, v in sorted(results.items()):
        print(("PASS " if v == "OK" or v.startswith("rows-only (") else "FAIL ") + k + ": " + v)
    print(f"== {npass}/{len(results)} pass")


if __name__ == "__main__":
    main()
