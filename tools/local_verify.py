#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (dev tooling only,
not part of the engine): reads Verify.scala's parquet dumps + oracle_sql
.json, runs each oracle in DuckDB over the same testdata tables, and
compares after sorting columns by name.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    return v


def frame_key(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(norm_cell(v) for v in t))
    return list(df.columns), rows


def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:  # optional name filter (matches Verify.scala's dev 3rd arg)
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gcols, grows = frame_key(got)
        ecols, erows = frame_key(exp)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs oracle {ecols}")
            n_fail += 1
            continue
        # Dtype parity: the driver's hash is type-sensitive only across
        # int-vs-float (DuckDB HUGEINT from an uncast integer sum() lands
        # as float64 vs Spark's int64). Normalize dtype FAMILIES so equal
        # data isn't false-FAILed on physical width/unit differences
        # (int32 vs int64, datetime64[ns] vs [us], bool vs object-bool).
        def family(dtype_str):
            s = dtype_str.lower()
            if s.startswith(("int", "uint")):
                return "int"
            if s.startswith("float"):
                return "float"
            if s.startswith("datetime64"):
                return "datetime"
            if s in ("bool", "boolean"):
                return "bool"
            return s
        gdt = got.reindex(sorted(got.columns), axis=1).dtypes
        edt = exp.reindex(sorted(exp.columns), axis=1).dtypes
        gt = [family(str(t)) for t in gdt]
        et = [family(str(t)) for t in edt]
        if gt != et:
            bad = [(c, a, b) for c, a, b in zip(gcols, gt, et) if a != b]
            print(f"FAIL {name}: dtype mismatch {bad}")
            n_fail += 1
            continue
        if grows == erows:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows {len(grows)} vs {len(erows)}")
            shown = 0
            for i, (a, b) in enumerate(zip(grows, erows)):
                if a != b and shown < 3:
                    print(f"  row {i}: spark={a}")
                    print(f"          duck ={b}")
                    shown += 1
            if len(grows) != len(erows):
                print(f"  spark head: {grows[:2]}")
                print(f"  duck  head: {erows[:2]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], names))
