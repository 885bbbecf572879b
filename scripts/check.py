#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: runs each oracle SQL in
DuckDB against the testdata parquet and compares (after sorting columns by
name) with the parquet that graft.Verify dumped for the same query name.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # Driver testdata is a single file per table; SynthScale output is
        # a Spark parquet DIRECTORY named <t>.parquet — glob inside it.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures.append(name); n_fail += 1
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures.append(name); n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
        if ecols != gcols:
            print(f"FAIL {name}: columns exp={ecols} got={gcols}")
            failures.append(name); n_fail += 1
            continue
        if exp.num_rows != got.num_rows:
            print(f"FAIL {name}: rows exp={exp.num_rows} got={got.num_rows}")
            failures.append(name); n_fail += 1
            continue
        bad = None
        for c in ecols:
            ev = [norm(x) for x in exp.column(c).to_pylist()]
            gv = [norm(x) for x in got.column(c).to_pylist()]
            for i, (a, b) in enumerate(zip(ev, gv)):
                if a != b:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} exp={a!r} got={b!r}")
            failures.append(name); n_fail += 1
            continue
        # The driver compares at the PANDAS layer: it reads the Spark
        # parquet via pyarrow (DECIMAL->Decimal objects, DATE->date) and
        # the oracle via duckdb .df() (DECIMAL->float64, DATE->Timestamp),
        # so dtype divergence hash-fails even with identical values, and
        # list columns crash its lexsort. Replicate both failure modes.
        typed = None
        for side, tbl in (("oracle", exp), ("spark", got)):
            for f in tbl.schema:
                if str(f.type).startswith("list"):
                    typed = f"{side} col={f.name} is list-typed (crashes driver lexsort)"
        if typed is None:
            # Compare dtype FAMILIES: the driver's hash tolerates width
            # (int32 vs int64) and datetime unit (ns vs us) but not
            # int-vs-float or object(Decimal/date)-vs-native.
            def family(dt):
                s = str(dt)
                if s.startswith(("int", "uint")): return "int"
                if s.startswith("float"): return "float"
                if s.startswith("datetime64"): return "datetime"
                return s
            exp_df = con.execute(sql).df()
            got_df = pandas.read_parquet(files)
            for c in ecols:
                de, dg = family(exp_df[c].dtype), family(got_df[c].dtype)
                if de != dg:
                    typed = f"col={c} pandas dtype family oracle={de} spark={dg}"
                    break
        if typed:
            print(f"FAIL {name}: driver-layer typing: {typed}")
            failures.append(name); n_fail += 1
        else:
            print(f"PASS {name} ({exp.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if failures:
        print("failing:", " ".join(failures))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
