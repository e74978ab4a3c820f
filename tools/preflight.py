#!/usr/bin/env python3
"""Local pre-flight of the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark). Reads Verify's parquet dumps +
oracle_sql.json, runs each oracle in DuckDB over the same testdata, and
compares row-by-row with columns sorted by name — mirroring the driver's
order-sensitive hash compare as closely as we can.

Usage: python3 tools/preflight.py /root/testdata/sf0.01 /tmp/vout
"""
import datetime
import decimal
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    # Do NOT collapse Decimal to float: the driver's hash compares the
    # physical cell, so a Spark dump carrying Decimal("900.20") against the
    # oracle's float64 900.2 is a REAL mismatch. r12 shipped six reds
    # because this function used to do `Decimal -> float` here and masked
    # exactly that divergence. A Decimal cell now renders as its exact
    # decimal string ("900.20"), which never equals repr(float) — any
    # DECIMAL-typed output column fails loudly, as it does on the driver.
    if isinstance(v, decimal.Decimal):
        return f"DECIMAL({v})"
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        v = datetime.datetime(v.year, v.month, v.day)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_df(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    # Mirror the driver exactly: it re-sorts with pandas sort_values over
    # ALL columns before hashing. This step CRASHES on raw array<> output
    # columns ("unhashable type: numpy.ndarray") — that is intentional:
    # round 1 shipped 3 red rows because the old preflight compared in
    # emitted order and never hit the driver's sort.
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(norm_cell(v) for v in t))
    return list(df.columns), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = n_absent = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            # only possible under the dev-loop SPARK_GRAFT_VERIFY_KEYS
            # filter (a FAILING key still writes a marker parquet);
            # counted and reported so a partial dump can't read as green
            n_absent += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark dump unreadable: {e}")
            n_bad += 1
            continue
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            # an oracle that cannot RUN (DuckDB out of temp disk/memory on
            # the big composed oracles at sf0.1) is an environment limit,
            # not an engine mismatch - count it separately so a resource
            # blowup never reads as a red correctness row
            if "No space left" in str(e) or "OutOfMemory" in str(e) or "Out of Memory" in str(e):
                print(f"SKIP {name}: oracle resource limit (not a mismatch): {str(e)[:120]}")
                n_skip += 1
            else:
                print(f"FAIL {name}: oracle sql error: {e}")
                n_bad += 1
            continue
        gc, gr = norm_df(got)
        ec, er = norm_df(exp)
        if [c.lower() for c in gc] != [c.lower() for c in ec]:
            print(f"FAIL {name}: columns {gc} vs {ec}")
            n_bad += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount {len(gr)} vs {len(er)}")
            n_bad += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(gr)} rows differ; first at {i}:")
            print(f"   cols:  {gc}")
            print(f"   spark: {a}")
            print(f"   duck:  {b}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(gr)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed"
          + (f", {n_skip} oracle-resource-skipped" if n_skip else "")
          + (f", {n_absent} not dumped (key filter)" if n_absent else ""))
    # machine-readable summary + distinct exit codes so automation can
    # tell "all compared" (0) from "some oracles never ran" (2) from
    # "mismatch" (1) — a resource-skipped run must not read as fully green
    print("PREFLIGHT_SUMMARY " + json.dumps(
        {"n_ok": n_ok, "n_bad": n_bad, "n_skip": n_skip, "n_absent": n_absent}))
    if n_bad:
        return 1
    if n_skip:
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
