#!/usr/bin/env python3
"""Cross-parallelism determinism sweep: diff two graft.Verify dumps.

The r14 gate red (q_heaps_law) passed at 8 cores and failed at local[32]
because a plain-double-sum OLS slope's summation-order residue rounded to
0.0 vs -0.0 depending on Spark's partial-aggregation tree. The builder's
replica ran at one parallelism and the driver at another, so nothing could
catch the class before the driver did. This tool does: run graft.Verify
twice over the SAME sf directory at different SPARK_GRAFT_CPUS, then diff
every query's output BIT-EXACTLY (doubles compared on their IEEE bit
patterns, so -0.0 vs 0.0 and last-ulp drift are both caught — pandas
`==`/`equals` would hide the former).

Usage:
    SPARK_GRAFT_CPUS=8  sbt -batch "runMain graft.Verify <sf> /tmp/v8"
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify <sf> /tmp/v32"
    python3 tools/determinism_check.py /tmp/v8 /tmp/v32
    python3 tools/determinism_check.py --selftest

Exit 0 = every query present in both dumps is bit-identical.
Rows are sorted by every column before compare (queries whose final
ORDER BY is a partial key would otherwise flag spurious row-order diffs;
value-level nondeterminism still shows because the sort uses the values
themselves).
"""
import glob
import os
import sys

import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted copy — the driver compare's layout."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        # sort on stringified cells: mixed/NULL columns stay comparable,
        # and distinct float bit patterns of equal value (0.0 vs -0.0)
        # still land in one sort bucket so the bit compare below sees them
        key = df.astype(str)
        order = key.sort_values(by=list(key.columns), kind="mergesort").index
        df = df.loc[order].reset_index(drop=True)
    return df


def cells_equal_bitwise(a: pd.Series, b: pd.Series):
    """Elementwise bit-exact equality; floats on raw bits, NaN == NaN."""
    if a.dtype.kind == "f" and b.dtype.kind == "f":
        return (np.asarray(a, dtype="f8").view("i8")
                == np.asarray(b, dtype="f8").view("i8"))
    an, bn = a.isna(), b.isna()
    eq = (a == b) | (an & bn)
    return np.asarray(eq.fillna(False), dtype=bool)


def diff_query(da: pd.DataFrame, db: pd.DataFrame):
    """Returns a list of human-readable mismatch strings (empty = equal)."""
    if sorted(da.columns) != sorted(db.columns):
        return [f"schema: {sorted(da.columns)} vs {sorted(db.columns)}"]
    if len(da) != len(db):
        return [f"rows: {len(da)} vs {len(db)}"]
    da, db = canon(da), canon(db)
    out = []
    for c in da.columns:
        eq = cells_equal_bitwise(da[c], db[c])
        if not eq.all():
            i = int(np.argmin(eq))
            va, vb = da[c].iloc[i], db[c].iloc[i]
            extra = ""
            if isinstance(va, float) and isinstance(vb, float):
                ba = np.float64(va).view("i8")
                bb = np.float64(vb).view("i8")
                extra = f" (bits {ba:#x} vs {bb:#x})"
            out.append(f"col {c}: {(~eq).sum()} cells differ; first at "
                       f"row {i}: {va!r} vs {vb!r}{extra}")
    return out


def read_dump(d: str) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def selftest():
    a = pd.DataFrame({"x": [0.0, 1.5], "k": [1, 2]})
    b = pd.DataFrame({"x": [-0.0, 1.5], "k": [1, 2]})
    d = diff_query(a, b)
    assert d and "bits" in d[0], f"signed zero not caught: {d}"
    c = pd.DataFrame({"x": [1.5, 0.0], "k": [2, 1]})  # row order only
    assert diff_query(a, c) == [], "row-order-only diff flagged"
    n1 = pd.DataFrame({"x": [float("nan")]})
    n2 = pd.DataFrame({"x": [float("nan")]})
    assert diff_query(n1, n2) == [], "NaN == NaN violated"
    print("selftest PASS: signed-zero caught, row order ignored, NaN ok")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return 0
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    qs_a = {os.path.basename(p) for p in glob.glob(os.path.join(dir_a, "q_*"))
            if os.path.isdir(p)}
    qs_b = {os.path.basename(p) for p in glob.glob(os.path.join(dir_b, "q_*"))
            if os.path.isdir(p)}
    common = sorted(qs_a & qs_b)
    missing = sorted(qs_a ^ qs_b)
    bad = 0
    for q in common:
        try:
            da = read_dump(os.path.join(dir_a, q))
            db = read_dump(os.path.join(dir_b, q))
        except Exception as e:  # unreadable dump = a failure, not a skip
            print(f"FAIL {q}: unreadable ({e})")
            bad += 1
            continue
        diffs = diff_query(da, db)
        if diffs:
            bad += 1
            print(f"FAIL {q}")
            for m in diffs:
                print(f"     {m}")
        else:
            print(f"PASS {q}")
    if missing:
        print(f"WARN only in one dump: {missing}")
    print(f"{len(common) - bad} identical, {bad} differ, "
          f"{len(missing)} one-sided")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
