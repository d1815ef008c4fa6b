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
    python3 tools/determinism_check.py [--axis NAME --out FILE] /tmp/v8 /tmp/v32
    python3 tools/determinism_check.py --selftest

--axis/--out (r15 verdict item 1) append this sweep's result as a named
axis into a committed JSON artifact (e.g. DETERMINISM_r16.json), so the
per-round sweeps are evidence on disk rather than PLANS.md prose.

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
        # sort on SIGN-NORMALIZED stringified cells: float columns get
        # +0.0 added into the sort key so 0.0 and -0.0 share one bucket
        # (ADVICE r15: astype(str) alone yields '-0.0' vs '0.0' — distinct
        # keys — so rows tying on the other columns could sort the two
        # dumps into different orders and the first-mismatch diagnostics
        # would pair unrelated rows). The bit compare below still reads
        # the RAW values, so signed zeros are detected either way.
        key = df.copy()
        for c in key.columns:
            if key[c].dtype.kind == "f":
                key[c] = key[c] + 0.0
        key = key.astype(str)
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
    # tie alignment (ADVICE r15): without sign normalization in the sort
    # key, '-0.0' < '0.0' re-orders rows differently in the two dumps and
    # the diagnostics pair UNRELATED rows (col k would spuriously flag).
    # With it, rows align on k and only the genuine zero-sign cells flag.
    # (x sorts before y, so an unnormalized '-0.0'/'0.0' key would order
    # the two dumps differently and y would spuriously flag)
    t1 = pd.DataFrame({"x": [0.0, -0.0], "y": ["a", "b"]})
    t2 = pd.DataFrame({"x": [-0.0, 0.0], "y": ["a", "b"]})
    d2 = diff_query(t1, t2)
    assert d2 and all(m.startswith("col x") for m in d2), \
        f"tie misalignment paired unrelated rows: {d2}"
    c = pd.DataFrame({"x": [1.5, 0.0], "k": [2, 1]})  # row order only
    assert diff_query(a, c) == [], "row-order-only diff flagged"
    n1 = pd.DataFrame({"x": [float("nan")]})
    n2 = pd.DataFrame({"x": [float("nan")]})
    assert diff_query(n1, n2) == [], "NaN == NaN violated"
    print("selftest PASS: signed-zero caught, row order ignored, NaN ok")


def write_axis(out_path: str, axis: str, record: dict) -> None:
    """Merge one sweep axis into the committed artifact (r15 verdict item
    1): the file accumulates {"axes": {name: record}} across the round's
    sweeps so one JSON carries the whole parallelism×AQE matrix."""
    import json
    doc = {"axes": {}}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            doc = {"axes": {}}
    doc.setdefault("axes", {})[axis] = record
    with open(out_path, "w") as f:
        f.write(json.dumps(doc, indent=1, sort_keys=True) + "\n")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return 0
    args = sys.argv[1:]
    axis = out_path = None
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--axis":
            axis = args.pop(0)
        elif flag == "--out":
            out_path = args.pop(0)
        else:
            print(f"unknown flag {flag}")
            return 2
    dir_a, dir_b = args[0], args[1]
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
    if axis and out_path:
        import time
        rnd = os.environ.get("GRAFT_ROUND")
        write_axis(out_path, axis, {
            "dirs": [dir_a, dir_b],
            "n_compared": len(common),
            "n_identical": len(common) - bad,
            "n_differ": bad,
            "n_onesided": len(missing),
            "round": int(rnd) if rnd and rnd.isdigit() else rnd,
            "ts": round(time.time(), 1),
            "tool": "tools/determinism_check.py (bit-exact doubles)",
        })
        print(f"axis '{axis}' recorded in {out_path}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
