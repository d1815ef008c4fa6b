#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same sf directory and compare values (columns sorted by name).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
       python3 tools/oracle_check.py --selftest   # budget-trip self-test

The suite carries a WALL-CLOCK BUDGET (ORACLE_BUDGET_S env, default 480 s):
the driver's gate silently writes {} past its own wall clock (the r8 outage),
so a suite creeping toward that cliff must FAIL here, loudest offender named,
the round the regression lands — not the round the gate dies.
"""
import json, os, sys, math, time
import duckdb
import pandas as pd

BUDGET_S_DEFAULT = 480.0  # 8 min: half the driver's observed gate ceiling


def budget_failures(total_s, slow, budget_s):
    """Budget verdict, pure function for the self-test: returns FAIL
    messages (empty list = within budget). `slow` is [(seconds, name)]."""
    if total_s <= budget_s:
        return []
    worst_s, worst = max(slow) if slow else (0.0, "<none>")
    return [f"BUDGET FAIL: oracle suite {total_s:.1f}s exceeds "
            f"{budget_s:.0f}s budget; loudest offender: {worst} "
            f"({worst_s:.2f}s)"]


def selftest():
    # a deliberately-slow injected oracle must trip the budget, and a
    # within-budget suite must not
    trip = budget_failures(100.0, [(60.0, "q_injected_slow"), (1.0, "q_ok")],
                           budget_s=50.0)
    assert trip and "q_injected_slow" in trip[0], f"budget did not trip: {trip}"
    ok = budget_failures(40.0, [(30.0, "q_fine")], budget_s=50.0)
    assert ok == [], f"false trip: {ok}"
    empty = budget_failures(100.0, [], budget_s=50.0)
    assert empty and "<none>" in empty[0]
    print("selftest PASS: slow-oracle injection trips the budget")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _round_label():
    """Round label as an INT (the trend file mixed '13' str with 14/15 int
    when GRAFT_ROUND came through the env — ADVICE r15). When GRAFT_ROUND
    is unset, infer ONE PAST the newest driver gate artifact on disk.
    Caveat (documented, not fixed): the heuristic assumes sweeps run
    BEFORE the current round's CORRECTNESS_r*.json lands; a re-sweep
    after the driver writes it gets labeled one round high. Set
    GRAFT_ROUND explicitly for post-gate sweeps."""
    env = os.environ.get("GRAFT_ROUND")
    if env:
        try:
            return int(env)
        except ValueError:
            return env
    import glob
    import re
    ns = [int(m.group(1)) for p in glob.glob("CORRECTNESS_r*.json")
          for m in [re.match(r"CORRECTNESS_r(\d+)", os.path.basename(p))]
          if m]
    return max(ns) + 1 if ns else None

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def cmp_cell(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        # EXACT — the driver hashes values, so any bit difference fails there
        return fa == fb
    return str(a) == str(b)

def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    t_start = time.time()
    slow = []  # (seconds, name) per oracle — regression visibility
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_fail += 1
            continue
        try:
            t0 = time.time()
            exp = norm(con.sql(sql).df())
            slow.append((time.time() - t0, name))
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        # dtype-class mismatch (int vs float) breaks the driver's value hash
        # even when values are numerically equal — e.g. DuckDB sum(INTEGER)
        # returns HUGEINT which pandas renders as float64
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns
                  if (pd.api.types.is_integer_dtype(got[c].dtype)
                      != pd.api.types.is_integer_dtype(exp[c].dtype))
                  or (pd.api.types.is_float_dtype(got[c].dtype)
                      != pd.api.types.is_float_dtype(exp[c].dtype))]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch {dt_bad}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not cmp_cell(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # the oracle-suite budget is the round's hard-signal lifeline: the
    # driver's gate silently writes {} past its wall clock, so any oracle
    # creeping toward tens of seconds must be visible the round it regresses
    print(f"\nslowest oracles (s):")
    for sec, name in sorted(slow, reverse=True)[:8]:
        print(f"  {sec:7.2f} {name}")
    total_s = time.time() - t_start
    print(f"oracle suite total: {total_s:.1f} s")
    budget_s = float(os.environ.get("ORACLE_BUDGET_S", BUDGET_S_DEFAULT))
    budget_msgs = budget_failures(total_s, slow, budget_s)
    for msg in budget_msgs:
        print(msg)
        n_fail += 1
    # headroom census, the BENCH_SUMMARY pattern applied to the gate: the
    # budget now TRIPS, but nothing recorded how close each round sails —
    # one archivable JSON line carries the suite cost trend so a regression
    # is visible rounds before it reaches the cliff
    census = {
        "suite_total_s": round(total_s, 1),
        "budget_s": budget_s,
        "headroom_pct": round(max(0.0, 1 - total_s / budget_s) * 100, 1),
        "n_oracles": len(slow),
        "top3": {name: round(sec, 2)
                 for sec, name in sorted(slow, reverse=True)[:3]},
        "budget_ok": not budget_msgs,
        "round": _round_label(),
    }
    # committed-per-round sweep evidence (r15 verdict item 1): when
    # ORACLE_SUMMARY_OUT names a file (e.g. ORACLE_SF01_r16.json for the
    # sf0.1 sweep), write a standalone pass/fail summary there so the
    # sweep is an artifact, not a PLANS.md claim someone must re-run
    # ~20 min of Spark to trust.
    summary_out = os.environ.get("ORACLE_SUMMARY_OUT")
    if summary_out:
        try:
            with open(summary_out, "w") as f:
                f.write(json.dumps({
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_oracles": len(oracle),
                    "suite_total_s": round(total_s, 1),
                    "round": _round_label(),
                    "ts": round(time.time(), 1),
                    "tool": "tools/oracle_check.py",
                }) + "\n")
        except OSError:
            pass
    # only a FULL-inventory run may write the census: a filtered local
    # iteration (Verify with query args) dumps the complete oracle_sql.json
    # but only a few result dirs, and its near-empty cost line would stomp
    # the committed full census (it did, twice, in round 11)
    if len(slow) >= 0.9 * max(1, len(oracle)):
        try:
            with open("ORACLE_COST.json", "w") as f:
                f.write(json.dumps(census) + "\n")
        except OSError:
            pass  # census is telemetry; never fail the gate over it
        # trend line (r13 verdict item 7): one appended record per full run
        # so the headroom trajectory toward the 480s cliff is chartable
        # without per-round git archaeology. GRAFT_ROUND (optional env)
        # labels the round; ts anchors runs within one.
        try:
            census_line = dict(census)
            census_line["ts"] = round(time.time(), 1)
            with open("ORACLE_COST_TREND.jsonl", "a") as f:
                f.write(json.dumps(census_line) + "\n")
        except OSError:
            pass
    else:
        print(f"(partial run: {len(slow)}/{len(oracle)} oracles — "
              "ORACLE_COST.json left untouched)")
    print(f"{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        selftest()
    else:
        main(sys.argv[1], sys.argv[2])
