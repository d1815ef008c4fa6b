#!/usr/bin/env python3
"""Diff two PLAN_CENSUS.json files (see graft.PlanCensus): print every
query whose physical-operator fingerprint changed, plus adds/removes.
A changed row is not automatically a bug — it is the prompt to explain
the change in PLANS.md the round it lands, instead of rediscovering it
from bench archaeology later.

Usage: python3 tools/plan_diff.py OLD.json NEW.json
Exit code 0 always (informational); pass --strict to exit 1 on changes.
Pass --names-only to print JUST the changed+added query names, one per
line — the input for a changed-only bench pass:
    sbt -batch "runMain graft.Bench $(python3 tools/plan_diff.py \
        --names-only PLAN_CENSUS.json /tmp/census_new.json | tr '\n' ' ')"
(a routine round then only re-times queries whose plans moved; the full
372-entry run stays the official per-round artifact).
"""
import json, sys

def main() -> int:
    strict = "--strict" in sys.argv
    names_only = "--names-only" in sys.argv
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    old = json.load(open(paths[0]))
    new = json.load(open(paths[1]))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    changed = []
    for name in sorted(set(old) & set(new)):
        if old[name] != new[name]:
            delta = {k: (old[name].get(k), new[name].get(k))
                     for k in set(old[name]) | set(new[name])
                     if old[name].get(k) != new[name].get(k)}
            changed.append((name, delta))
    if names_only:
        for name in sorted(added + [n for n, _ in changed]):
            print(name)
        return 1 if strict and changed else 0
    for name in added:
        print(f"ADD    {name}: {new[name]}")
    for name in removed:
        print(f"REMOVE {name}")
    for name, delta in changed:
        pretty = ", ".join(f"{k}: {a}->{b}" for k, (a, b) in sorted(delta.items()))
        print(f"CHANGE {name}: {pretty}")
    print(f"{len(changed)} changed, {len(added)} added, {len(removed)} removed "
          f"of {len(new)} queries")
    return 1 if strict and changed else 0

if __name__ == "__main__":
    sys.exit(main())
