#!/usr/bin/env python
"""Commit gate: refuse to commit when the registry and the committed
sweep/plan artifacts disagree.

Runs the pure-python (no Spark session) consistency checks that broke the
round-7 and round-8 end-of-round snapshots:

  1. every queries() entry has an oracle_sql() entry (or is whitelisted),
  2. the newest ORACLE_r*.txt covers every registry query with a PASS line,
  3. the newest PLANS_r*.json covers every registry query with 0 cartesians.

Wire-up (committed as .githooks/pre-commit, activated per clone with
`git config core.hooksPath .githooks`). Run manually: python scripts/gate.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
os.chdir(repo)

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> int:
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    errs: list[str] = []

    missing_oracle = qs - oracles
    if missing_oracle:
        errs.append(f"queries without oracle_sql(): {sorted(missing_oracle)}")

    arts = sorted(glob.glob(os.path.join(repo, "ORACLE_r*.txt")))
    if not arts:
        errs.append("no ORACLE_r*.txt sweep artifact committed")
    else:
        text = open(arts[-1]).read()
        swept = set(re.findall(r"^(?:PASS|FAIL) (q_\w+):", text, re.M))
        failed = set(re.findall(r"^FAIL (q_\w+):", text, re.M))
        unswept = qs - swept
        if unswept:
            errs.append(
                f"{os.path.basename(arts[-1])} misses {sorted(unswept)} — "
                "run scripts/check_oracle.py for them (all three SFs) and "
                "append the PASS lines IN THIS COMMIT"
            )
        if failed:
            errs.append(f"sweep artifact records FAIL: {sorted(failed)}")
        # Reverse direction (r10 advice): an artifact must not claim a
        # query the registry doesn't have — that's a sweep recorded
        # against an implementation not in-tree (the 8566055 breach:
        # artifacts named q_gdpr_erasure_plan one commit before the code).
        phantom = swept - qs
        if phantom:
            errs.append(
                f"{os.path.basename(arts[-1])} names queries absent from "
                f"the registry: {sorted(phantom)} — the artifact is not "
                "reproducible at this commit"
            )

    plans = sorted(glob.glob(os.path.join(repo, "PLANS_r*.json")))
    if not plans:
        errs.append("no PLANS_r*.json artifact committed")
    else:
        d = json.load(open(plans[-1]))
        audited = set(d.get("queries", {}))
        unaudited = qs - audited
        if unaudited:
            errs.append(
                f"{os.path.basename(plans[-1])} misses {sorted(unaudited)} — "
                "run scripts/plan_audit.py > PLANS_r<N>.json IN THIS COMMIT"
            )
        phantom_plans = audited - qs
        if phantom_plans:
            errs.append(
                f"{os.path.basename(plans[-1])} names queries absent from "
                f"the registry: {sorted(phantom_plans)}"
            )
        if d.get("cartesian_offenders"):
            errs.append(f"cartesian offenders: {d['cartesian_offenders']}")
        if d.get("errors"):
            errs.append(f"plan audit errors: {d['errors']}")

    if errs:
        print("GATE RED — commit refused:")
        for e in errs:
            print(f"  - {e}")
        return 1
    print(f"GATE GREEN: {len(qs)} queries, sweep+plans current.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
