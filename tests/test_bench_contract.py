"""Guards for the bench driver contract (r14).

The external driver captures a bounded TAIL of bench.py's stdout and
parses the last complete JSON line. The output contract is therefore:

1. the LAST line is the compact summary ({"metric":
   "headline_queries_total_wall", "value": N, ...}) — small enough to
   always fit a tail capture whole;
2. the second-to-last line is the per-query medians
   ({"metric": "per_query_median", ...}) so the tail's remainder is
   filled with as many per-query numbers as fit;
3. the detail line carries queries/queries_min/queries_max/
   queries_cold for the repo's own round-over-round diffs.

These tests pin the emission order and line budgets WITHOUT running
the bench (they exercise the same json.dumps shapes bench.py uses).
"""

from __future__ import annotations

import json

import bench


def test_headline_and_control_are_disjoint_growing_lists():
    # additions-only discipline: names unique, control ⊆ registry set
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    assert len(bench.HEADLINE) >= 87
    assert set(bench.CONTROL) <= set(bench.HEADLINE)


def test_compact_line_fits_any_tail():
    compact = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": 99.999,
            "unit": "sec",
            "n_queries": len(bench.HEADLINE),
            "total_min": 99.999,
            "runs": 5,
            "sf": 0.1,
            "control_ratio": 9.999,
        }
    )
    assert len(compact) < 400


def test_per_query_median_line_is_compact():
    # worst-case shape: every headline query at a 3-decimal median
    line = json.dumps(
        {
            "metric": "per_query_median",
            "sf": 0.1,
            "queries": {n: 99.999 for n in bench.HEADLINE},
        },
        separators=(",", ":"),
    )
    # stays in the same ballpark as a tail capture; with the compact
    # line after it, a 2000-char tail still ends with ~75 medians +
    # the full compact line (measured r14)
    assert len(line) < 4096


def test_control_ref_total_documented():
    # the control reference must be a sane positive constant; its
    # recalibration history lives in the comment above it and
    # OPTIMIZATION_r14.md
    assert 0.5 < bench.CONTROL_REF_TOTAL < 20
