"""Small-scale run of the reference-scale pipeline bench with --check:
the generator tallies structural goldens while writing the corpus
(distinct users, node/way split, top-k shop/highway orderings with
deterministic ties, per-amenity counts — the invariant classes the
reference publishes in README.md:128,138) and the pipeline must
reproduce them exactly. The full-scale equivalent is
``python scripts/bench_pipeline.py --check``."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pipeline_reproduces_generator_goldens():
    env = dict(os.environ)
    env["PIPELINE_BENCH_DIR"] = os.path.join(
        REPO, ".tmp", "pipeline_bench_test"
    )
    proc = subprocess.run(
        [sys.executable, "scripts/bench_pipeline.py", "4000", "400", "2",
         "--check"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"--check failed\nstdout: {proc.stdout}\nstderr: {proc.stderr[-2000:]}"
    )
    assert "goldens: all invariants hold" in proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["docs"] == 4400


def test_check_goldens_detects_violation(tmp_path):
    """check_goldens must actually FAIL on a wrong result, not vacuously
    pass: feed it a doctored query output. Self-contained — generates its
    own tiny corpus instead of depending on the other test's artifacts."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import bench_pipeline as bp

    base = str(tmp_path / "goldens_corpus")
    bp.generate(base, 200, 20, 1)
    golden = json.load(open(os.path.join(base, "goldens.json")))
    qout = {
        "unique_users": [{"cnt": golden["distinct_users"] + 1}],
        "type_counts": [
            {"type": "node", "cnt": golden["n_nodes"]},
            {"type": "way", "cnt": golden["n_ways"]},
        ],
        "top_shops": [
            {"shop": s, "cnt": c} for s, c in golden["top_shops"]
        ],
        "top_highways": [
            {"highway": h, "cnt": c} for h, c in golden["top_highways"]
        ],
        "amenity_counts": [
            {"amenity": a, "cnt": c}
            for a, c in golden["amenity_counts"].items()
        ],
    }
    errs = bp.check_goldens(base, None, qout)
    assert errs and "distinct_users" in errs[0]
