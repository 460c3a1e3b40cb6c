"""The commit gate must be GREEN at HEAD.

scripts/gate.py is wired as .githooks/pre-commit, but a hook can be defeated
with ``git commit --no-verify`` — which is exactly how the round-7/8/9
end-of-round snapshots each shipped with a stale sweep or plan artifact.
A pytest cannot be no-verified away: this test simply runs the gate's main()
and asserts it exits 0, so any commit that leaves the registry and the
committed ORACLE_r*.txt / PLANS_r*.json artifacts out of sync turns the
suite red.

No Spark session needed — gate.py only imports the registry and parses the
committed artifacts.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gate_green_at_head():
    spec = importlib.util.spec_from_file_location(
        "gate", os.path.join(REPO, "scripts", "gate.py")
    )
    gate = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gate)
    assert gate.main() == 0, (
        "commit gate is RED at HEAD — regenerate the sweep/plan artifacts "
        "(scripts/check_oracle.py + scripts/plan_audit.py) in this commit"
    )
