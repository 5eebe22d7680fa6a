"""Registry-freeze discipline (round-7 verdict, Next #1): the committed
REGISTRY_FREEZE.txt must match the live query registry exactly, so a query
registered (or retired) without updating the freeze file fails CI in the
same commit — the round-6/7 failure mode was late registry commits landing
AFTER the driver's correctness pass, leaving green-but-unsnapshotted rows.

The snapshot half of the gate (every frozen name present and green in
CORRECTNESS_rN.json) is tools/registry_gate.py, run round-end.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _frozen() -> list[str]:
    with open(os.path.join(REPO, "REGISTRY_FREEZE.txt")) as f:
        return sorted(
            ln.strip() for ln in f if ln.strip() and not ln.startswith("#"))


def test_registry_matches_freeze_file():
    from graflo_spark.catalog import QUERIES

    assert sorted(QUERIES) == _frozen()


def test_registry_fits_driver_window():
    # the driver verifies at most 50 rows (empirical: r1-r5 snapshots are
    # exactly 50 against larger registries; r7 dropped the 51st row, the
    # last in registration order). More rows = silent rotation out of
    # verification — consolidate into suites instead.
    from graflo_spark.catalog import QUERIES

    assert len(QUERIES) <= 50, len(QUERIES)


def test_every_query_has_oracle_or_documented_rows_only():
    # every registered query should carry an oracle; rows-only entries are
    # the documented exceptions (hash-membership sampling etc.) — keep the
    # exception list explicit so additions are deliberate
    from graflo_spark.catalog import ORACLES, QUERIES

    rows_only = sorted(set(QUERIES) - set(ORACLES))
    assert rows_only == [], rows_only


def test_gate_tool_passes_on_current_tree():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "registry_gate.py")],
        capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr


def test_gate_tool_catches_missing_snapshot_row(tmp_path):
    # a snapshot missing one frozen row must fail the gate — this is the
    # exact r7 incident (infer_schema_suite green but absent)
    from graflo_spark.catalog import QUERIES

    snap = {
        n: {"rows_match": True, "schema_match": True,
            "hash_match": True, "err": None}
        for n in QUERIES
    }
    dropped = sorted(QUERIES)[0]
    del snap[dropped]
    p = tmp_path / "CORRECTNESS_rX.json"
    p.write_text(json.dumps(snap))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "registry_gate.py"),
         str(p)],
        capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 1
    assert dropped in out.stdout
