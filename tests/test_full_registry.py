"""Full-registry oracle gate (slow): every ``queries()`` entry vs its DuckDB
oracle at sf0.01 — the local superset of the driver's sampled t2 gate.

The driver samples ~50 of the registry per round; the r3/r4 events outage
broke 18 queries of which only 4 were driver-visible. This test makes "all
queries green" one command:

    python -m pytest tests/test_full_registry.py --runslow
    # or, equivalently, the underlying CLI:
    python tools/check_oracle.py /root/testdata/sf0.01
"""

from __future__ import annotations

import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_full_registry_matches_oracles():
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"full-registry oracle gate failed:\n{tail}"


def test_full_registry_matches_oracles_sf01():
    """r6 verdict item 3: the SAME gate at 10x the driver's compare scale
    (sf0.1) — catches scale-sensitive divergence (quantile interpolation,
    FP accumulation order, fan-out assumptions that only bind with more
    data) that sf0.01 can't. Run once per round before the snapshot."""
    proc = subprocess.run(
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.1"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=7200,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"sf0.1 full-registry oracle gate failed:\n{tail}"
