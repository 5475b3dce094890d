"""Smoke test of the >2^31-capable sharded big-index classify path
(scripts/big_classify_demo.py) at toy scale: builds with the int64
native builder, saves/loads the sharded ktx layout (per-shard int32
occ + int64 shard bases), classifies on an 8-virtual-CPU mesh with the
int64 owner-computes step, and asserts parity vs the host big-rank
oracle.  The at-scale (4.4 Gaa) run is recorded in BIGCLASSIFY.log."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_big_classify_demo_smoke(tmp_path):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the script pins cpu itself
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "big_classify_demo.py"),
         "--letters", "2000000", "--allow-small", "--reads", "128",
         "--verify", "8", "--out", str(tmp_path / "bigktx")],
        capture_output=True, text=True, timeout=900, env=env, cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["verified"] == 8
    assert summary["classified"] > 0
