"""Two-process multi-host smoke test: the sharded MEM step on a mesh
spanning processes (jax.distributed over CPU), vs the single-process
result.  This is the DCN-scale-out skeleton — the same collectives that
run over ICI on one host run over the coordination fabric here
(BASELINE "N >= 2 hosts" scaling point; the reference itself is
single-node, SURVEY §2.5)."""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_mem(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    coord = f"127.0.0.1:{_free_port()}"
    outs = [str(tmp_path / f"w{p}.json") for p in range(2)]
    procs = []
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    env.pop("XLA_FLAGS", None)
    for p in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(here, "multihost_worker.py"),
             coord, "2", str(p), outs[p]],
            env=env, cwd=os.path.dirname(here),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    for p, proc in enumerate(procs):
        try:
            out, err = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert proc.returncode == 0, f"worker {p}: {err[-3000:]}"

    rows = {}
    for p in range(2):
        with open(outs[p]) as fh:
            part = json.load(fh)
        for k, v in part.items():
            rows[int(k)] = v
    # data axis = 4 rows; each process owns 2
    assert sorted(rows) == [0, 1, 2, 3]

    # single-process truth: run the same program on one process with 8
    # local devices (the worker module itself, nprocs=1)
    truth_out = str(tmp_path / "truth.json")
    env1 = dict(env)
    res = subprocess.run(
        [sys.executable, os.path.join(here, "multihost_worker.py"),
         f"127.0.0.1:{_free_port()}", "1", "0", truth_out],
        env=env1, cwd=os.path.dirname(here),
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    with open(truth_out) as fh:
        truth = {int(k): v for k, v in json.load(fh).items()}
    # nprocs=1 gives 4 devices -> (data=2, index=2): same per-read
    # classification for the rows both runs cover
    for g in truth:
        assert rows[g] == truth[g], (g, rows[g], truth[g])
