"""Two-process jax.distributed smoke test on the CPU backend.

Spawns two subprocesses (tests/_multihost_child.py) that initialize
``jax.distributed`` through ``parallel.mesh.initialize_distributed``, build a
4-device global mesh (2 local devices each), and run one data-sharded Picard
rollout step over a global batch — so the multi-host init path stops being
dead code (VERDICT.md round-1 Weak #9 / Next-round #7).
"""

import os
import socket
import subprocess
import sys

import pytest

CHILD = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# No pytest.mark.timeout here: pytest-timeout is not installed in this image
# (the marker would be inert); the subprocess communicate(timeout=240) below
# is the real hang guard.
def _run_children(mode: str):
    port = _free_port()
    env = dict(os.environ)
    # children must see ONLY the repo: a sitecustomize on the inherited
    # PYTHONPATH (e.g. a TPU relay shim) would register its platform plugin
    # and break the CPU multi-process init
    env["PYTHONPATH"] = REPO
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(pid), str(port), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process={pid}" in out, out
    # the replicated reduction must agree bit-for-bit across processes
    sums = {
        o.strip().split("sum=")[1].split()[0].splitlines()[0] for o in outs
    }
    assert len(sums) == 1, sums


def test_two_process_distributed_rollout():
    _run_children("rollout")


def test_two_process_distributed_trainer():
    """The dual-CG GP trainer's cross-process all-gather (VERDICT round-4
    Next #7): make_distributed_train runs on a 2-process x 2-device global
    'model' mesh; the children assert dense-trainer agreement and this
    parent asserts the replicated representer weights agree across
    processes."""
    _run_children("trainer")
