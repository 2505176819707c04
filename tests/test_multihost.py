"""REAL multi-process distributed execution test.

Spawns two OS processes, each with 4 virtual CPU devices, that
``jax.distributed.initialize`` against a localhost coordinator, build the
global 8-device mesh through ``parallel.multihost``, and run the sharded
Monte-Carlo step (psum over gloo — the DCN analog). Asserts:

1. both processes report bitwise-identical replicated SimStats (the psum is
   global);
2. those stats equal a single-process 8-device run of the same step (the
   per-device PRNG folds depend only on GLOBAL device order, so process
   boundaries must not change any count).

This is the empirical backing for the multi-host layer (north star:
BASELINE.md:28, >=80% codewords/s at >=2 hosts; SURVEY.md §2.7/§7-step-9).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from tests.conftest import REPO_ROOT

CODE = "n2000_k1000"
BATCH = 16
PER = 0.3
STEPS = 2


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def two_process_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mp")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = []
    for pid in range(2):
        out = tmp / f"proc{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m",
                    "ldpc_erasure_codes_tpu.parallel._mp_worker",
                    "--coordinator", f"127.0.0.1:{port}",
                    "--num-processes", "2",
                    "--process-id", str(pid),
                    "--local-devices", "4",
                    "--out", str(out),
                    "--code", CODE,
                    "--batch", str(BATCH),
                    "--per", str(PER),
                    "--steps", str(STEPS),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    results = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
    for out in outs:
        with open(out) as f:
            results.append(json.load(f))
    return results


@pytest.mark.slow
def test_two_processes_agree(two_process_run):
    r0, r1 = two_process_run
    assert r0["info"]["process_count"] == 2
    assert r0["info"]["global_devices"] == 8
    assert r0["info"]["local_devices"] == 4
    assert r0["mesh_devices"] == 8
    # psum is global: every process sees identical replicated stats.
    assert r0["stats"] == r1["stats"]
    # All 8 devices' frames are counted.
    assert r0["stats"]["frames"] == 8 * BATCH * STEPS


@pytest.mark.slow
def test_matches_single_process_run(two_process_run):
    """The 2-process global-mesh stats equal a single-process 8-device run
    bitwise (PRNG folds depend only on global device order)."""
    import jax
    import jax.numpy as jnp

    from ldpc_erasure_codes_tpu.codes import get_code
    from ldpc_erasure_codes_tpu.parallel.mesh import (
        default_mesh,
        shard_sim_step,
    )
    from ldpc_erasure_codes_tpu.sim import DecoderConfig, SimConfig
    from ldpc_erasure_codes_tpu.sim.driver import make_sim_step

    code = get_code(CODE)
    cfg = SimConfig(
        code=CODE,
        batch=BATCH,
        track_values=False,
        decoder=DecoderConfig(kind="peel", max_iters=20, early_stop_k=True),
    )
    step = shard_sim_step(make_sim_step(code, cfg), default_mesh())
    key = jax.random.key(0)
    per = jnp.asarray(PER, jnp.float32)
    total = None
    for i in range(STEPS):
        stats = jax.block_until_ready(step(jax.random.fold_in(key, i), per))
        total = stats if total is None else jax.tree.map(
            lambda a, b: a + b, total, stats
        )
    local = {
        k: (v.tolist() if hasattr(v, "tolist") else int(v))
        for k, v in total._asdict().items()
    }
    assert local == two_process_run[0]["stats"]
