"""The multi-host scaling argument as CI: cross-device traffic is tiny.

VALIDATION.md claims the sharded Monte-Carlo step's all-reduce payload is
O(max_iters) int32 counters per step and independent of batch size — the
basis of the ">=80% scaling efficiency at >=2 hosts is an input-pipeline
property" argument (the reference has no distributed layer at all,
SURVEY §2.7). This test turns that prose into an assertion: it traces the
production sharded step and walks the jaxpr for cross-device collectives;
if someone accidentally psums per-frame data, the payload scales with the
batch and this fails.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ldpc_erasure_codes_tpu.parallel import default_mesh, shard_sim_step
from ldpc_erasure_codes_tpu.sim import SimConfig, make_sim_step
from ldpc_erasure_codes_tpu.sim.config import DecoderConfig

_COLLECTIVES = (
    "psum",
    "all_reduce",
    "all_gather",
    "reduce_scatter",
    "all_to_all",
    "ppermute",
)


def _subjaxprs(v):
    from jax.extend.core import ClosedJaxpr, Jaxpr  # jax >= 0.4.x layout

    if isinstance(v, ClosedJaxpr):
        return [v.jaxpr]
    if isinstance(v, Jaxpr):
        return [v]
    if isinstance(v, (tuple, list)):
        return [j for e in v for j in _subjaxprs(e)]
    return []


def _collective_bytes(jaxpr) -> int:
    """Total bytes entering cross-device collective primitives (recursive)."""
    total = 0
    for eqn in jaxpr.eqns:
        if any(s in eqn.primitive.name for s in _COLLECTIVES):
            for v in eqn.invars:
                aval = getattr(v, "aval", None)
                if aval is not None and hasattr(aval, "shape"):
                    total += int(np.prod(aval.shape, dtype=np.int64)) * (
                        np.dtype(aval.dtype).itemsize
                    )
        for pv in eqn.params.values():
            for sub in _subjaxprs(pv):
                total += _collective_bytes(sub)
    return total


def test_dcn_payload_is_counters_only():
    mesh = default_mesh()
    assert mesh.devices.size >= 2, "conftest provides the 8-device CPU mesh"
    max_iters = 50
    payloads = {}
    for batch in (256, 1024):
        cfg = SimConfig(
            code="n2000_k1000",
            batch=batch,
            track_values=False,
            decoder=DecoderConfig(kind="peel", max_iters=max_iters,
                                  early_stop_k=True),
        )
        step = make_sim_step(cfg.code, cfg)
        sharded = shard_sim_step(step, mesh)
        jaxpr = jax.make_jaxpr(sharded)(
            jax.random.key(0), jnp.float32(0.3)
        )
        payloads[batch] = _collective_bytes(jaxpr.jaxpr)

    # The stats pytree is 8 int32 scalars (round 5 added the escalations
    # counter) + the (max_iters + 1,) iteration histogram; nothing else may
    # cross the interconnect.
    bound = (8 + max_iters + 1) * 4
    assert payloads[256] == payloads[1024], (
        f"collective payload scales with batch: {payloads}"
    )
    assert 0 < payloads[256] <= bound, (
        f"payload {payloads[256]}B exceeds the O(max_iters) counter bound "
        f"{bound}B — per-frame data is crossing the interconnect"
    )
