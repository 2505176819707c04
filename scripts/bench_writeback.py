"""Writeback-scatter formulation A/B at the .2031 hybrid shape (TPU).

VALIDATION's round-5 anatomy pins the tile-direct writeback scatter at
23-29 ms (~10 GB/s effective over 235 MB) and lists the index-form
variants as measured negatives (1-D, sorted, donated). The one standard
formulation not yet tried is the scatter->gather conversion: rebuild the
tile-major tensor as one dense gather + select — out[t, row] =
xf[flat[t,row]] if a solved row lands there else v[t,row] — which trades
scattered 1 KB row writes at scatter speed for a full-tensor rewrite at
dense HBM bandwidth (~8.8 GB of traffic at ~700 GB/s ~ 13 ms if the
gather fuses; the scatter moves 40x less data but measures slower).
Index maps (slot_of: tile-frame-offset -> bucket slot; inv: per-slot
symbol -> solved row) are built with two small scatters (~4 MB).

All operands are generated ON DEVICE (a 4.27 GB host->device transfer
rides the serving tunnel at link speed — minutes — so host-built inputs
are a measurement bug, not just slow). Donated variants regenerate the
aliasable tensor on device between reps, outside the timed region.

Run: python scripts/bench_writeback.py   (after warm cache; ~2 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

from ldpc_erasure_codes_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from ldpc_erasure_codes_tpu.codes import get_code
from ldpc_erasure_codes_tpu.ops import device_arrays
from ldpc_erasure_codes_tpu.ops.pallas_peel import default_b_tile

code = get_code("n2040_k1530")
b, emax, f_max, w = 1024, 512, 448, 256
n = code.n
bt = default_b_tile(n, w)
T = b // bt
R = (n + 1) * bt
key = jax.random.key(0)

# Index data is small — host-built is fine. ~350 distinct solved symbols
# per bucket slot (the measured .2031 residual width), distinct frames.
# Production invariants: x rows whose sidx is the pad symbol n are ZERO
# and the tile pad block is ZERO, so the scatter's pad writes are no-ops
# and the gather form may simply keep the pad block.
rng = np.random.default_rng(0)
sel_np = rng.choice(b, size=f_max, replace=False).astype(np.int32)
sidx_np = np.full((f_max, emax), n, np.int32)
for j in range(f_max):
    sidx_np[j, :350] = rng.choice(n, size=350, replace=False)
sel = jnp.asarray(sel_np)
sidx = jnp.asarray(sidx_np)


@jax.jit
def make_v(k):
    v = jax.random.bits(k, (T, R, w), dtype=jnp.uint32)
    # Zero the pad block (rows n*bt .. (n+1)*bt).
    row = jnp.arange(R) // bt
    return jnp.where((row == n)[None, :, None], jnp.uint32(0), v)


@jax.jit
def make_x(k, sidx):
    x = jax.random.bits(k, (f_max, emax, w), dtype=jnp.uint32)
    return jnp.where((sidx == n)[:, :, None], jnp.uint32(0), x)


v_t = jax.block_until_ready(make_v(key))
x = jax.block_until_ready(make_x(jax.random.fold_in(key, 1), sidx))


def scatter(v, x, sidx, sel):
    t_idx = sel // bt
    off = sel % bt
    rows = sidx * bt + off[:, None]
    return v.at[t_idx[:, None], rows].set(x)


def gather_rebuild(v, x, sidx, sel):
    t_idx = sel // bt
    off = sel % bt
    # slot_of[t, o] = bucket slot decoding frame t*bt+o (else f_max).
    slot_of = jnp.full((T, bt), f_max, jnp.int32).at[t_idx, off].set(
        jnp.arange(f_max, dtype=jnp.int32)
    )
    # inv[j, s] = solved row r of slot j holding symbol s (else emax).
    inv = jnp.full((f_max + 1, n + 1), emax, jnp.int32).at[
        jnp.arange(f_max, dtype=jnp.int32)[:, None], sidx
    ].set(jnp.broadcast_to(jnp.arange(emax, dtype=jnp.int32), sidx.shape))
    row = jnp.arange(R, dtype=jnp.int32)
    s = row // bt
    o = row % bt
    j = slot_of[:, o]                       # (T, R)
    r = inv[j, s[None, :]]                  # (T, R)
    valid = (j < f_max) & (r < emax) & (s[None, :] < n)
    xf = x.reshape(f_max * emax, w)
    flat = jnp.where(valid, j * emax + r, 0)
    return jnp.where(valid[:, :, None], xf[flat], v)


def timed(name, fn, *, donate, reps=8):
    jfn = jax.jit(fn, donate_argnums=(0,) if donate else ())
    times = []
    for i in range(reps + 1):
        # Fresh aliasable buffer per rep (donation frees it), built on
        # device OUTSIDE the timed region; vary content per rep so the
        # runtime cannot dedupe identical executions.
        vc = (jax.block_until_ready(make_v(jax.random.fold_in(key, 100 + i)))
              if donate else v_t)
        xi = jax.block_until_ready(
            make_x(jax.random.fold_in(key, 200 + i), sidx)
        )
        args = (vc, xi, sidx, sel)
        t0 = time.perf_counter()
        out = jax.block_until_ready(jfn(*args))
        if i:  # skip warmup
            times.append(time.perf_counter() - t0)
        del out
    dt = float(np.median(times)) * 1e3
    print(f"{name:34s} {dt:8.2f} ms (median of {reps})", flush=True)
    return dt


print(f"shape: T={T} bt={bt} R={R} W={w} f_max={f_max} emax={emax} "
      f"scatter payload {f_max*emax*w*4/1e6:.0f} MB, "
      f"tensor {T*R*w*4/1e9:.2f} GB", flush=True)
timed("scatter (current)", scatter, donate=False)
timed("scatter donated", scatter, donate=True)
timed("gather rebuild", gather_rebuild, donate=False)
timed("gather rebuild donated", gather_rebuild, donate=True)

# Correctness cross-check: both forms must agree bit-exactly under the
# production pad invariants (device compare; only the verdict is fetched).
@jax.jit
def agree(v, x, sidx, sel):
    return jnp.array_equal(scatter(v, x, sidx, sel),
                           gather_rebuild(v, x, sidx, sel))

ok = bool(agree(v_t, x, sidx, sel))
print(f"equality scatter==gather: {ok}", flush=True)
sys.exit(0 if ok else 1)
