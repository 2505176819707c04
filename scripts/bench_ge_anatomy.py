"""Fine-grained GE-branch stage anatomy at the .2031 hybrid shape (TPU).

Times each piece of the hybrid GE branch separately with realistic
inputs (the numbers behind VALIDATION.md's round-5 corrected
attribution): compaction gather, full packed GE, cube build, syndrome,
transform apply, t_bits unpack, tile-direct writeback. Run after the
peel compile is warm; ~2 min.

Run: python scripts/bench_ge_anatomy.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, numpy as np

from ldpc_erasure_codes_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from ldpc_erasure_codes_tpu import channel as ch
from ldpc_erasure_codes_tpu.codes import get_code
from ldpc_erasure_codes_tpu.ops import device_arrays
from ldpc_erasure_codes_tpu.ops.pallas_encode import encode_packed_vmem
from ldpc_erasure_codes_tpu.ops.pallas_peel import default_b_tile, static_topology, peel_decode_vmem, untile_wide
from ldpc_erasure_codes_tpu.ops.compact import residual_order
from ldpc_erasure_codes_tpu.ops.ge import ge_solve_packed, erased_indices, _words_to_bits
from ldpc_erasure_codes_tpu.ops.pallas_nbmm import f2_matvec_wide, f2_matmul_batched

code = get_code("n2040_k1530"); arrays = device_arrays(code)
b, per, emax, f_max, w = 1024, 0.2031, 512, 448, 256
bt = default_b_tile(code.n, w); topo = static_topology(arrays)
key = jax.random.key(0)
src = jax.random.bits(key, (b, code.k, w), dtype=jnp.uint32)
cw = jax.block_until_ready(encode_packed_vmem(arrays, src, b_tile=bt, tiled_out=True))
mask = ch.iid_erasures(jax.random.fold_in(key, 7), (b, code.n), per)
v_t, e_peel, _ = peel_decode_vmem(arrays, cw, mask, max_iters=10, b_tile=bt, tiled=True, schedule="unrolled", static_topo=topo)
v_t, e_peel = jax.block_until_ready((v_t, e_peel))

def timed(name, fn, *args, reps=8):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)
    return out

n, m = code.n, code.m
# stage 1: compaction select + untile gather
@jax.jit
def s1(v, e):
    sel, is_resid, overflow = residual_order(e, f_max)
    vf = untile_wide(v, b, n)[sel]
    return vf, e[sel], sel
vf_sub, e_sub, sel = timed("compact sel + untile gather", s1, v_t, e_peel)

# stage 2: full packed GE solve (rows mode)
@jax.jit
def s2(vf, e):
    x, sidx, e2, failed = ge_solve_packed(arrays, vf, e, emax=emax, return_rows=True)
    return jnp.sum(x[:, 0]), jnp.sum(sidx), jnp.sum(failed)
timed("ge_solve_packed (all)", s2, vf_sub, e_sub)

# stage 2a: erased_indices + cube build alone
wa, wt = emax // 32, -(-m // 32)
@jax.jit
def s2a(e):
    er_idx, real, nreal = erased_indices(e, emax)
    a_top = jnp.take(arrays.h.astype(jnp.uint8), er_idx, axis=1)
    a_mb = jnp.transpose(a_top, (0, 2, 1)) * jnp.transpose(real)[None].astype(jnp.uint8)
    a_pad = jnp.pad(a_mb, ((0, 0), (0, wa * 32 - emax), (0, 0)))
    bitw = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    a_pk = jnp.sum(a_pad.reshape(m, wa, 32, f_max).astype(jnp.uint32) * bitw[None, None, :, None], axis=2, dtype=jnp.uint32)
    return jnp.sum(a_pk), jnp.sum(er_idx)
timed("cube build (idx+take+pack)", s2a, e_sub)

# stage 2b: syndrome
n_pad = -(-(n + 1) // 32) * 32
m_pad = -(-m // 8) * 8
values_p = jnp.pad(vf_sub, ((0, 0), (0, n_pad - n), (0, 0)))
vb = jax.block_until_ready(jax.jit(lambda vp: jax.lax.bitcast_convert_type(vp, jnp.uint8).reshape(f_max, n_pad, 4 * w))(values_p))
ht = jnp.pad(arrays.h.astype(jnp.int8), ((0, m_pad - m), (0, n_pad - n)))
@jax.jit
def s2b(vb):
    return jnp.sum(f2_matvec_wide(vb, ht)[:, 0])
timed("syndrome f2_matvec_wide", s2b, vb)

# stage 2c: apply
rhs_mw = jax.block_until_ready(f2_matvec_wide(vb, ht))
tb = jax.block_until_ready(jax.random.randint(key, (f_max, emax, m_pad), 0, 2, dtype=jnp.int8))
@jax.jit
def s2c(rhs, tb):
    return jnp.sum(f2_matmul_batched(rhs, tb)[:, 0])
timed("apply f2_matmul_batched", s2c, rhs_mw, tb)

# stage 2d: t_bits unpack
t_rows = jax.block_until_ready(jax.random.bits(key, (f_max, emax, wt), dtype=jnp.uint32))
@jax.jit
def s2d(tr):
    return jnp.sum(_words_to_bits(tr)[..., :m].astype(jnp.int32))
timed("t_bits unpack", s2d, t_rows)

# stage 3: tile-direct writeback scatter
x = jax.block_until_ready(jax.random.bits(key, (f_max, emax, w), dtype=jnp.uint32))
sidx = jax.block_until_ready(jnp.zeros((f_max, emax), jnp.int32) + n)
@jax.jit
def s3(v, x, sidx, sel):
    t_idx = sel // bt; off = sel % bt
    rows = sidx * bt + off[:, None]
    v = v.at[t_idx[:, None], rows].set(x)
    return jnp.sum(v[0, 0])
timed("tile-direct writeback", s3, v_t, x, sidx, sel)
