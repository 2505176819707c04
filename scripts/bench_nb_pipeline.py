"""Ground-truth NB end-to-end pipeline timing with PER-REP blocking (TPU).

bench_nb_stages.py's hybrid/pipeline legs use the standard
dispatch-then-block-once rep loop; in the 2026-08-21 session those two
legs (and only those) returned physically impossible times (0.36-0.54
ms/step for a chain whose peel stage alone measures ~20 ms) while the
src/encode/peel legs and bench.py read sane numbers from the SAME
pattern in the SAME process. This probe removes every amortization:
each rep uses a fresh key and is individually block_until_ready'd, so
the number includes one tunnel round-trip (~1-2 ms) but cannot be
deduped, cancelled, or coalesced by the serving runtime.

Run: python scripts/bench_nb_pipeline.py [--reps N]
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
from ldpc_erasure_codes_tpu.ops import device_arrays, hybrid_decode
from ldpc_erasure_codes_tpu.ops.pallas_encode import (
    encode_packed_vmem, static_enc_topology,
)
from ldpc_erasure_codes_tpu.ops.pallas_peel import static_topology

reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 6
code = get_code("n2040_k1530_gf256")
arrays = device_arrays(code)
b, wb, bt, per = 512, 1024, 32, 0.1406
enc_topo = static_enc_topology(arrays, code.k)
peel_topo = static_topology(arrays)
key = jax.random.key(3)


@jax.jit
def pipe(k, src32):
    src = jax.lax.bitcast_convert_type(src32, jnp.uint8).reshape(
        b, code.k, wb
    )
    cw = encode_packed_vmem(
        arrays, src, gf_order=256, b_tile=bt, tiled_out=True,
        static_topo=enc_topo,
    )
    mask = ch.iid_erasures(k, (b, code.n), per)
    v, e, iters, failed = hybrid_decode(
        arrays, cw, mask, gf_order=256, peel_iters=10, emax=128,
        impl="vmem", ge_subbatch=64, b_tile=bt, tiled=True,
        static_topo=peel_topo,
    )
    digest = jnp.bitwise_xor.reduce(jnp.bitwise_xor.reduce(v, axis=1), axis=0)
    return digest, jnp.sum(failed)


src_fixed = jax.block_until_ready(
    jax.random.bits(jax.random.fold_in(key, 77), (b, code.k, wb // 4),
                    dtype=jnp.uint32)
)
t0 = time.perf_counter()
jax.block_until_ready(pipe(jax.random.fold_in(key, 999), src_fixed))
print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
times = []
for i in range(reps):
    k = jax.random.fold_in(key, 1000 + i)
    t0 = time.perf_counter()
    out = jax.block_until_ready(pipe(k, src_fixed))
    times.append(time.perf_counter() - t0)
    print(f"rep {i}: {times[-1]*1e3:8.2f} ms  digest[0]={int(out[0][0])} "
          f"failed={int(out[1])}", flush=True)
dt = float(np.median(times))
gbps = b * code.k * 8 * wb / dt / 1e9
print(f"NB pipeline per-rep-blocked: {dt*1e3:.2f} ms/step = {gbps:.1f} "
      f"Gbps info (median of {reps})", flush=True)
