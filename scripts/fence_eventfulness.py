"""Per-sweep fence eventfulness of the unrolled peel schedule (host model).

VERDICT r4 next #1 asks for measured per-fence eventfulness fractions per
sweep to quantify the fence-gating lever (ops/pallas_peel.py
``fence_gate``): the gate skips a fence when its static symbol union holds
no erasure in any frame of the VMEM tile at sweep start — this script
replays the exact sequential Gauss-Seidel mask evolution on the host
(mask-only; value-independent) and reports, per sweep, what fraction of
fences is active under that predicate, i.e. the fraction of the baked op
payload a gated sweep actually executes.

Usage: python scripts/fence_eventfulness.py [--code n2040_k1530]
         [--per 0.1406] [--bt 32] [--blk 32] [--tiles 64] [--seed 0]

Prints one line per sweep: active-fence fraction (mean over tiles that are
still running that sweep), plus the tile-survival fraction and the implied
gated-vs-ungated op-payload ratio.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def simulate(code, per, bt, blk, tiles, seed, early_stop_k=None):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ldpc_erasure_codes_tpu.ops.arrays import device_arrays

    arrays = device_arrays(code)
    vi = np.asarray(arrays.vlist_idx)
    vl = np.asarray(arrays.vlist_len)
    m = vi.shape[0]
    n = code.n
    k_stop = code.k if early_stop_k is None else early_stop_k
    nf = -(-m // blk)
    # Static fence symbol unions.
    unions = []
    for f in range(nf):
        u = set()
        for c in range(f * blk, min((f + 1) * blk, m)):
            u |= set(int(x) for x in vi[c, : int(vl[c])])
        unions.append(sorted(u))
    rng = np.random.default_rng(seed)
    # Per-sweep stats across tiles: active fences, tiles still running.
    act_frac = []  # list of lists: per sweep, per running tile
    survive = []
    max_sweeps = 64
    for _ in range(tiles):
        er = rng.random((n + 1, bt)) < per
        er[n] = False
        sweep = 0
        while sweep < max_sweeps:
            # Fence activity at sweep start.
            act = [bool(er[u].any()) for u in unions]
            while len(act_frac) <= sweep:
                act_frac.append([])
                survive.append(0)
            act_frac[sweep].append(np.mean(act))
            survive[sweep] += 1
            changed = False
            for c in range(m):
                d = int(vl[c])
                nbrs = vi[c, :d]
                cnt = er[nbrs].sum(axis=0)
                deg1 = cnt == 1
                if deg1.any():
                    sub = er[nbrs][:, deg1]
                    er[np.ix_(nbrs, np.where(deg1)[0])] = False
                    changed = changed or sub.any()
            resid = er[:k_stop].sum()
            sweep += 1
            if not changed or resid == 0:
                break
    return act_frac, survive, tiles


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="n2040_k1530")
    ap.add_argument("--per", type=float, default=0.1406)
    ap.add_argument("--bt", type=int, default=32)
    ap.add_argument("--blk", type=int, default=32)
    ap.add_argument("--tiles", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from ldpc_erasure_codes_tpu.codes import get_code

    code = get_code(args.code)
    act_frac, survive, tiles = simulate(
        code, args.per, args.bt, args.blk, args.tiles, args.seed,
    )
    total_ungated = 0.0
    total_gated = 0.0
    print(
        f"code={args.code} per={args.per} bt={args.bt} blk={args.blk} "
        f"tiles={tiles}"
    )
    for s, (fr, sv) in enumerate(zip(act_frac, survive)):
        mean_fr = float(np.mean(fr))
        run_frac = sv / tiles
        total_ungated += run_frac  # every running tile executes all fences
        total_gated += run_frac * mean_fr
        print(
            f"sweep {s + 1}: tiles-running={run_frac:.3f} "
            f"active-fence-fraction={mean_fr:.3f}"
        )
    print(
        f"op-payload ratio gated/ungated = {total_gated / total_ungated:.3f}"
        f"  (sweeps weighted by tile survival)"
    )


if __name__ == "__main__":
    main()
