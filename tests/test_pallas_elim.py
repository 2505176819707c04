"""VMEM-resident packed elimination vs a NumPy reference.

The kernel (ops/pallas_elim.py) must produce the SAME eliminated cube,
pivot-row choices, and failure flags as the swap-free formulation it
replaces (ops/ge.py::ge_solve_packed's fori_loop) — interpret mode on
CPU, random packed systems including rank-deficient frames.
"""

import numpy as np
import jax.numpy as jnp

from ldpc_erasure_codes_tpu.ops.pallas_elim import f2_eliminate


def _ref_eliminate(r, nreal, emax):
    """NumPy swap-free elimination, mirrors ops/ge.py exactly."""
    c, m, b = r.shape
    r = r.copy()
    used = np.zeros((m, b), bool)
    pivrow = np.zeros((emax, b), np.int32)
    failed = np.zeros(b, bool)
    for col in range(emax):
        colw = r[col >> 5]
        colv = (colw >> np.uint32(col & 31)) & 1
        cand = (colv == 1) & ~used
        has = cand.any(axis=0)
        piv = np.where(has, cand.argmax(axis=0), m)
        is_piv = np.arange(m)[:, None] == piv[None, :]
        used |= is_piv
        pivrow[col] = np.where(has, piv, 0)
        sel = is_piv.astype(np.uint32)
        prow = (r * sel[None]).sum(axis=1, dtype=np.uint32)  # (c, b)
        elim = colv * (1 - sel) * has.astype(np.uint32)
        r ^= prow[:, None, :] * elim[None]
        failed |= (~has) & (col < nreal)
    return r, pivrow, failed


def test_matches_reference_elimination():
    rng = np.random.default_rng(0)
    c, m, b, emax = 4, 24, 256, 40
    # Sparse-ish random packed rows; a few all-zero frames force failures.
    r = rng.integers(0, 1 << 32, (c, m, b), dtype=np.uint32)
    r &= rng.integers(0, 1 << 32, (c, m, b), dtype=np.uint32)
    r[:, :, :3] = 0
    r[:, 20:, :] = 0  # pad-style zero rows
    nreal = rng.integers(0, emax + 1, b).astype(np.int32)
    ref_r, ref_piv, ref_fail = _ref_eliminate(r, nreal, emax)
    out_r, out_piv, out_fail = f2_eliminate(
        jnp.asarray(r), jnp.asarray(nreal[None]), emax=emax, b_tile=128,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out_r), ref_r)
    np.testing.assert_array_equal(np.asarray(out_piv), ref_piv)
    np.testing.assert_array_equal(np.asarray(out_fail)[0] != 0, ref_fail)


def _ref_eliminate_nb(r, nreal, emax):
    """NumPy GF(256) swap-free elimination, mirrors ge_solve_wide_nb."""
    from ldpc_erasure_codes_tpu import gf

    t = gf.build_tables()
    mul, inv = t.mul, t.inv
    c, m, b = r.shape
    cols = np.zeros((4 * c, m, b), np.uint8)
    for w in range(c):
        for j in range(4):
            cols[4 * w + j] = (r[w] >> (8 * j)) & 0xFF
    used = np.zeros((m, b), bool)
    pivrow = np.zeros((emax, b), np.int32)
    failed = np.zeros(b, bool)
    for col in range(emax):
        colv = cols[col]
        cand = (colv != 0) & ~used
        has = cand.any(axis=0)
        piv = np.where(has, cand.argmax(axis=0), m)
        is_piv = np.arange(m)[:, None] == piv[None, :]
        used |= is_piv
        pivrow[col] = np.where(has, piv, 0)
        for f in range(b):
            if not has[f]:
                failed[f] |= col < nreal[f]
                continue
            p = piv[f]
            pe = colv[p, f]
            prow = mul[cols[:, p, f], inv[pe]]
            cols[:, p, f] = prow
            fac = cols[col, :, f].copy()
            fac[p] = 0
            cols[:, :, f] ^= mul[prow[:, None], fac[None, :]]
    # repack
    out = np.zeros_like(r)
    for w in range(c):
        for j in range(4):
            out[w] |= cols[4 * w + j].astype(np.uint32) << (8 * j)
    return out, pivrow, failed


def test_nb_matches_reference_elimination():
    from ldpc_erasure_codes_tpu.ops.pallas_elim import gf256_eliminate

    rng = np.random.default_rng(2)
    c, m, b, emax = 6, 16, 128, 20
    r = rng.integers(0, 1 << 32, (c, m, b), dtype=np.uint32)
    r &= rng.integers(0, 1 << 32, (c, m, b), dtype=np.uint32)
    r[:, :, :2] = 0
    r[:, 14:, :] = 0
    nreal = rng.integers(0, emax + 1, b).astype(np.int32)
    ref_r, ref_piv, ref_fail = _ref_eliminate_nb(r, nreal, emax)
    out_r, out_piv, out_fail = gf256_eliminate(
        jnp.asarray(r), jnp.asarray(nreal[None]), emax=emax, b_tile=128,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out_piv), ref_piv)
    np.testing.assert_array_equal(np.asarray(out_fail)[0] != 0, ref_fail)
    np.testing.assert_array_equal(np.asarray(out_r), ref_r)


def test_validates_shapes():
    import pytest

    with pytest.raises(ValueError):
        f2_eliminate(
            jnp.zeros((2, 8, 100), jnp.uint32),
            jnp.zeros((1, 100), jnp.int32),
            emax=8,
            b_tile=64,
            interpret=True,
        )


def _zero_pad_cols_f2(r, nreal, emax, a_words):
    """Zero A bits >= nreal per lane (the solver's pad-column invariant)."""
    r = r.copy()
    c, m, b = r.shape
    for f in range(b):
        for col in range(int(nreal[f]), emax):
            r[col >> 5, :, f] &= ~np.uint32(1 << (col & 31))
    return r


def test_f2_a_words_cuts_are_exact():
    """a_words (round 5: dynamic max(nreal) loop bound + completed-A-word
    skipping) must not change pivot rows, failure flags, or any non-failed
    lane's cube (failed lanes' cube is contractually garbage)."""
    rng = np.random.default_rng(4)
    c, m, b, emax = 6, 24, 256, 64  # wa = 2 words of A, wt = 4 of T
    wa = emax // 32
    r = rng.integers(0, 1 << 32, (c, m, b), dtype=np.uint32)
    r &= rng.integers(0, 1 << 32, (c, m, b), dtype=np.uint32)
    r[:, 20:, :] = 0
    nreal = rng.integers(0, emax + 1, b).astype(np.int32)
    nreal[:4] = [0, 3, 40, 64]
    r[:wa] = _zero_pad_cols_f2(r[:wa], nreal, emax, wa)[:wa]
    base = f2_eliminate(
        jnp.asarray(r), jnp.asarray(nreal[None]), emax=emax, b_tile=128,
        interpret=True,
    )
    fast = f2_eliminate(
        jnp.asarray(r), jnp.asarray(nreal[None]), emax=emax, b_tile=128,
        interpret=True, a_words=wa,
    )
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(base[1]))
    np.testing.assert_array_equal(np.asarray(fast[2]), np.asarray(base[2]))
    ok = np.asarray(base[2])[0] == 0
    np.testing.assert_array_equal(
        np.asarray(fast[0])[:, :, ok], np.asarray(base[0])[:, :, ok]
    )


def test_nb_a_words_cuts_are_exact():
    from ldpc_erasure_codes_tpu.ops.pallas_elim import gf256_eliminate

    rng = np.random.default_rng(5)
    c, m, b, emax = 6, 16, 128, 20  # wa = 5 byte-words of A, wt = 1 of T
    wa = -(-emax // 4)
    r = rng.integers(0, 1 << 32, (c, m, b), dtype=np.uint32)
    r &= rng.integers(0, 1 << 32, (c, m, b), dtype=np.uint32)
    r[:, 14:, :] = 0
    nreal = rng.integers(0, emax + 1, b).astype(np.int32)
    nreal[:3] = [0, 7, 20]
    # Zero A BYTES >= nreal per lane (pad-column invariant).
    for f in range(b):
        for col in range(int(nreal[f]), emax):
            r[col >> 2, :, f] &= ~np.uint32(0xFF << (8 * (col & 3)))
    base = gf256_eliminate(
        jnp.asarray(r), jnp.asarray(nreal[None]), emax=emax, b_tile=128,
        interpret=True,
    )
    fast = gf256_eliminate(
        jnp.asarray(r), jnp.asarray(nreal[None]), emax=emax, b_tile=128,
        interpret=True, a_words=wa,
    )
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(base[1]))
    np.testing.assert_array_equal(np.asarray(fast[2]), np.asarray(base[2]))
    ok = np.asarray(base[2])[0] == 0
    np.testing.assert_array_equal(
        np.asarray(fast[0])[:, :, ok], np.asarray(base[0])[:, :, ok]
    )
