"""Block assembler tests: out-of-order packets -> decode-ready batches ->
end-to-end recovery through the device decoder."""

import numpy as np
import jax
import jax.numpy as jnp

from ldpc_erasure_codes_tpu.codes import toy_code  # noqa: F401
from ldpc_erasure_codes_tpu.ops import device_arrays, encode_packed, hybrid_decode
from ldpc_erasure_codes_tpu.utils.streaming import (
    BlockAssembler,
    HEADER_BYTES,
    make_packet,
    unpack_header,
)


def test_header_roundtrip():
    p = make_packet(3, 0xDEADBEEF, 513, b"\x00" * 4)
    assert len(p) == HEADER_BYTES + 4
    assert unpack_header(p) == (3, 0xDEADBEEF, 513)


def test_out_of_order_assembly():
    n, k, sb = 8, 5, 4
    asm = BlockAssembler(n, k, sb, decode_at_k=False)
    rng = np.random.default_rng(0)
    payloads = [rng.integers(0, 256, sb, dtype=np.uint8).tobytes() for _ in range(n)]
    order = rng.permutation(n)
    for s in order:
        asm.push(make_packet(0, 7, int(s), payloads[s]))
    assert asm.ready_count == 1
    nums, vals, erased = asm.drain()
    assert nums.tolist() == [7]
    assert not erased.any()
    for s in range(n):
        assert vals[0, s].tobytes() == payloads[s]


def test_decode_at_k_trigger_and_erasures():
    n, k, sb = 10, 6, 2
    asm = BlockAssembler(n, k, sb, decode_at_k=True)
    for s in range(k):  # exactly k packets -> immediate drain
        asm.push(make_packet(0, 1, s, bytes([s, s])))
    assert asm.ready_count == 1
    _, vals, erased = asm.drain()
    np.testing.assert_array_equal(erased[0], [False] * k + [True] * (n - k))
    assert (vals[0, k:] == 0).all()  # erased slots zero (invariant)


def test_eviction_and_flush():
    asm = BlockAssembler(4, 2, 1, max_blocks=2, decode_at_k=False)
    for blk in range(3):  # 3 in-flight blocks with 1 packet each
        asm.push(make_packet(0, blk, 0, b"\x01"))
    assert asm.stats["evictions"] == 1  # oldest force-drained
    asm.flush()
    assert asm.ready_count == 3
    asm.push(make_packet(0, 9, 99, b"\x01"))  # bad symbol index
    asm.push(make_packet(0, 9, 0, b""))  # bad length
    assert asm.stats["bad"] == 2


def test_duplicates_ignored():
    asm = BlockAssembler(4, 2, 1, decode_at_k=False)
    asm.push(make_packet(0, 0, 1, b"\xaa"))
    asm.push(make_packet(0, 0, 1, b"\xbb"))
    assert asm.stats["duplicates"] == 1
    asm.flush()
    _, vals, erased = asm.drain()
    assert vals[0, 1, 0] == 0xAA  # first arrival wins


def test_late_straggler_does_not_duplicate_block():
    """A packet arriving after its block drained counts as late — it must
    not recreate a phantom block that would be emitted twice."""
    n, k, sb = 6, 3, 1
    asm = BlockAssembler(n, k, sb, decode_at_k=True)
    for s in range(k):  # block 5 drains at k packets
        asm.push(make_packet(0, 5, s, bytes([s])))
    assert asm.ready_count == 1
    asm.push(make_packet(0, 5, k, bytes([k])))  # straggler for block 5
    assert asm.stats["late"] == 1
    asm.flush()
    nums, _, _ = asm.drain()
    assert nums.tolist() == [5]  # exactly one output for block 5


def test_self_eviction_counts_late():
    """max_blocks=0 makes every inserted block its own eviction victim: the
    packet must count as late (matching the native assembler), not be
    written into the already-finished orphan block."""
    asm = BlockAssembler(4, 2, 1, max_blocks=0, decode_at_k=False)
    asm.push(make_packet(0, 7, 1, b"\xaa"))
    assert asm.stats["evictions"] == 1
    assert asm.stats["late"] == 1
    assert asm.stats["blocks_out"] == 1  # the empty finished block
    nums, vals, erased = asm.drain()
    assert nums.tolist() == [7]
    assert erased.all()  # payload was NOT written into the orphan
    asm.flush()
    assert asm.stats["blocks_out"] == 1  # and nothing is emitted twice


def test_stream_to_device_decode():
    """Lossy out-of-order packet stream -> assembler -> hybrid decode ->
    exact recovery of every decodable block."""
    from ldpc_erasure_codes_tpu.codes import gen_row_wise

    # Every variable node degree >= 2 (toy_code can leave unprotected
    # degree-0 source columns, which no decoder can recover).
    code = gen_row_wise([(16, 6)], [(48, 2)], seed=3, max_tries=40, strict_tries=4)
    arrays = device_arrays(code)
    w = 1  # one uint32 word per symbol = 4 payload bytes
    nblocks = 6
    rng = np.random.default_rng(1)
    src = jax.random.bits(jax.random.key(0), (nblocks, code.k, w), dtype=jnp.uint32)
    cw = np.asarray(jax.device_get(encode_packed(arrays, src)))  # (B, n, 1)

    asm = BlockAssembler(code.n, code.k, 4, max_blocks=nblocks, decode_at_k=False)
    packets = []
    for b in range(nblocks):
        for s in range(code.n):
            if rng.random() < 0.15:  # channel loss
                continue
            packets.append(
                make_packet(0, b, s, cw[b, s].astype("<u4").tobytes())
            )
    rng.shuffle(packets)  # network reordering
    for p in packets:
        asm.push(p)
    asm.flush()
    nums, vals, erased = asm.drain()
    assert len(nums) == nblocks
    # Back to packed uint32 words for the device decoder.
    values = jnp.asarray(vals.view("<u4").reshape(len(nums), code.n, w))
    v, e, iters, failed = hybrid_decode(
        arrays, values, jnp.asarray(erased), peel_iters=50, emax=16
    )
    ok = np.asarray(jax.device_get(~failed))
    got = np.asarray(jax.device_get(v))
    order = np.argsort(nums)
    for i in np.nonzero(ok)[0]:
        np.testing.assert_array_equal(got[i], cw[nums[i]], err_msg=f"block {nums[i]}")
    assert ok.sum() >= nblocks - 1  # 15% loss on rate-2/3: nearly all decode


def _random_stream(seed, n=12, k=7, sb=4, nblocks=5, loss=0.2, dup=0.1):
    rng = np.random.default_rng(seed)
    packets = []
    for b in range(nblocks):
        for s in range(n):
            if rng.random() < loss:
                continue
            payload = rng.integers(0, 256, sb, dtype=np.uint8).tobytes()
            packets.append(make_packet(0, b, s, payload))
            if rng.random() < dup:
                packets.append(packets[-1])
    rng.shuffle(packets)
    # a couple of malformed packets
    packets.insert(2, make_packet(0, 1, n + 5, b"\x00" * sb))  # bad symbol
    packets.insert(5, b"\x01\x02\x03")  # bad length (short)
    # bad length (OVERSIZED — e.g. stray traffic on the UDP port): must be
    # counted bad, never raise (a raise would kill the UdpReceiver thread)
    packets.insert(7, make_packet(0, 1, 0, b"\x00" * (sb + 9)))
    return n, k, sb, packets


def test_native_assembler_matches_python():
    """The C++ assembler (native/ldpc_io.cpp) is property-equal to the
    Python reference: identical stats, block numbers, values, and masks on
    randomized lossy/duplicated/reordered streams."""
    from ldpc_erasure_codes_tpu.utils.native import have_native
    from ldpc_erasure_codes_tpu.utils.streaming import NativeBlockAssembler

    if not have_native():
        import pytest

        pytest.skip("no native toolchain")
    for seed in range(5):
        for decode_at_k, max_blocks in (
            (True, 3), (False, 3),
            # Tiny windows exercise eviction — including a block being its
            # own eviction victim (max_blocks < 1), which must count late
            # identically in both implementations.
            (False, 1), (False, 0),
        ):
            n, k, sb, packets = _random_stream(seed)
            py = BlockAssembler(n, k, sb, max_blocks=max_blocks,
                                decode_at_k=decode_at_k)
            na = NativeBlockAssembler(n, k, sb, max_blocks=max_blocks,
                                      decode_at_k=decode_at_k)
            for p in packets:
                py.push(p)
                na.push(p)
            py.flush()
            na.flush()
            assert na.stats == py.stats, (seed, decode_at_k)
            pn, pv, pe = py.drain()
            nn, nv, ne = na.drain()
            np.testing.assert_array_equal(nn, pn)
            np.testing.assert_array_equal(nv, pv)
            np.testing.assert_array_equal(ne, pe)


def test_native_assembler_burst_push():
    from ldpc_erasure_codes_tpu.utils.native import have_native
    from ldpc_erasure_codes_tpu.utils.streaming import NativeBlockAssembler

    if not have_native():
        import pytest

        pytest.skip("no native toolchain")
    n, k, sb = 10, 6, 4
    rng = np.random.default_rng(3)
    rows = []
    for s in range(n):
        rows.append(np.frombuffer(
            make_packet(0, 2, s, rng.integers(0, 256, sb, np.uint8).tobytes()),
            dtype=np.uint8,
        ))
    na = NativeBlockAssembler(n, k, sb, decode_at_k=False)
    na.push_burst(np.stack(rows))
    assert na.ready_count == 1
    nums, vals, er = na.drain()
    assert nums.tolist() == [2]
    assert not er.any()
