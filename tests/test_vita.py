"""VITA-49 (VRT) framing: header codec, emitter cadence, ingest stripping,
upstream-loss detection, and the full VITA -> encode -> UDP -> decode chain.

Reference: OpenCL/device/ldpc_erasure_encoder_VITA_in_UDP_out.cl:140-212
(ingest loop), :142-160 (class-code cadence), :42 (class codes).
"""

import json

import numpy as np
import pytest

from ldpc_erasure_codes_tpu.utils import cli
from ldpc_erasure_codes_tpu.utils.vita import (
    CLASS_CONTEXT,
    CLASS_DATA,
    PKT_IF_CONTEXT,
    PKT_IF_DATA,
    PKT_IF_DATA_SID,
    VitaEmitter,
    VitaHeader,
    VitaIngest,
    parse_header,
)


def test_header_roundtrip_all_fields():
    h = VitaHeader(
        packet_type=PKT_IF_DATA_SID,
        packet_count=11,
        packet_size=37,
        has_class_id=False,
        has_trailer=True,
        tsi=2,
        tsf=1,
        stream_id=0xDEADBEEF,
    )
    got = parse_header(h.pack() + b"\x00" * 4)
    assert got == h
    assert got.header_words == 2


def test_header_roundtrip_no_stream_id():
    h = VitaHeader(packet_type=PKT_IF_DATA, packet_count=3, packet_size=9)
    got = parse_header(h.pack())
    assert got == h
    assert got.header_words == 1
    assert not got.has_stream_id


def test_header_word0_bit_layout():
    # Spot-check the packed word against the VITA-49.0 layout directly.
    h = VitaHeader(
        packet_type=PKT_IF_DATA_SID, packet_count=0xF, packet_size=0x1234,
        stream_id=1,
    )
    w0 = int.from_bytes(h.pack()[:4], "big")
    assert (w0 >> 28) & 0xF == PKT_IF_DATA_SID
    assert (w0 >> 16) & 0xF == 0xF
    assert w0 & 0xFFFF == 0x1234


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_header(b"\x01\x02")
    # type-with-stream-id but truncated before the stream-id word
    h = VitaHeader(packet_type=PKT_IF_DATA_SID, packet_count=0,
                   packet_size=2, stream_id=5)
    with pytest.raises(ValueError):
        parse_header(h.pack()[:4])


def test_emitter_context_cadence_and_counts():
    em = VitaEmitter(7, data_per_context=3)
    classes, counts = [], []
    for i in range(10):
        for cls, pkt in em.emit(b"abcd"):
            classes.append(cls)
            counts.append(parse_header(pkt).packet_count)
    # first context fires after 3 data packets, then every 3
    assert classes.count(CLASS_CONTEXT) == 3
    assert [c for c in classes if c == CLASS_DATA] == [CLASS_DATA] * 10
    # VITA-49.0: one mod-16 counter PER packet stream (type + stream id) —
    # data and context packets each count contiguously on their own.
    data_counts = [c for cls, c in zip(classes, counts) if cls == CLASS_DATA]
    ctx_counts = [c for cls, c in zip(classes, counts) if cls == CLASS_CONTEXT]
    assert data_counts == [i & 0xF for i in range(10)]
    assert ctx_counts == [0, 1, 2]


def test_emit_burst_matches_sequential():
    """emit_burst == N sequential emit() calls byte-for-byte (counters,
    context cadence, framing), including counter state carried ACROSS
    bursts."""
    import numpy as np
    from ldpc_erasure_codes_tpu.utils.vita import VitaEmitter

    rng = np.random.default_rng(50)
    payloads = rng.integers(0, 256, (37, 12), dtype=np.uint8)

    seq = VitaEmitter(0xAB12, data_per_context=5)
    burst = VitaEmitter(0xAB12, data_per_context=5)

    ref: list[tuple[int, bytes]] = []
    for p in payloads:
        ref.extend(seq.emit(p.tobytes()))

    got: list[tuple[int, bytes]] = []
    for lo, hi in ((0, 17), (17, 37)):  # two bursts: state must carry over
        pkts, contexts = burst.emit_burst(payloads[lo:hi])
        by_pos: dict[int, list[tuple[int, bytes]]] = {}
        for i, cls, cp in contexts:
            by_pos.setdefault(i, []).append((cls, cp))
        for i in range(hi - lo):
            got.extend(by_pos.get(i, []))
            got.append((None, pkts[i].tobytes()))

    assert len(ref) == len(got)
    for (rc, rp), (gc, gp) in zip(ref, got):
        assert rp == gp
        if gc is not None:
            assert rc == gc
    assert seq._data_count == burst._data_count
    assert seq._ctx_count == burst._ctx_count
    assert seq._since_context == burst._since_context


def test_emitter_rejects_ragged_payload():
    with pytest.raises(ValueError):
        VitaEmitter(1).emit(b"abc")


def test_ingest_strips_and_drops_context():
    em = VitaEmitter(42, data_per_context=2)
    ing = VitaIngest(expected_stream_id=42)
    payloads = [bytes([i]) * 8 for i in range(6)]
    got = []
    for p in payloads:
        for _cls, pkt in em.emit(p):
            out = ing.push(pkt)
            if out is not None:
                got.append(out)
    assert got == payloads
    assert ing.stats["context"] == 2
    assert ing.stats["count_gaps"] == 0


def test_ingest_detects_upstream_loss():
    em = VitaEmitter(1)
    ing = VitaIngest()
    pkts = [em.emit(bytes([i]) * 4)[0][1] for i in range(8)]
    # drop packets 2 and 3 (consecutive): one gap of size 2
    for i, pkt in enumerate(pkts):
        if i in (2, 3):
            continue
        ing.push(pkt)
    assert ing.stats["count_gaps"] == 1
    assert ing.stats["lost_upstream"] == 2


def test_ingest_rejects_bad_sizes_and_streams():
    ing = VitaIngest(expected_stream_id=9)
    h = VitaHeader(packet_type=PKT_IF_DATA_SID, packet_count=0,
                   packet_size=3, stream_id=9)
    assert ing.push(h.pack() + b"1234") == b"1234"
    # declared size disagrees with the datagram
    assert ing.push(h.pack() + b"12345678") is None
    assert ing.stats["bad"] == 1
    wrong = VitaHeader(packet_type=PKT_IF_DATA_SID, packet_count=1,
                       packet_size=3, stream_id=8)
    assert ing.push(wrong.pack() + b"1234") is None
    assert ing.stats["wrong_stream"] == 1


def test_vita_to_udp_chain():
    """Full reference chain: VRT stream over UDP -> ingest -> encode ->
    FEC datagrams (lossy, reordered) -> reassemble -> decode, bit-exact."""
    from ldpc_erasure_codes_tpu.utils.udp import loopback_demo

    r = loopback_demo(
        "n2000_k1000", blocks=2, symbol_words=1, loss=0.05, shuffle=True,
        seed=5, vita=True, data_per_context=100,
    )
    assert r.blocks_recovered == 2
    assert r.vita_stats is not None
    assert r.vita_stats["data"] == 2 * 1000
    assert r.vita_stats["context"] == (2 * 1000 - 100) // 100
    assert r.vita_stats["bad"] == 0
    assert r.vita_stats["count_gaps"] == 0


def test_stream_cli_vita_smoke(capsys):
    rc = cli.main(
        [
            "stream",
            "--code", "n2000_k1000",
            "--blocks", "1",
            "--symbol-words", "1",
            "--loss", "0.0",
            "--vita",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["vita"]["data"] == 1000
