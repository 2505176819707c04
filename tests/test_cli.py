"""CLI tests: the throughput step's measurement integrity + smoke runs.

The reference's user surface is the OpenCL host CLI (main.cpp:157-170);
here we additionally pin the measurement-integrity property (VALIDATION.md):
a throughput step must consume decoded VALUES, or XLA dead-code-eliminates
the wide value decode and the CLI prints phantom Gbps (the round-1 bug at
utils/cli.py:94-111, fixed in round 2).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_erasure_codes_tpu.codes import get_code
from ldpc_erasure_codes_tpu.ops import device_arrays, encode_packed
from ldpc_erasure_codes_tpu.utils import cli


def test_throughput_step_consumes_values():
    """The jitted step's outputs must depend on the codeword values, not
    just the erasure mask — two different codeword batches under the SAME
    channel key must yield different digests."""
    code = get_code("n2000_k1000")
    arrays = device_arrays(code)
    b, w = 4, 2
    key = jax.random.key(0)
    step = cli.make_throughput_step(
        code, arrays, batch=b, per=0.2, max_iters=50
    )
    src1 = jax.random.bits(jax.random.key(1), (b, code.k, w), dtype=jnp.uint32)
    src2 = jax.random.bits(jax.random.key(2), (b, code.k, w), dtype=jnp.uint32)
    cw1 = encode_packed(arrays, src1)
    cw2 = encode_packed(arrays, src2)
    chan = jax.random.fold_in(key, 7)
    _, d1 = step(chan, cw1)
    _, d2 = step(chan, cw2)
    assert not np.array_equal(np.asarray(d1), np.asarray(d2))


def test_throughput_cli_smoke(capsys):
    rc = cli.main(
        [
            "throughput",
            "--code", "n2000_k1000",
            "--batch", "4",
            "--symbol-words", "2",
            "--per", "0.2",
            "--reps", "2",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["info_gbps"] > 0
    assert out["symbol_bits"] == 64


def test_throughput_step_tiled_matches_untiled():
    """--tiled measures the production tile-major handoff; the step must
    produce the same residual and value digest as the untiled layout (XOR
    is layout-invariant and pad rows/frames are zero)."""
    from ldpc_erasure_codes_tpu.codes.toy import toy_code
    from ldpc_erasure_codes_tpu.ops.pallas_peel import tile_wide

    code = toy_code(n=48, k=32, seed=3)
    arrays = device_arrays(code)
    b, w, bt = 8, 4, 8
    src = jax.random.bits(jax.random.key(1), (b, code.k, w), dtype=jnp.uint32)
    cw = encode_packed(arrays, src)
    kw = dict(batch=b, per=0.2, max_iters=50, b_tile=bt)
    step_u = cli.make_throughput_step(code, arrays, **kw)
    step_t = cli.make_throughput_step(code, arrays, tiled=True, **kw)
    chan = jax.random.fold_in(jax.random.key(0), 7)
    r_u, d_u = step_u(chan, cw)
    r_t, d_t = step_t(chan, tile_wide(cw, bt))
    assert int(r_u) == int(r_t)
    assert np.array_equal(np.asarray(d_u), np.asarray(d_t))


def test_throughput_cli_tiled_narrow_fallback(capsys):
    """--tiled with a narrow symbol falls back (impl=xla forces tiled off)
    instead of failing."""
    rc = cli.main(
        [
            "throughput",
            "--code", "n2000_k1000",
            "--batch", "4",
            "--symbol-words", "2",
            "--per", "0.2",
            "--reps", "1",
            "--tiled",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["info_gbps"] > 0


def test_sim_cli_tiled_pipeline_smoke(capsys):
    """--tiled-pipeline runs the value-mode tile-major handoff end to end."""
    rc = cli.main(
        [
            "sim",
            "--code", "n2000_k1000",
            "--batch", "8",
            "--symbol-words", "2",
            "--pers", "0.3",
            "--target-errors", "1",
            "--max-frames", "16",
            "--steps-per-call", "1",
            "--tiled-pipeline",
        ]
    )
    assert rc == 0
    assert "fer" in capsys.readouterr().out.lower()


def test_codes_cli_smoke(capsys):
    assert cli.main(["codes"]) == 0
    out = capsys.readouterr().out
    assert "n2040_k1530" in out


def test_scaling_cli_smoke(capsys):
    """Scaling sweep runs on the 8-device virtual mesh and reports
    efficiency 1.0 at the base point."""
    rc = cli.main(
        [
            "scaling",
            "--code", "n2000_k1000",
            "--batch", "8",
            "--devices", "1,2,8",
            "--reps", "2",
            "--steps-per-call", "1",
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [p["devices"] for p in lines] == [1, 2, 8]
    assert lines[0]["efficiency"] == 1.0
    assert lines[2]["frames"] == 8 * 8 * 2 * 1  # devices*batch*reps*steps


def test_default_b_tile_envelope():
    """Auto tile sizing tracks the measured v5e VMEM envelope: headline
    (2040, W=256) gets the measured-best bt=32; the longer registry codes
    and W=512 must drop to 16 (bt=32 at n=4000 is ~131 MB — over VMEM; see
    default_b_tile docstring)."""
    from ldpc_erasure_codes_tpu.ops.pallas_peel import default_b_tile

    assert default_b_tile(2040, 256) == 32
    assert default_b_tile(2000, 256) == 32
    # W > 256 auto-chunks to 256-word tiles, so the frame tile stays 32
    # (unchunked bt=24 at W=512 measured OOM; chunked runs at bt=32).
    assert default_b_tile(2040, 512) == 32
    assert default_b_tile(2040, 1024) == 32
    assert default_b_tile(4000, 256) == 16
    assert default_b_tile(4080, 256) == 16
    with pytest.raises(ValueError):  # below the bt=8 floor: doesn't fit
        default_b_tile(10**5, 512)


def test_throughput_cli_narrow_symbol_fallback(capsys):
    """symbol_words not lane-aligned must fall back to impl=xla (with a
    stderr note) instead of failing the Mosaic W%128 check on hardware."""
    rc = cli.main(
        [
            "throughput",
            "--code", "n2000_k1000",
            "--batch", "4",
            "--symbol-words", "64",
            "--per", "0.2",
            "--reps", "1",
        ]
    )
    assert rc == 0
    cap = capsys.readouterr()
    assert "falling back to impl=xla" in cap.err
    out = json.loads(cap.out.strip().splitlines()[-1])
    assert out["info_gbps"] > 0
