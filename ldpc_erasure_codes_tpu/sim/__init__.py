"""Monte-Carlo FER simulation: config, jitted step, sharded driver, stats."""

from ldpc_erasure_codes_tpu.sim.config import ChannelConfig, DecoderConfig, SimConfig
from ldpc_erasure_codes_tpu.sim.driver import (
    FERPoint,
    format_report,
    make_sim_step,
    run_fer_point,
    run_fer_sweep,
    symbol_bits,
)
from ldpc_erasure_codes_tpu.sim.stats import Accumulator, SimStats, batch_stats

__all__ = [
    "Accumulator",
    "ChannelConfig",
    "DecoderConfig",
    "FERPoint",
    "SimConfig",
    "SimStats",
    "batch_stats",
    "format_report",
    "make_sim_step",
    "run_fer_point",
    "run_fer_sweep",
    "symbol_bits",
]
