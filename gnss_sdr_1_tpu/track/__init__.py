"""Tracking: scan-carried DLL/PLL/FLL loops over channel-batched blocks.

Reference parity: src/algorithms/tracking/ — dll_pll_veml_tracking.cc and its
per-constellation adapters, the CUDA/FPGA multicorrelator variants and the
volk kernels all collapse into the design here (SURVEY.md §2.7): per-channel
loop state carried through `lax.scan` over integration epochs, the
multicorrelator vmapped over channels, and the channel lifecycle FSM kept on
host (SURVEY.md §7 hard parts 1-2).
"""

from .config import TrackConfig
from .engine import TrackingEngine, TrackState, TrackOutputs
from . import discriminators, loop_filter, lock_detectors

__all__ = [
    "TrackConfig", "TrackingEngine", "TrackState", "TrackOutputs",
    "discriminators", "loop_filter", "lock_detectors",
]
