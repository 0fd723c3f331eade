"""Receiver orchestration (the control plane).

Reference parity: src/core/receiver/ — ControlThread + GNSSFlowgraph +
channel FSM (SURVEY.md §2.1).  The GNU Radio thread-per-block graph becomes
a block-synchronous pipeline: read block -> acquire (idle channels) -> track
(locked channels, one jitted scan) -> stream epochs to host telemetry /
observables / PVT -> update channel assignments between blocks.
"""

from .receiver import Receiver, ReceiverConfig

__all__ = ["Receiver", "ReceiverConfig"]
