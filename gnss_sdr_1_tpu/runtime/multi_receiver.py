"""Multi-constellation / multi-signal receiver.

Reference parity: the hybrid receiver configurations
(conf/gnss-sdr_GLONASS_L1_CA_GPS_L1_CA_ibyte.conf and friends, BASELINE
configs #4-5): several per-signal channel groups over one wideband sample
stream, observables merged into a joint PVT with one clock state per system
(the ISB handling of rtklib_pntpos).

Design: one `Receiver` per signal group (each owns its batched acquisition
and tracking programs), run over the shared capture; joint fixes are formed
afterwards on the common sample clock — every group's epoch histories are
interpolated to shared RX ticks and solved with per-system clock columns.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import SPEED_OF_LIGHT_M_S
from ..observables import compute_observables
from ..pvt.solver import PvtSolution, solve_pvt
from .receiver import Receiver, ReceiverConfig

_SYSTEM_OF_SIGNAL = {"1C": "G", "2S": "G", "L5": "G",
                     "1B": "E", "5X": "E",
                     "1G": "R", "2G": "R",
                     "B1": "C", "B3": "C"}


@dataclasses.dataclass
class JointSolution:
    solution: PvtSolution
    per_system_prns: dict[str, list[int]]


class MultiReceiver:
    """Run several signal groups over one sample stream and solve jointly."""

    def __init__(self, configs: list[ReceiverConfig]):
        if not configs:
            raise ValueError("need at least one ReceiverConfig")
        fs = {c.fs_hz for c in configs}
        if len(fs) != 1:
            raise ValueError("all groups must share the sample stream fs")
        self.fs_hz = fs.pop()
        self.receivers = [Receiver(c) for c in configs]

    def process(self, samples: np.ndarray,
                obs_interval_ms: int = 20) -> list[JointSolution]:
        """Process the capture with every group, then form joint fixes."""
        for rx in self.receivers:
            rx.process(samples)
        return self.joint_fixes(obs_interval_ms)

    def joint_fixes(self, obs_interval_ms: int = 20) -> list[JointSolution]:
        tick = int(round(self.fs_hz * obs_interval_ms * 1e-3))
        # per group: histories of channels with complete ephemeris
        ready = []
        for rx in self.receivers:
            hists = {
                p: h for p, h in rx.histories.items()
                if p in rx.decoders and rx.decoders[p].ephemeris_complete
                and len(h.start_samples) >= 2
            }
            ready.append(hists)
        if sum(len(h) for h in ready) < 4:
            return []
        start = max((min(h.start_samples[0] for h in hists.values())
                     for hists in ready if hists), default=0)
        stop = min((max(h.start_samples[-1] for h in hists.values())
                    for hists in ready if hists), default=0)
        out: list[JointSolution] = []
        rx_tow = None
        rx_tow_sample = None
        t0 = ((start // tick) + 1) * tick
        for rx_sample in range(t0, stop, tick):
            ephs, prs, dops, systems = {}, {}, {}, {}
            per_sys: dict[str, list[int]] = {}
            for rx_i, hists in zip(self.receivers, ready):
                if not hists:
                    continue
                sysid = _SYSTEM_OF_SIGNAL.get(rx_i.cfg.signal_id, "G")
                if rx_tow is None:
                    tow_k, obs = compute_observables(
                        hists, rx_sample, self.fs_hz, None)
                    if obs:
                        rx_tow, rx_tow_sample = tow_k, rx_sample
                if rx_tow is None:
                    continue
                tow_k = rx_tow + (rx_sample - rx_tow_sample) / self.fs_hz
                _, obs = compute_observables(hists, rx_sample, self.fs_hz,
                                             tow_k)
                for p, o in obs.items():
                    # offset PRN ids per system so they never collide
                    key = p + {"G": 0, "E": 100, "R": 200, "C": 300}[sysid]
                    ephs[key] = rx_i.decoders[p].ephemeris
                    prs[key] = o.pseudorange_m
                    dops[key] = o.doppler_hz
                    systems[key] = sysid
                    per_sys.setdefault(sysid, []).append(p)
            if len(prs) >= 4 and rx_tow is not None:
                tow_k = rx_tow + (rx_sample - rx_tow_sample) / self.fs_hz
                sol = solve_pvt(ephs, prs, tow_k, dopplers_hz=dops,
                                systems=systems)
                if sol.valid:
                    out.append(JointSolution(sol, per_sys))
        return out
