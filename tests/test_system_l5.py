"""GPS L5 + Galileo E5a full-chain system tests (VERDICT r4 Missing #7 /
Next #6): acquisition -> tracking (NH10 / CS20 secondary handling) ->
CNAV / F-NAV decode -> observables -> PVT at the reference accuracy bar
(position_test_flags.h:45, 3D < 5 m) — the last two untested signal
chains, driven end-to-end through a Receiver like the reference's
GPS_L5 / Galileo_E5a confs (gnss-sdr_GPS_L5_USRP_X300_realtime.conf,
gnss-sdr_Galileo_E5a.conf).

Both bands run the 10.23 Mcps codes at 12 Msps (1.17 samples/chip,
incommensurate — see the sampling note in test_system_galileo.py).
Captures are cached; the first generation is several minutes.
"""

import numpy as np
import pytest

import pytest as _pytest_mark
pytestmark = _pytest_mark.mark.slow

from conftest import cached_capture
from gnss_sdr_1_tpu.codes import tracking_replica
from gnss_sdr_1_tpu.constants import GALILEO_E5A, GPS_L5
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig
from gnss_sdr_1_tpu.siggen.generator import generate_baseband
from gnss_sdr_1_tpu.siggen.scenario import build_scenario

FS = 12.0e6
RX_ECEF = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)


@pytest.fixture(scope="module")
def l5_run():
    import dataclasses

    prns = [1, 3, 5, 7, 9]
    # CNAV {10, 11, 30} at 6 s/message: ephemerides complete ~t+23 s
    dur = 25.0
    scen = build_scenario(RX_ECEF, prns, t0_tow=345601.25, duration_s=dur,
                          cn0_dbhz=48.0, chip_rate=10.23e6,
                          carrier_freq=GPS_L5.carrier_freq_hz, signal="L5")
    codes = {p: tracking_replica("L5", p)[0] for p in prns}
    spec = dataclasses.replace(GPS_L5, bit_rate_bps=1000.0)
    x = cached_capture(
        f"sysl5_{FS:.0f}_{dur:.0f}_v1",
        lambda: generate_baseband(spec, scen.sats, codes, FS, dur,
                                  noise=True))
    # the BeiDou lessons apply (round-5 diagnosis): a fine second-step
    # Doppler grid keeps the handoff inside the PLL pull-in range
    # iono off: the synthetic capture carries no ionosphere, but the CNAV
    # MT30 broadcast encodes zero alpha/beta coefficients which VALIDATE —
    # and zero-coefficient Klobuchar still applies its 5 ns night floor,
    # an elevation-spread false correction worth ~4 m of fix error
    # (round-5 diagnosis: median 4.4 m -> 0.39 m)
    cfg = ReceiverConfig(
        fs_hz=FS, signal_id="L5", n_channels=5, prn_search=tuple(prns),
        acq_dwells=2, pll_bw_hz=18.0, dll_bw_hz=2.0,
        doppler_step2_hz=15.0, num_doppler_bins_step2=40,
        iono_model="off")
    rx = Receiver(cfg)
    sols = rx.process(x)
    return scen, rx, sols


def test_l5_channels_decode_cnav_ephemeris(l5_run):
    scen, rx, sols = l5_run
    n = sum(1 for d in rx.decoders.values() if d.ephemeris_complete)
    assert n >= 4, f"only {n} CNAV ephemerides decoded"
    for p, dec in rx.decoders.items():
        if dec.ephemeris_complete:
            assert dec.ephemeris.sqrt_a == pytest.approx(
                scen.ephemerides[p].sqrt_a, abs=1e-3)


def test_l5_position_fix(l5_run):
    scen, rx, sols = l5_run
    assert len(sols) >= 10, f"only {len(sols)} fixes"
    errs = np.stack([s.rx_ecef_m - scen.rx_ecef for s in sols])
    e3d = np.linalg.norm(errs, axis=1)
    assert np.median(e3d) < 5.0, f"median 3D {np.median(e3d):.2f} m"


@pytest.fixture(scope="module")
def e5a_run():
    import dataclasses

    prns = [11, 12, 13, 14, 15]
    # F/NAV pages 1-4 at 10 s each: a receiver starting mid-page needs
    # FOUR full pages after the clipped one — ephemeris completes at
    # ~t+48.75 s (page 1 repeats at +40 in the 1,2,3,4 cycle), so 50 s
    # leaves ~1 s of fixes
    dur = 50.0
    scen = build_scenario(RX_ECEF, prns, t0_tow=345601.25, duration_s=dur,
                          cn0_dbhz=48.0, chip_rate=10.23e6,
                          carrier_freq=GALILEO_E5A.carrier_freq_hz,
                          signal="5X")
    codes = {p: tracking_replica("5X", p)[0] for p in prns}
    spec = dataclasses.replace(GALILEO_E5A, bit_rate_bps=1000.0)
    x = cached_capture(
        f"syse5a_{FS:.0f}_{dur:.0f}_v1",
        lambda: generate_baseband(spec, scen.sats, codes, FS, dur,
                                  noise=True))
    cfg = ReceiverConfig(
        fs_hz=FS, signal_id="5X", n_channels=5, prn_search=tuple(prns),
        acq_dwells=2, pll_bw_hz=18.0, dll_bw_hz=2.0,
        doppler_step2_hz=15.0, num_doppler_bins_step2=40,
        iono_model="off")
    rx = Receiver(cfg)
    sols = rx.process(x)
    return scen, rx, sols


def test_e5a_channels_decode_fnav_ephemeris(e5a_run):
    from gnss_sdr_1_tpu.telemetry.channel_adapters import (
        GalileoE5aChannelDecoder)

    scen, rx, sols = e5a_run
    n = sum(1 for d in rx.decoders.values() if d.ephemeris_complete)
    assert n >= 4, f"only {n} F/NAV ephemerides decoded"
    for p, dec in rx.decoders.items():
        assert isinstance(dec, GalileoE5aChannelDecoder)
        if dec.ephemeris_complete:
            assert dec.ephemeris.sqrt_a == pytest.approx(
                scen.ephemerides[p].sqrt_a, abs=1e-3)
            assert {1, 2, 3, 4}.issubset(dec.raw.pages)


def test_e5a_position_fix(e5a_run):
    scen, rx, sols = e5a_run
    assert len(sols) >= 10, f"only {len(sols)} fixes"
    errs = np.stack([s.rx_ecef_m - scen.rx_ecef for s in sols])
    e3d = np.linalg.norm(errs, axis=1)
    assert np.median(e3d) < 5.0, f"median 3D {np.median(e3d):.2f} m"
