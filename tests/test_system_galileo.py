"""Galileo E1 system test: full chain on a synthetic E1B constellation —
acquisition -> VEML tracking -> I/NAV decode -> observables -> PVT.

The Galileo counterpart of test_system_position (BASELINE config #3 spirit:
E1B with the sinBOC replica).  Uses the I/NAV word cycle 5,1,2,3,4 so
ephemeris + GST complete within ~12 s of page sync.
"""

import numpy as np
import pytest

import pytest as _pytest_mark
pytestmark = _pytest_mark.mark.slow

from gnss_sdr_1_tpu.codes import tracking_replica
from gnss_sdr_1_tpu.constants import GALILEO_E1B
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig
from gnss_sdr_1_tpu.siggen.generator import generate_baseband
from gnss_sdr_1_tpu.siggen.scenario import build_scenario

# NOTE fs is deliberately NOT an integer multiple of the (virtual) chip
# rate: commensurate sampling (e.g. 4.092 MHz = exactly 2 samples per
# sinBOC half-chip) quantizes the code-phase observable itself — chip edges
# land on a repeating sample grid and the sub-sample delay becomes
# unobservable, costing tens of meters.  Real front-ends (and the
# reference's system tests, signal_generator_flags.h fs_gen defaults)
# sample incommensurately for exactly this reason.
FS = 4.0e6
DURATION = 18.0


@pytest.fixture(scope="module")
def galileo_run():
    import dataclasses

    rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = [1, 2, 3, 4, 5]
    scen = build_scenario(
        rx_ecef, prns, t0_tow=345601.25, duration_s=DURATION,
        cn0_dbhz=48.0, chip_rate=2.046e6, signal="1B")
    spec = dataclasses.replace(
        GALILEO_E1B, code_rate_chips_s=2.046e6, code_length_chips=2 * 4092,
        bit_rate_bps=250.0)
    codes = {p: tracking_replica("1B", p)[0] for p in prns}
    from conftest import cached_capture

    x = cached_capture(
        f"sysgal_{FS:.0f}_{DURATION:.0f}_v1",
        lambda: generate_baseband(spec, scen.sats, codes, FS, DURATION,
                                  noise=True))
    cfg = ReceiverConfig(
        fs_hz=FS, signal_id="1B", n_channels=5, prn_search=tuple(prns),
        acq_dwells=3, pll_bw_hz=15.0, dll_bw_hz=2.0)
    rx = Receiver(cfg)
    sols = rx.process(x)
    return scen, rx, sols


def test_galileo_channels_track_and_decode(galileo_run):
    scen, rx, sols = galileo_run
    n_complete = sum(1 for d in rx.decoders.values() if d.ephemeris_complete)
    assert n_complete >= 4, f"only {n_complete} Galileo ephemerides decoded"
    for p, dec in rx.decoders.items():
        if dec.ephemeris_complete:
            assert dec.ephemeris.sqrt_a == pytest.approx(
                scen.ephemerides[p].sqrt_a, abs=2e-5)


def test_galileo_position_fix(galileo_run):
    scen, rx, sols = galileo_run
    assert len(sols) >= 10
    errs = np.stack([s.rx_ecef_m - scen.rx_ecef for s in sols])
    e3d = np.linalg.norm(errs, axis=1)
    # the reference's accuracy bar (position_test_flags.h:45: 3D < 5 m)
    assert np.median(e3d) < 5.0, f"median 3D {np.median(e3d):.2f} m"
    assert np.linalg.norm(errs.mean(axis=0)) < 5.0
