"""End-to-end GLONASS L1 C/A FDMA system test: synthetic multi-slot capture
-> per-slot FDMA acquisition -> tracking (per-channel carrier offset) ->
meander sync -> GNAV decode -> RK4 orbits -> PVT.

Reference analogue: the GLONASS L1 chain of gnss_block_factory (1G channels)
with pcps_acquisition.cc:277-283 is_fdma() Doppler-grid offsets and
glonass_l1_ca_dll_pll_tracking; validation bar from
position_test_flags.h:44-45 (2D < 2 m is for GPS with more sats; GLONASS
4-sat geometry here asserts the 3D < 15 m the reference's own GLONASS system
test accepts informally).
"""

import pathlib

import numpy as np
import pytest

import pytest as _pytest_mark
pytestmark = _pytest_mark.mark.slow

from gnss_sdr_1_tpu.codes import glonass_ca_code
from gnss_sdr_1_tpu.constants import FREQ_G1_GLO, GLONASS_L1_CA
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.runtime.receiver import Receiver, ReceiverConfig
from gnss_sdr_1_tpu.siggen.generator import generate_baseband
from gnss_sdr_1_tpu.siggen.scenario import build_scenario

FS = 4.092e6
DURATION = 20.0
# frequency-channel numbers k in [-7, 6]; offsets k*562.5 kHz stay well
# inside the +-2.046 MHz complex Nyquist band at this fs
KS = {1: -2, 2: -1, 3: 0, 4: 1, 5: 2}


@pytest.fixture(scope="module")
def glonass_run():
    rx_ecef = llh_to_ecef(np.radians(55.75), np.radians(37.62), 180.0)
    slots = sorted(KS)
    # t0 25 s into a 30 s GNAV frame: channels have ~5 s to settle before
    # the fresh frame (string 1 + tk anchor); ephemeris strings 1-3 by ~11 s
    scen = build_scenario(
        rx_ecef, slots, t0_tow=35995.0, duration_s=DURATION,
        cn0_dbhz=47.0, chip_rate=0.511e6, carrier_freq=FREQ_G1_GLO,
        signal="1G", fdma_ks=KS)
    code = glonass_ca_code()
    cache = pathlib.Path("/tmp/gnss_sdr_tpu_testcache")
    cache.mkdir(exist_ok=True)
    key = cache / f"sysglo_{FS:.0f}_{DURATION:.0f}_v2.npy"
    if key.exists():
        x = np.load(key)
    else:
        x = generate_baseband(GLONASS_L1_CA, scen.sats,
                              {p: code for p in slots}, FS, DURATION,
                              noise=True)
        np.save(key, x)
    cfg = ReceiverConfig(
        fs_hz=FS, signal_id="1G", n_channels=5, prn_search=tuple(slots),
        fdma_k=tuple(KS.items()), acq_dwells=3,
        pll_bw_hz=25.0, dll_bw_hz=2.0)
    rx = Receiver(cfg)
    sols = rx.process(x)
    return scen, rx, sols


def test_glonass_fdma_acquisition_and_tracking(glonass_run):
    scen, rx, sols = glonass_run
    # every slot tracked long enough to matter (>= 10 s of 1 ms epochs)
    tracked = {p: n for p, n in rx.sym_count.items() if n > 10_000}
    assert len(tracked) >= 4, f"tracked: {rx.sym_count}"


def test_glonass_ephemerides_decoded(glonass_run):
    scen, rx, sols = glonass_run
    n_complete = sum(1 for d in rx.decoders.values() if d.ephemeris_complete)
    assert n_complete >= 4, f"only {n_complete} GNAV ephemerides decoded"
    # decoded state vector matches the broadcast truth (strings 1-3)
    for slot, dec in rx.decoders.items():
        if not dec.ephemeris_complete:
            continue
        g, t = dec.ephemeris, scen.ephemerides[slot]
        assert g.x_km == pytest.approx(t.x_km, abs=1e-9)
        assert g.vz_kms == pytest.approx(t.vz_kms, abs=1e-12)
        assert g.tb_s == t.tb_s


def test_glonass_position_fix(glonass_run):
    scen, rx, sols = glonass_run
    assert len(sols) >= 10, f"only {len(sols)} fixes"
    errs = np.array([
        np.linalg.norm(s.rx_ecef_m - scen.rx_ecef) for s in sols])
    med = float(np.median(errs))
    assert med < 15.0, f"median 3D error {med:.1f} m"
