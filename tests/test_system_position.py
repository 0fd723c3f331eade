"""System test: full receiver chain on a synthetic constellation.

The position_test.cc analogue (SURVEY.md §4.7): generate a
geometry-consistent multi-satellite capture at 4 samples/chip, run the
complete pipeline (acquisition -> tracking with the wide->narrow extended
state switch -> telemetry -> sub-sample observables -> PVT) and assert the
REFERENCE's accuracy thresholds (position_test_flags.h:44-46, hard assert
position_test.cc:588): static 2D CEP < 2 m, 3D < 5 m.
"""

import numpy as np
import pytest

import pytest as _pytest_mark
pytestmark = _pytest_mark.mark.slow

from gnss_sdr_1_tpu.codes import gps_l1ca_code
from gnss_sdr_1_tpu.constants import GPS_L1_CA
from gnss_sdr_1_tpu.pvt.geodesy import ecef_to_enu, llh_to_ecef
from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig
from gnss_sdr_1_tpu.siggen.generator import generate_baseband
from gnss_sdr_1_tpu.siggen.scenario import build_scenario

# 4 Msps (non-commensurate with the 1.023 Mcps chip rate, like the
# reference's 4 Msps captures: a commensurate grid pins code transitions to
# fixed sample phases and stair-steps the DLL)
FS = 4.0e6
DURATION = 24.0


@pytest.fixture(scope="module")
def e2e_run():
    import pathlib

    rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = [1, 2, 3, 4, 5, 6]
    scen = build_scenario(rx_ecef, prns, t0_tow=345601.25,
                          duration_s=DURATION, cn0_dbhz=47.0,
                          subframe_cycle=(1, 2, 3))
    # deterministic capture: cache on disk (generation is minutes on a
    # small host; the scenario itself is cheap and always rebuilt)
    cache = pathlib.Path("/tmp/gnss_sdr_tpu_testcache")
    cache.mkdir(exist_ok=True)
    key = cache / f"syspos_{FS:.0f}_{DURATION:.0f}_v3.npy"
    if key.exists():
        x = np.load(key)
    else:
        x = generate_baseband(GPS_L1_CA, scen.sats,
                              {p: gps_l1ca_code(p) for p in prns},
                              FS, DURATION, noise=True)
        np.save(key, x)
    rx = Receiver(ReceiverConfig(fs_hz=FS, n_channels=6, prn_search=tuple(prns)))
    sols = rx.process(x)
    return scen, rx, sols


def test_position_fix(e2e_run):
    """Reference accuracy bar: static 2D CEP < 2 m, 3D < 5 m
    (position_test_flags.h:44-46; assert position_test.cc:588)."""
    scen, rx, sols = e2e_run
    assert len(sols) >= 40, "expected dozens of PVT epochs"
    errs = np.stack([s.rx_ecef_m - scen.rx_ecef for s in sols])
    enu = np.stack([ecef_to_enu(scen.rx_ecef, scen.rx_ecef + e) for e in errs])
    horiz = np.linalg.norm(enu[:, :2], axis=1)
    e3d = np.linalg.norm(errs, axis=1)
    assert np.median(horiz) < 2.0          # CEP
    assert np.median(e3d) < 5.0            # static 3D accuracy
    assert np.linalg.norm(errs.mean(axis=0)) < 3.0


def test_velocity_and_clock(e2e_run):
    scen, rx, sols = e2e_run
    v = np.stack([s.rx_vel_ecef_ms for s in sols])
    # static receiver: mean velocity near zero
    assert np.linalg.norm(v.mean(axis=0)) < 1.0
    # receiver clock bias equals the observables start-offset convention:
    # rx_tow was initialized at max(TOW)+60 ms rounded, so |bias| < ~25 ms
    assert abs(sols[-1].rx_clock_bias_s) < 0.03


def test_ppp_static_on_receiver_observables(e2e_run):
    """PVT.positioning_mode=PPP_Static over the receiver's own code+carrier
    observables (rtklib_solver.cc:491 mode dispatch analogue).  The siggen
    scenario has no atmosphere, so the batch estimator's wet-ZTD term must
    absorb the dry a-priori; the fix should be at least as good as the
    single-point bar (3D < 5 m)."""
    scen, rx, sols = e2e_run
    rx.cfg.positioning_mode = "PPP_Static"
    ppp = rx.solve_ppp_batch()
    assert ppp.valid
    err = np.linalg.norm(ppp.rx_ecef_m - scen.rx_ecef)
    assert err < 5.0, f"PPP_Static 3D error {err:.2f} m"


def test_ephemeris_recovered(e2e_run):
    scen, rx, sols = e2e_run
    n_complete = sum(
        1 for d in rx.decoders.values() if d.ephemeris_complete
    )
    assert n_complete >= 4
    for p, dec in rx.decoders.items():
        if dec.ephemeris_complete:
            assert dec.ephemeris.sqrt_a == pytest.approx(
                scen.ephemerides[p].sqrt_a, abs=1e-3)
