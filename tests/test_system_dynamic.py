"""Dynamic system test: moving receiver at the reference's dynamic bars.

position_test.cc's Spirent-motion branch asserts 3D position RMSE < 10 m
and 3D velocity RMSE < 5 m/s against the motion reference
(position_test_flags.h:48-49, asserts position_test.cc:793-794); here the
motion truth is the scenario's constant-velocity trajectory."""

import pathlib

import numpy as np
import pytest

import pytest as _pytest_mark
pytestmark = _pytest_mark.mark.slow

from gnss_sdr_1_tpu.codes import gps_l1ca_code
from gnss_sdr_1_tpu.constants import GPS_L1_CA
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig
from gnss_sdr_1_tpu.siggen.generator import generate_baseband
from gnss_sdr_1_tpu.siggen.scenario import build_scenario

FS = 4.0e6
DURATION = 24.0
VEL = np.array([12.0, -9.0, 5.0])      # ~15.8 m/s ground vehicle


@pytest.fixture(scope="module")
def dyn_run():
    rx0 = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = [1, 2, 3, 4, 5, 6]
    scen = build_scenario(rx0, prns, t0_tow=345601.25, duration_s=DURATION,
                          cn0_dbhz=47.0, subframe_cycle=(1, 2, 3),
                          rx_vel_ecef=VEL)
    cache = pathlib.Path("/tmp/gnss_sdr_tpu_testcache")
    cache.mkdir(exist_ok=True)
    key = cache / f"sysdyn_{FS:.0f}_{DURATION:.0f}_v1.npy"
    if key.exists():
        x = np.load(key)
    else:
        x = generate_baseband(GPS_L1_CA, scen.sats,
                              {p: gps_l1ca_code(p) for p in prns},
                              FS, DURATION, noise=True)
        np.save(key, x)
    rx = Receiver(ReceiverConfig(fs_hz=FS, n_channels=6,
                                 prn_search=tuple(prns)))
    sols = rx.process(x)
    return scen, sols


def test_dynamic_position_rmse(dyn_run):
    scen, sols = dyn_run
    assert len(sols) >= 40
    errs = []
    for s in sols:
        t = s.rx_time_tow_s - scen.t0_tow
        errs.append(s.rx_ecef_m - scen.rx_at(t))
    errs = np.stack(errs)
    rmse3d = np.sqrt(np.mean(np.sum(errs**2, axis=1)))
    assert rmse3d < 10.0, f"dynamic 3D RMSE {rmse3d:.2f} m"


def test_dynamic_velocity_rmse(dyn_run):
    scen, sols = dyn_run
    verr = np.stack([s.rx_vel_ecef_ms - VEL for s in sols])
    vrmse = np.sqrt(np.mean(np.sum(verr**2, axis=1)))
    assert vrmse < 5.0, f"dynamic 3D velocity RMSE {vrmse:.2f} m/s"
    # and the speed estimate itself is unbiased to < 1 m/s
    mean_v = np.mean([s.rx_vel_ecef_ms for s in sols], axis=0)
    assert np.linalg.norm(mean_v - VEL) < 1.0
