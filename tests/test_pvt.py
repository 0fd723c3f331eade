"""PVT tests: ephemeris propagation, geodesy, LS solver.

Mirrors the reference's rtklib_solver / ls_pvt unit coverage with synthetic
truth.
"""

import numpy as np
import pytest

from gnss_sdr_1_tpu.constants import SPEED_OF_LIGHT_M_S
from gnss_sdr_1_tpu.pvt.ephemeris import (
    satellite_clock_correction,
    satellite_position_velocity,
)
from gnss_sdr_1_tpu.pvt.geodesy import az_el, ecef_to_llh, llh_to_ecef
from gnss_sdr_1_tpu.pvt.solver import solve_pvt
from gnss_sdr_1_tpu.siggen.scenario import make_test_ephemeris, observed_delay_s


def test_llh_ecef_roundtrip():
    lat, lon, h = np.radians(41.3), np.radians(1.99), 120.0
    xyz = llh_to_ecef(lat, lon, h)
    lat2, lon2, h2 = ecef_to_llh(xyz)
    assert lat2 == pytest.approx(lat, abs=1e-11)
    assert lon2 == pytest.approx(lon, abs=1e-11)
    assert h2 == pytest.approx(h, abs=1e-6)


def test_satpos_orbit_radius_and_velocity():
    eph = make_test_ephemeris(1, toe=345600.0)
    pos, vel = satellite_position_velocity(eph, 345600.0 + 100.0)
    r = np.linalg.norm(pos)
    assert 26_000e3 < r < 27_200e3          # GPS MEO radius
    v = np.linalg.norm(vel)
    assert 2_400 < v < 4_800   # ECEF-frame speed (inertial ~3.9 km/s +- earth rotation)
    # velocity consistent with finite difference
    dt = 0.5
    p2, _ = satellite_position_velocity(eph, 345600.0 + 100.0 + dt)
    fd = (p2 - pos) / dt
    assert np.linalg.norm(fd - vel) < 0.5


def test_clock_correction_terms():
    eph = make_test_ephemeris(1, toe=345600.0, af0=1e-5)
    clk = satellite_clock_correction(eph, 345600.0)
    assert clk == pytest.approx(1e-5, abs=5e-8)   # af0 + small relativistic


def test_ls_solver_recovers_position():
    """Synthetic pseudoranges from 6 satellites + clock bias -> position to
    sub-mm (noise-free)."""
    rx = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    t_rx = 345601.0
    clock_bias = 3.2e-4
    prns = [1, 2, 3, 4, 5, 6]
    from gnss_sdr_1_tpu.siggen.scenario import build_scenario
    scen = build_scenario(rx, prns, t0_tow=t_rx, duration_s=1.0)
    ephs, prs = scen.ephemerides, {}
    for p in prns:
        tau_obs = observed_delay_s(ephs[p], rx, t_rx)
        # receiver stamps the epoch at its own (biased) clock
        prs[p] = (tau_obs + clock_bias) * SPEED_OF_LIGHT_M_S
    # keep only satellites above horizon
    vis = [p for p in prns
           if az_el(rx, satellite_position_velocity(ephs[p], t_rx)[0])[1] > 0.1]
    assert len(vis) >= 4
    sol = solve_pvt({p: ephs[p] for p in vis}, {p: prs[p] for p in vis},
                    t_rx + clock_bias)
    assert sol.valid
    assert np.linalg.norm(sol.rx_ecef_m - rx) < 1e-2
    assert sol.rx_clock_bias_s == pytest.approx(clock_bias, abs=1e-10)
    assert sol.dops["pdop"] < 10.0
