"""Precise products (pvt/precise.py): SP3 round-trip, interpolation
accuracy vs Keplerian truth, and PPP with precise orbits/clocks beating
broadcast-error PPP (rtklib_preceph.cc readsp3h/readsp3b/pephpos/peph2pos
behind EPHOPT_PREC; VERDICT r4 Missing #1)."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.constants import SPEED_OF_LIGHT_M_S
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.pvt.ppp import PppConfig, solve_ppp
from gnss_sdr_1_tpu.pvt.precise import (
    Sp3Product, read_sp3, sp3_from_broadcast, write_sp3)
from gnss_sdr_1_tpu.pvt.solver import sat_clock, sat_pos_vel, solve_pvt
from gnss_sdr_1_tpu.siggen.scenario import _auto_place, make_test_ephemeris

from test_ppp import F1, F2, _make_obs

T0 = 345600.0


@pytest.fixture(scope="module")
def truth():
    rx = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = [2, 5, 11, 17, 23, 29]
    toe = np.floor(T0 / 7200.0) * 7200.0
    raans, anoms = _auto_place(rx, prns, toe, T0)
    ephs = {p: make_test_ephemeris(p, toe, plane_raan_deg=raans[i],
                                   anomaly_deg=anoms[i], af0=1e-5 * (i % 3))
            for i, p in enumerate(prns)}
    return rx, prns, ephs


def test_sp3_write_read_roundtrip(tmp_path, truth):
    _rx, prns, ephs = truth
    prod = sp3_from_broadcast(ephs, T0 - 900, T0 + 1800, step_s=300.0,
                              week=2204)
    path = tmp_path / "igs.sp3"
    write_sp3(path, prod)
    back = read_sp3(str(path))
    assert back.week == prod.week
    np.testing.assert_allclose(back.epochs_tow, prod.epochs_tow, atol=1e-6)
    for p in prns:
        # SP3 position resolution is 1e-6 km = 1 mm; clock 1e-6 us = 1 ps
        np.testing.assert_allclose(back.positions[p], prod.positions[p],
                                   atol=2e-3)
        np.testing.assert_allclose(back.clocks[p], prod.clocks[p],
                                   atol=1e-11)


def test_sp3_interpolation_matches_keplerian(truth):
    """10-point Neville on a 300 s grid reproduces the Keplerian orbit to
    sub-mm and velocities to sub-mm/s mid-grid (rtklib pephpos/peph2pos)."""
    _rx, prns, ephs = truth
    prod = sp3_from_broadcast(ephs, T0 - 1800, T0 + 1800, step_s=300.0)
    for p in prns[:3]:
        for t in (T0 + 37.0, T0 + 151.0, T0 + 600.5):
            pos_i, vel_i = prod.sat_position_velocity(p, t)
            pos_t, vel_t = sat_pos_vel(ephs[p], t)
            assert np.linalg.norm(pos_i - pos_t) < 1e-3
            assert np.linalg.norm(vel_i - vel_t) < 1e-3
            assert abs(prod.sat_clock(p, t) - sat_clock(ephs[p], t)) < 2e-10


def test_precise_adapter_drives_single_point_solver(truth):
    """PreciseEphemeris plugs into solve_pvt's dispatch directly."""
    rx, prns, ephs = truth
    prod = sp3_from_broadcast(ephs, T0 - 1800, T0 + 1800, step_s=300.0)
    pephs = prod.as_ephemerides()
    from gnss_sdr_1_tpu.pvt.solver import _rotate_earth

    prs = {}
    for p in prns:
        tau = 0.07
        for _ in range(3):
            pos, _v = sat_pos_vel(ephs[p], T0 - tau)
            tau = np.linalg.norm(_rotate_earth(pos, tau) - rx) \
                / SPEED_OF_LIGHT_M_S
        clk = sat_clock(ephs[p], T0 - tau)
        prs[p] = (tau - clk) * SPEED_OF_LIGHT_M_S
    sol = solve_pvt(pephs, prs, T0)
    assert sol.valid
    assert np.linalg.norm(sol.rx_ecef_m - rx) < 1.0


def test_ppp_precise_beats_perturbed_broadcast(truth):
    """The VERDICT r4 acceptance: observations generated from TRUTH orbits;
    the receiver only holds a degraded broadcast (meters of along-track +
    clock error).  Broadcast PPP inherits the orbit error; handing the
    solver an SP3 sampled from truth restores convergence (< 0.5 m
    horizontal) — and absence of SP3 still yields a valid (degraded) fix."""
    rx, prns, ephs = truth
    towt = T0 + np.arange(0, 240, 2.0)
    traj = np.tile(rx, (len(towt), 1))
    epochs = _make_obs(traj, towt, prns, ephs, dual=True)

    # degraded broadcast: ~4 m along-track (dM0) + 10 ns clock per sat
    toe = np.floor(T0 / 7200.0) * 7200.0
    raans, anoms = _auto_place(rx, prns, toe, T0)
    bad = {}
    for i, p in enumerate(prns):
        e = make_test_ephemeris(p, toe, plane_raan_deg=raans[i],
                                anomaly_deg=anoms[i], af0=1e-5 * (i % 3))
        e.m0 += 1.5e-7 * (1 + (i % 3))        # ~4-12 m along-track
        e.af0 += 1e-8 * ((i % 5) - 2)         # +-6 m clock
        bad[p] = e

    sol_bad = solve_ppp(epochs, bad, PppConfig(
        mode="PPP_Static", f1_hz=F1, f2_hz=F2))
    assert sol_bad.valid          # degrades gracefully, stays usable
    err_bad = np.linalg.norm(sol_bad.rx_ecef_m - rx)

    sp3 = sp3_from_broadcast(ephs, T0 - 1800, T0 + 2100, step_s=300.0)
    sol_prec = solve_ppp(epochs, bad, PppConfig(
        mode="PPP_Static", f1_hz=F1, f2_hz=F2, precise=sp3))
    assert sol_prec.valid
    err_prec = np.linalg.norm(sol_prec.rx_ecef_m - rx)
    # precise products must recover dm-level despite the broken broadcast
    assert err_prec < 0.5, f"precise PPP error {err_prec:.3f} m"
    assert err_prec < err_bad, (err_prec, err_bad)
    # horizontal component specifically (VERDICT wording)
    up = rx / np.linalg.norm(rx)
    dh = (sol_prec.rx_ecef_m - rx) - np.dot(sol_prec.rx_ecef_m - rx, up) * up
    assert np.linalg.norm(dh) < 0.5
