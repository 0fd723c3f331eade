"""RTK / LAMBDA tests.

Mirrors the reference's ambiguity-resolution surface: rtklib_lambda.cc
(LD / reduction / mlambda search) and the relpos double-difference chain
(rtklib_rtkpos.cc) via pvt.rtk.solve_baseline on a geometry-consistent
synthetic baseline.
"""

import numpy as np
import pytest

from gnss_sdr_1_tpu.constants import SPEED_OF_LIGHT_M_S
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.pvt.rtk import (
    interpolate_base, lambda_ilse, solve_baseline)
from gnss_sdr_1_tpu.siggen.scenario import (
    make_test_ephemeris, observed_delay_s, _auto_place)

L1_WAVELENGTH = SPEED_OF_LIGHT_M_S / 1575.42e6


def test_lambda_recovers_integers():
    """ILS recovers the true integer vector from a correlated float
    solution (rtklib_lambda.cc lambda())."""
    rng = np.random.default_rng(5)
    n = 8
    for trial in range(5):
        a_true = rng.integers(-50, 50, size=n).astype(float)
        # correlated covariance with decimeter-scale (in cycles) noise
        B = rng.standard_normal((n, n)) * 0.2
        Q = B @ B.T + 0.05 * np.eye(n)
        noise = np.linalg.cholesky(Q) @ rng.standard_normal(n) * 0.3
        cands, s = lambda_ilse(a_true + noise, Q, m=2)
        assert s[0] <= s[1]
        np.testing.assert_array_equal(cands[0], a_true)


def test_lambda_identity_covariance_rounds():
    a = np.array([1.2, -3.4, 0.49])
    cands, s = lambda_ilse(a, np.eye(3) * 0.01, m=2)
    np.testing.assert_array_equal(cands[0], [1.0, -3.0, 0.0])


def _synthetic_baseline(mode, rover_offset, n_epochs=10, seed=7,
                        clock_jitter=True, dt_s=3.0, n_sats=8):
    """Geometry-consistent DD scenario: base + rover observing the same
    ephemerides, with per-receiver clock biases (cancel in DD), integer
    carrier ambiguities and thermal noise."""
    rng = np.random.default_rng(seed)
    base = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    rover = base + np.asarray(rover_offset)
    prns = list(range(1, 1 + n_sats))
    t0 = 345601.0
    raans, anoms = _auto_place(base, prns, np.floor(t0 / 7200.0) * 7200.0, t0)
    ephs = {p: make_test_ephemeris(p, np.floor(t0 / 7200.0) * 7200.0,
                                   plane_raan_deg=raans[i],
                                   anomaly_deg=anoms[i])
            for i, p in enumerate(prns)}
    amb = {p: float(rng.integers(-30, 30)) for p in prns}

    class Obs:
        def __init__(self, pr, ph):
            self.pseudorange_m = pr
            self.carrier_phase_cycles = ph

    def epochs_for(rx_ecef, ambs, bias_scale):
        out = []
        for k in range(n_epochs):
            tow = t0 + k * dt_s
            clk = (rng.uniform(-1e-3, 1e-3) if clock_jitter else 0.0) * bias_scale
            obs = {}
            for p in prns:
                tau = observed_delay_s(ephs[p], rx_ecef, tow)
                pr = (tau + clk) * SPEED_OF_LIGHT_M_S + rng.normal(0, 0.4)
                ph = (-(tau + clk) * SPEED_OF_LIGHT_M_S / L1_WAVELENGTH
                      + ambs[p] + rng.normal(0, 0.004 / L1_WAVELENGTH))
                obs[p] = Obs(pr, ph)
            out.append((tow, obs))
        return out

    base_epochs = epochs_for(base, {p: 0.0 for p in prns}, 1.0)
    rover_epochs = epochs_for(rover, amb, 1.3)
    return base, rover, ephs, base_epochs, rover_epochs


def test_dgnss_code_baseline_submeter():
    base, rover, ephs, be, re = _synthetic_baseline("DGNSS", [30.0, -12.0, 5.0],
                                                    n_epochs=12)
    sol = solve_baseline(re, be, base, ephs, L1_WAVELENGTH, mode="DGNSS")
    assert sol.valid
    err = np.linalg.norm(sol.rover_ecef_m - rover)
    assert err < 0.9, err


def test_rtk_static_fix_centimeter():
    base, rover, ephs, be, re = _synthetic_baseline(
        "Static", [55.0, 20.0, -8.0], n_epochs=20)
    sol = solve_baseline(re, be, base, ephs, L1_WAVELENGTH, mode="Static")
    assert sol.valid
    float_err = np.linalg.norm(sol.rover_float_ecef_m - rover)
    assert float_err < 1.0, float_err
    assert sol.fixed, f"ratio={sol.ratio}"
    fix_err = np.linalg.norm(sol.rover_ecef_m - rover)
    assert fix_err < 0.03, fix_err


def test_rtk_kinematic_epoch_positions():
    base, rover, ephs, be, re = _synthetic_baseline(
        "Kinematic", [15.0, 40.0, 3.0], n_epochs=20)
    sol = solve_baseline(re, be, base, ephs, L1_WAVELENGTH, mode="Kinematic")
    assert sol.valid and sol.fixed
    errs = [np.linalg.norm(x - rover) for _, x in sol.epoch_positions]
    assert np.median(errs) < 0.05, np.median(errs)


def test_base_interpolation():
    class Obs:
        def __init__(self, pr, ph):
            self.pseudorange_m = pr
            self.carrier_phase_cycles = ph

    be = [(10.0, {1: Obs(100.0, 50.0)}), (12.0, {1: Obs(104.0, 52.0)})]
    got = interpolate_base(be, 11.0)
    assert got[1] == (102.0, 51.0)
    assert interpolate_base(be, 9.0) is None


# ---------------- sequential EKF (rtklib relpos analogue, round 4) -------

def test_rtk_ekf_static_converges_and_fixes():
    """Time-recursive filter (pvt.rtk_ekf): float solution converges over
    epochs and MLAMBDA fixes to centimeters (rtklib_rtkpos.cc:2199
    relpos + resamb_LAMBDA)."""
    from gnss_sdr_1_tpu.pvt.rtk_ekf import solve_baseline_ekf

    base, rover, ephs, be, re = _synthetic_baseline(
        "Static", [55.0, 20.0, -8.0], n_epochs=30)
    sols = solve_baseline_ekf(re, be, base, ephs, L1_WAVELENGTH,
                              mode="Static")
    assert len(sols) >= 25
    # float converges below half a meter by the back half of the run
    tail = sols[len(sols) // 2:]
    ferr = [np.linalg.norm(s.rover_float_ecef_m - rover) for s in tail]
    assert np.median(ferr) < 0.5, np.median(ferr)
    fixed = [s for s in tail if s.fixed]
    assert len(fixed) >= len(tail) // 2, "ratio test rarely passed"
    fx = [np.linalg.norm(s.rover_fixed_ecef_m - rover) for s in fixed]
    assert np.median(fx) < 0.05, f"fixed median {np.median(fx):.3f} m"


def test_rtk_ekf_kinematic_tracks_moving_rover():
    """Kinematic mode: the filter follows a rover moving at ~1 m/s
    (velocity states + accel process noise, rtklib udpos)."""
    from gnss_sdr_1_tpu.pvt.rtk_ekf import RtkEkf
    from gnss_sdr_1_tpu.pvt.rtk import interpolate_base

    rng = np.random.default_rng(11)
    base = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = list(range(1, 9))
    t0 = 345601.0
    raans, anoms = _auto_place(base, prns, np.floor(t0 / 7200.0) * 7200.0,
                               t0)
    ephs = {p: make_test_ephemeris(p, np.floor(t0 / 7200.0) * 7200.0,
                                   plane_raan_deg=raans[i],
                                   anomaly_deg=anoms[i])
            for i, p in enumerate(prns)}
    amb = {p: float(rng.integers(-30, 30)) for p in prns}
    vel = np.array([0.8, -0.5, 0.3])

    class Obs:
        def __init__(self, pr, ph):
            self.pseudorange_m = pr
            self.carrier_phase_cycles = ph

    def epochs_for(pos0, v, ambs, bias_scale):
        out = []
        for k in range(40):
            tow = t0 + k * 1.0
            rx = pos0 + v * (k * 1.0)
            clk = rng.uniform(-1e-3, 1e-3) * bias_scale
            obs = {}
            for p in prns:
                tau = observed_delay_s(ephs[p], rx, tow)
                pr = (tau + clk) * SPEED_OF_LIGHT_M_S + rng.normal(0, 0.4)
                ph = (-(tau + clk) * SPEED_OF_LIGHT_M_S / L1_WAVELENGTH
                      + ambs[p] + rng.normal(0, 0.004 / L1_WAVELENGTH))
                obs[p] = Obs(pr, ph)
            out.append((tow, obs))
        return out

    be = epochs_for(base, np.zeros(3), {p: 0.0 for p in prns}, 1.0)
    re = epochs_for(base + [40.0, 10.0, 0.0], vel, amb, 1.3)
    ekf = RtkEkf(base, ephs, L1_WAVELENGTH, mode="Kinematic")
    for tow, robs in re:
        bobs = interpolate_base(be, tow)
        if bobs is not None:
            ekf.process_epoch(tow, robs, bobs)
    sols = ekf.solutions
    assert len(sols) >= 30
    tail = sols[15:]
    errs = []
    for s in tail:
        k = s.tow - t0
        truth = base + np.asarray([40.0, 10.0, 0.0]) + vel * k
        pos = s.rover_fixed_ecef_m if s.fixed else s.rover_float_ecef_m
        errs.append(np.linalg.norm(pos - truth))
    assert np.median(errs) < 0.3, f"median kinematic error {np.median(errs)}"
    assert sum(s.fixed for s in tail) >= len(tail) // 2
