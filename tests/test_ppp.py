"""PPP engine tests (pvt/ppp.py): batch PPP_Static / PPP_Kinematic on a
synthetic observation set with tropo + iono + float ambiguities — the
positioning-mode parity target is rtklib_ppp.cc pppos() (reference
PVT.positioning_mode=PPP_Static/PPP_Kinematic)."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.constants import SPEED_OF_LIGHT_M_S
from gnss_sdr_1_tpu.pvt.geodesy import az_el, ecef_to_llh, llh_to_ecef
from gnss_sdr_1_tpu.pvt.ppp import (
    PppConfig, PppObs, _dry_ztd_m, _map_el, solve_ppp)
from gnss_sdr_1_tpu.pvt.atmosphere import klobuchar_delay_m
from gnss_sdr_1_tpu.pvt.solver import _rotate_earth
from gnss_sdr_1_tpu.telemetry.lnav import GpsIono
from gnss_sdr_1_tpu.pvt.ephemeris import (
    satellite_clock_correction, satellite_position_velocity)
from gnss_sdr_1_tpu.siggen.scenario import make_test_ephemeris, _auto_place

F1 = 1575.42e6
F2 = 1227.60e6
LAM1 = SPEED_OF_LIGHT_M_S / F1
LAM2 = SPEED_OF_LIGHT_M_S / F2


def _make_obs(rx_traj, towt, prns, ephs, ztd_wet=0.12, iono_zenith_m=3.0,
              code_noise=0.4, phase_noise=0.003, seed=7, dual=True,
              iono_model=None):
    """Geometric observables with tropo (dry Saastamoinen + wet ztd), iono
    (zenith-scaled by default, Klobuchar when `iono_model` is a GpsIono —
    dispersive across bands either way), satellite clocks, receiver clock
    ramp, and per-satellite constant ambiguities."""
    rng = np.random.default_rng(seed)
    amb1 = {p: rng.integers(-5000, 5000) * LAM1 for p in prns}
    amb2 = {p: rng.integers(-5000, 5000) * LAM2 for p in prns}
    epochs = []
    for k, tow in enumerate(towt):
        xk = rx_traj[k]
        lat, lon, hgt = ecef_to_llh(xk)
        dry = _dry_ztd_m(lat, hgt)
        dt_rx = 1e-7 * k            # receiver clock ramp
        obs = {}
        for p in prns:
            eph = ephs[p]
            # iterate transmit time
            tau = 0.07
            for _ in range(3):
                t_tx = tow - tau
                clk = satellite_clock_correction(eph, t_tx)
                pos, _ = satellite_position_velocity(eph, t_tx - clk)
                posr = _rotate_earth(pos, tau)
                tau = np.linalg.norm(posr - xk) / SPEED_OF_LIGHT_M_S
            rho = np.linalg.norm(posr - xk)
            az, el = az_el(xk, posr)
            if np.degrees(el) < 10:
                continue
            m = _map_el(el)
            trop = (dry + ztd_wet) * m
            if iono_model is not None:
                iono1 = klobuchar_delay_m(iono_model, lat, lon, az, el,
                                          tow, F1)
            else:
                iono1 = iono_zenith_m * m
            iono2 = iono1 * (F1 / F2) ** 2
            clk = satellite_clock_correction(eph, tow - tau)
            base = rho + SPEED_OF_LIGHT_M_S * (dt_rx - clk) + trop
            p1 = base + iono1 + rng.normal(0, code_noise)
            l1 = base - iono1 + amb1[p] + rng.normal(0, phase_noise)
            o = PppObs(
                pseudorange_m=p1,
                carrier_phase_cycles=-l1 / LAM1,
            )
            if dual:
                o.pseudorange2_m = base + iono2 + rng.normal(0, code_noise)
                o.carrier_phase2_cycles = -(base - iono2 + amb2[p]
                                            + rng.normal(0, phase_noise)) / LAM2
            obs[p] = o
        # epoch tags are RECEIVER-CLOCK time, as the real obs tick is
        epochs.append((tow + dt_rx, obs))
    return epochs


@pytest.fixture(scope="module")
def geometry():
    rx = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = [2, 5, 11, 17, 23, 29]
    t0 = 345600.0
    toe = np.floor(t0 / 7200.0) * 7200.0
    raans, anoms = _auto_place(rx, prns, toe, t0)
    ephs = {p: make_test_ephemeris(p, toe, plane_raan_deg=raans[i],
                                   anomaly_deg=anoms[i], af0=1e-5 * (i % 3))
            for i, p in enumerate(prns)}
    return rx, prns, ephs, t0


def test_ppp_static_dual_frequency_converges(geometry):
    rx, prns, ephs, t0 = geometry
    towt = t0 + np.arange(0, 240, 2.0)
    traj = np.tile(rx, (len(towt), 1))
    epochs = _make_obs(traj, towt, prns, ephs, dual=True)
    sol = solve_ppp(epochs, ephs, PppConfig(
        mode="PPP_Static", f1_hz=F1, f2_hz=F2))
    assert sol.valid
    err = np.linalg.norm(sol.rx_ecef_m - rx)
    assert err < 0.5, f"PPP_Static 3D error {err:.3f} m"
    assert abs(sol.ztd_wet_m - 0.12) < 0.05


def test_ppp_static_single_frequency_graphic(geometry):
    """Single-frequency PPP: broadcast (Klobuchar) iono on the code rows +
    GRAPHIC phase combination — the reference's single-freq PPP config
    (rtklib IONOOPT_BRDC + the GRAPHIC observable)."""
    rx, prns, ephs, t0 = geometry
    iono = GpsIono(alpha0=1.2e-8, alpha1=1.5e-8, alpha2=-6.0e-8,
                   alpha3=-6.0e-8, beta0=8.0e4, beta1=9.8e4,
                   beta2=-6.6e4, beta3=-3.3e5)
    towt = t0 + np.arange(0, 240, 2.0)
    traj = np.tile(rx, (len(towt), 1))
    epochs = _make_obs(traj, towt, prns, ephs, dual=False, iono_model=iono)
    sol = solve_ppp(epochs, ephs, PppConfig(
        mode="PPP_Static", f1_hz=F1, f2_hz=None, iono=iono))
    assert sol.valid
    err = np.linalg.norm(sol.rx_ecef_m - rx)
    # single-frequency GRAPHIC: iono-free but half-code noise; meter-level
    assert err < 1.0, f"PPP_Static(GRAPHIC) 3D error {err:.3f} m"


def test_ppp_kinematic_tracks_motion(geometry):
    rx, prns, ephs, t0 = geometry
    # 240 s window: ZTD / height / clock separation needs satellite motion
    # (at 120 s the whole solution carries a ~0.7 m up-axis bias)
    towt = t0 + np.arange(0, 240, 2.0)
    # slow 0.1 m/s east drift
    east = np.array([-np.sin(np.radians(1.988)),
                     np.cos(np.radians(1.988)), 0.0])
    traj = rx[None, :] + 0.1 * (towt - t0)[:, None] * east[None, :]
    epochs = _make_obs(traj, towt, prns, ephs, dual=True)
    sol = solve_ppp(epochs, ephs, PppConfig(
        mode="PPP_Kinematic", f1_hz=F1, f2_hz=F2,
        kinematic_process_m=0.5))
    assert sol.valid and sol.epoch_positions is not None
    errs = [np.linalg.norm(x - traj[k])
            for k, (_t, x) in enumerate(sol.epoch_positions)]
    assert np.median(errs) < 0.7, f"kinematic median err {np.median(errs):.3f}"
    # end-to-start displacement should reflect the true ~23.8 m drift
    disp = np.linalg.norm(sol.epoch_positions[-1][1]
                          - sol.epoch_positions[0][1])
    assert 19.0 < disp < 29.0


def test_ppp_cycle_slip_splits_arcs(geometry):
    rx, prns, ephs, t0 = geometry
    towt = t0 + np.arange(0, 240, 2.0)
    traj = np.tile(rx, (len(towt), 1))
    epochs = _make_obs(traj, towt, prns, ephs, dual=True)
    # inject a 10-cycle slip on one satellite mid-window
    slip_prn = prns[0]
    for tow, obs in epochs[60:]:
        if slip_prn in obs:
            obs[slip_prn].carrier_phase_cycles += 10.0
            if obs[slip_prn].carrier_phase2_cycles is not None:
                obs[slip_prn].carrier_phase2_cycles += 10.0
    sol = solve_ppp(epochs, ephs, PppConfig(
        mode="PPP_Static", f1_hz=F1, f2_hz=F2))
    assert sol.valid
    assert sol.n_arcs >= len(prns) + 1, "slip should open a new arc"
    err = np.linalg.norm(sol.rx_ecef_m - rx)
    assert err < 0.6, f"PPP with slip 3D error {err:.3f} m"
