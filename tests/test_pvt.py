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


# ---------------------------------------------------------------------------
# Atmospheric models (rtklib_rtkcmn.cc ionmodel/tropmodel parity)
# ---------------------------------------------------------------------------

def _typical_iono():
    from gnss_sdr_1_tpu.telemetry.lnav import GpsIono
    return GpsIono(alpha0=1.1176e-8, alpha1=7.4506e-9, alpha2=-5.9605e-8,
                   alpha3=-5.9605e-8, beta0=90112.0, beta1=16384.0,
                   beta2=-196608.0, beta3=-65536.0, valid=True)


def test_klobuchar_night_dc_term():
    """With zeroed coefficients the model reduces to the 5 ns DC term times
    the obliquity factor."""
    from gnss_sdr_1_tpu.pvt.atmosphere import klobuchar_delay_m
    from gnss_sdr_1_tpu.telemetry.lnav import GpsIono
    iono = GpsIono(valid=True)
    d_zenith = klobuchar_delay_m(iono, np.radians(40.0), np.radians(-100.0),
                                 0.0, np.radians(90.0), 20.0 * 3600)
    f = 1.0 + 16.0 * (0.53 - 0.5) ** 3
    assert d_zenith == pytest.approx(SPEED_OF_LIGHT_M_S * 5e-9 * f, rel=1e-9)
    # low elevation -> larger slant factor
    d_low = klobuchar_delay_m(iono, np.radians(40.0), np.radians(-100.0),
                              0.0, np.radians(10.0), 20.0 * 3600)
    assert d_low > 2.0 * d_zenith


def test_klobuchar_daytime_magnitude_and_band_scaling():
    from gnss_sdr_1_tpu.pvt.atmosphere import klobuchar_delay_m
    iono = _typical_iono()
    # local solar noon: t = 50400 s at lon 0 -> tow 50400
    d_l1 = klobuchar_delay_m(iono, np.radians(35.0), 0.0,
                             np.radians(90.0), np.radians(45.0), 50400.0)
    assert 2.0 < d_l1 < 40.0          # metres, daytime mid-latitude
    d_night = klobuchar_delay_m(iono, np.radians(35.0), 0.0,
                                np.radians(90.0), np.radians(45.0), 10000.0)
    assert d_l1 > d_night
    # L5 delay scales with (f_L1/f_L5)^2
    d_l5 = klobuchar_delay_m(iono, np.radians(35.0), 0.0,
                             np.radians(90.0), np.radians(45.0), 50400.0,
                             carrier_freq_hz=1176.45e6)
    assert d_l5 == pytest.approx(d_l1 * (1575.42 / 1176.45) ** 2, rel=1e-12)


def test_saastamoinen_zenith_and_slant():
    from gnss_sdr_1_tpu.pvt.atmosphere import saastamoinen_delay_m
    z = saastamoinen_delay_m(np.radians(45.0), 0.0, np.radians(90.0))
    assert 2.2 < z < 2.6              # sea-level zenith total delay
    s30 = saastamoinen_delay_m(np.radians(45.0), 0.0, np.radians(30.0))
    assert s30 == pytest.approx(2.0 * z, rel=0.02)   # ~1/sin(el) mapping
    high = saastamoinen_delay_m(np.radians(45.0), 5000.0, np.radians(90.0))
    assert high < 0.6 * z             # thin atmosphere at altitude
    assert saastamoinen_delay_m(np.radians(45.0), 0.0, -0.1) == 0.0


def test_solver_removes_injected_atmospheric_errors():
    """Inject Klobuchar+Saastamoinen delays into the synthetic pseudoranges;
    the corrected solve recovers the position, the uncorrected one is
    metres off (rtklib_pntpos.cc estpos with/without corrections)."""
    from gnss_sdr_1_tpu.pvt.atmosphere import (klobuchar_delay_m,
                                               saastamoinen_delay_m)
    from gnss_sdr_1_tpu.siggen.scenario import build_scenario
    lat, lon, hgt = np.radians(41.275), np.radians(1.988), 80.0
    rx = llh_to_ecef(lat, lon, hgt)
    t_rx = 50400.0        # daytime -> large iono
    iono = _typical_iono()
    prns = [1, 2, 3, 4, 5, 6, 7, 8]
    scen = build_scenario(rx, prns, t0_tow=t_rx, duration_s=1.0)
    ephs, prs, els = scen.ephemerides, {}, {}
    for p in prns:
        sat = satellite_position_velocity(ephs[p], t_rx)[0]
        az, el = az_el(rx, sat)
        els[p] = el
        if el < np.radians(5.0):
            continue
        tau_obs = observed_delay_s(ephs[p], rx, t_rx)
        atm = (klobuchar_delay_m(iono, lat, lon, az, el, t_rx)
               + saastamoinen_delay_m(lat, hgt, el))
        prs[p] = tau_obs * SPEED_OF_LIGHT_M_S + atm
    assert len(prs) >= 5
    ephs_v = {p: ephs[p] for p in prs}
    sol_raw = solve_pvt(ephs_v, prs, t_rx)
    sol_cor = solve_pvt(ephs_v, prs, t_rx, iono=iono, apply_tropo=True,
                        el_mask_deg=5.0, weighted=True)
    assert sol_cor.valid
    err_raw = np.linalg.norm(sol_raw.rx_ecef_m - rx)
    err_cor = np.linalg.norm(sol_cor.rx_ecef_m - rx)
    assert err_cor < 0.05
    assert err_raw > 10 * max(err_cor, 1e-3)
