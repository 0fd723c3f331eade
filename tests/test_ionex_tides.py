"""IONEX TEC grids + solid-earth tides (VERDICT r4 Missing #4):
rtklib_ionex.cc readtec/interptec/iondelay/iontec and rtklib_tides.cc
tide_solid/tidedisp parity, wired into PPP (IONOOPT_TEC replaces
Klobuchar; tide displacement enters the modeled geometry)."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.pvt.ionex import TecProduct, read_ionex, write_ionex
from gnss_sdr_1_tpu.pvt.tides import sun_moon_pos_ecef, tide_displacement

T0 = 345600.0
LAT, LON = np.radians(41.275), np.radians(1.988)


def _product(vtec=20.0):
    lats = np.arange(60.0, 19.0, -5.0)
    lons = np.arange(-20.0, 21.0, 5.0)
    tec = np.full((3, len(lats), len(lons)), float(vtec))
    # spatial gradient so interpolation is observable
    tec += np.linspace(0, 4, len(lons))[None, None, :]
    # temporal ramp
    tec += np.array([0.0, 2.0, 4.0])[:, None, None]
    return TecProduct(epochs_tow=np.array([T0 - 3600, T0, T0 + 3600.0]),
                      lats=lats, lons=lons, tec=tec, week=2204)


def test_ionex_roundtrip(tmp_path):
    prod = _product()
    path = tmp_path / "igsg.24i"
    write_ionex(path, prod)
    back = read_ionex(str(path), week=2204)
    np.testing.assert_allclose(back.epochs_tow, prod.epochs_tow)
    np.testing.assert_allclose(back.lats, prod.lats)
    np.testing.assert_allclose(back.lons, prod.lons)
    # IONEX stores 0.1-TECU integers at EXPONENT -1
    np.testing.assert_allclose(back.tec, prod.tec, atol=0.051)
    assert back.hgt_km == prod.hgt_km


def test_tec_delay_obliquity_and_time_interp():
    prod = _product()
    d_hi = prod.delay_m(T0, LAT, LON, 0.3, np.radians(80.0))
    d_lo = prod.delay_m(T0, LAT, LON, 0.3, np.radians(15.0))
    # 20ish TECU vertical -> ~3.3 m at L1 zenith; obliquity raises low el
    assert 3.0 < d_hi < 4.5
    assert d_lo > 1.8 * d_hi
    # time interpolation: +1 TECU at T0+1800 (half the 2-TECU map step)
    d_mid = prod.delay_m(T0 + 1800.0, LAT, LON, 0.3, np.radians(80.0))
    assert d_mid > d_hi + 0.08
    # out of the map period -> None
    assert prod.delay_m(T0 + 7300.0, LAT, LON, 0.3, 1.0) is None
    # frequency scaling (L5)
    d5 = prod.delay_m(T0, LAT, LON, 0.3, np.radians(80.0),
                      freq_hz=1176.45e6)
    assert d5 == pytest.approx(d_hi * (1575.42 / 1176.45) ** 2, rel=1e-9)


def test_tec_sat_corr_hook_feeds_solver():
    from gnss_sdr_1_tpu.pvt.solver import solve_pvt
    from gnss_sdr_1_tpu.siggen.scenario import _auto_place, \
        make_test_ephemeris
    from test_sbas_corrections import _pseudoranges

    rx = llh_to_ecef(LAT, LON, 80.0)
    prns = [2, 5, 11, 17, 23, 29]
    toe = np.floor(T0 / 7200.0) * 7200.0
    raans, anoms = _auto_place(rx, prns, toe, T0)
    ephs = {p: make_test_ephemeris(p, toe, plane_raan_deg=raans[i],
                                   anomaly_deg=anoms[i])
            for i, p in enumerate(prns)}
    rng = np.random.default_rng(5)
    # inject a 20-TECU-ish iono slab (3.3 m vertical at L1)
    prs = _pseudoranges(prns, ephs, iono_vert_m=3.3, fast_bias={}, rng=rng)
    prod = _product(vtec=20.0)
    # wide grid so every pierce point lands inside
    sol_raw = solve_pvt(ephs, prs, T0, raim=False)
    sol_tec = solve_pvt(ephs, prs, T0, raim=False,
                        sat_corr=prod.sat_corr())
    e_raw = np.linalg.norm(sol_raw.rx_ecef_m - rx)
    e_tec = np.linalg.norm(sol_tec.rx_ecef_m - rx)
    assert e_tec < e_raw
    assert e_tec < 2.5, (e_tec, e_raw)


def test_sun_moon_positions_sane():
    rs, rm, gmst = sun_moon_pos_ecef(2204, T0)
    assert abs(np.linalg.norm(rs) - 1.496e11) < 0.05e11   # ~1 AU
    assert 3.5e8 < np.linalg.norm(rm) < 4.2e8             # ~384000 km
    assert 0.0 <= gmst < 2.0 * np.pi


def test_tide_displacement_magnitude_and_period():
    """Solid tides are dm-level and vary over hours (IERS ~12 h / 24 h
    constituents) — rtklib tide_solid sanity bounds."""
    rx = llh_to_ecef(LAT, LON, 80.0)
    drs = [tide_displacement(2204, T0 + 3600.0 * k, rx) for k in range(25)]
    mags = np.array([np.linalg.norm(d) for d in drs])
    assert mags.max() < 0.6          # never beyond ~60 cm
    assert mags.max() > 0.02         # and not numerically dead
    # varies by centimeters over the day
    assert mags.max() - mags.min() > 0.01


def test_ppp_accepts_tec_and_tides():
    """solve_ppp runs with TEC + tide options enabled and still converges
    on the synthetic scenario (single-frequency GRAPHIC path)."""
    from gnss_sdr_1_tpu.pvt.ppp import PppConfig, solve_ppp
    from gnss_sdr_1_tpu.siggen.scenario import _auto_place, \
        make_test_ephemeris
    from test_ppp import F1, _make_obs

    rx = llh_to_ecef(LAT, LON, 80.0)
    prns = [2, 5, 11, 17, 23, 29]
    toe = np.floor(T0 / 7200.0) * 7200.0
    raans, anoms = _auto_place(rx, prns, toe, T0)
    ephs = {p: make_test_ephemeris(p, toe, plane_raan_deg=raans[i],
                                   anomaly_deg=anoms[i])
            for i, p in enumerate(prns)}
    towt = T0 + np.arange(0, 240, 2.0)
    traj = np.tile(rx, (len(towt), 1))
    epochs = _make_obs(traj, towt, prns, ephs, dual=False,
                       iono_zenith_m=3.3)
    prod = _product(vtec=20.0)
    sol = solve_ppp(epochs, ephs, PppConfig(
        mode="PPP_Static", f1_hz=F1, f2_hz=None, tec=prod,
        tides_week=2204))
    assert sol.valid
    err = np.linalg.norm(sol.rx_ecef_m - rx)
    # sub-2 m despite the iono slab: the TEC rows absorbed it (tides are
    # dm-level on a tide-free synthetic, they must not break convergence)
    assert err < 2.0, err
