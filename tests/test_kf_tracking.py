"""Kalman-filter carrier tracking (track/kf.py) vs the reference block's
behavior contract (gps_l1_ca_kf_tracking_cc.cc): Doppler convergence, phase
coherence, Doppler-rate estimation (order 3), NIW covariance adaptation."""

import numpy as np
import pytest

import pytest as _pytest_mark
pytestmark = _pytest_mark.mark.slow

from gnss_sdr_1_tpu.codes import gps_l1ca_code
from gnss_sdr_1_tpu.constants import GPS_L1_CA
from gnss_sdr_1_tpu.siggen import SatParams, generate_baseband
from gnss_sdr_1_tpu.track.kf import KfTrackConfig, KfTrackingEngine

FS = 4.092e6


def _run(order, doppler_hz, doppler_rate=0.0, bayes=False, cn0=45.0,
         duration=1.0, n_ch=2):
    prns = list(range(1, n_ch + 1))
    codes = {p: gps_l1ca_code(p) for p in prns}
    rng = np.random.default_rng(7)
    sats = [SatParams(prn=p, doppler_hz=doppler_hz + 100.0 * i,
                      doppler_rate_hz_s=doppler_rate,
                      delay_chips=float(rng.uniform(0, 1023)),
                      cn0_dbhz=cn0) for i, p in enumerate(prns)]
    x = generate_baseband(GPS_L1_CA, sats, codes, FS, duration, noise=True)

    cfg = KfTrackConfig(fs_hz=FS, code_length_chips=1023,
                        chip_rate_chips_s=1.023e6, carrier_freq_hz=1575.42e6,
                        n_channels=n_ch, order=order, bayes_run=bayes)
    eng = KfTrackingEngine(cfg, np.stack([codes[p] for p in prns]))
    st = eng.init_state()
    for ch, s in enumerate(sats):
        st = eng.activate_channel(
            st, ch, ch, s.delay_chips / 1.023e6 * FS, s.doppler_hz, 0, 0)
    base = len(x) - cfg.epoch_samples_max
    st, outs = eng.track_block(x, st, base)
    return sats, outs


def test_kf_order2_doppler_convergence():
    sats, outs = _run(order=2, doppler_hz=1500.0)
    v = np.asarray(outs.valid)
    dop = np.asarray(outs.carrier_doppler_hz)
    for ch, s in enumerate(sats):
        idx = np.nonzero(v[:, ch])[0]
        tail = dop[idx[-100:], ch]
        assert abs(np.mean(tail) - (s.doppler_hz)) < 2.0, \
            f"ch{ch}: {np.mean(tail)} vs {s.doppler_hz}"
        assert np.std(tail) < 5.0


def test_kf_order3_tracks_doppler_rate():
    sats, outs = _run(order=3, doppler_hz=-800.0, doppler_rate=50.0,
                      duration=1.5)
    v = np.asarray(outs.valid)
    dop = np.asarray(outs.carrier_doppler_hz)
    rate = np.asarray(outs.doppler_rate_hz_s)
    for ch, s in enumerate(sats):
        idx = np.nonzero(v[:, ch])[0]
        # Doppler follows the ramp: compare against truth at the tail epoch
        t_end = idx[-1] * 1e-3
        truth = s.doppler_hz + s.doppler_rate_hz_s * t_end
        assert abs(np.mean(dop[idx[-50:], ch]) - truth) < 5.0
        # rate state converges to ~50 Hz/s
        assert abs(np.mean(rate[idx[-200:], ch]) - s.doppler_rate_hz_s) < 15.0


def test_kf_prompt_power_and_cn0():
    sats, outs = _run(order=2, doppler_hz=300.0, cn0=44.0)
    v = np.asarray(outs.valid)
    corr = np.asarray(outs.correlators)
    cn0 = np.asarray(outs.cn0_dbhz)
    for ch in range(len(sats)):
        idx = np.nonzero(v[:, ch])[0][-100:]
        p = corr[idx, ch, 1, 0] + 1j * corr[idx, ch, 1, 1]
        e = corr[idx, ch, 0, 0] + 1j * corr[idx, ch, 0, 1]
        # prompt dominates early taps once locked
        assert np.mean(np.abs(p)) > 1.3 * np.mean(np.abs(e))
        got = cn0[idx, ch][cn0[idx, ch] > 0]
        assert abs(np.median(got) - 44.0) < 3.0


def test_kf_bayes_covariance_adapts():
    """NIW innovation-covariance estimate engages after ptrans+strans and
    stays positive / same order as the CN0-derived phase variance."""
    sats, outs = _run(order=2, doppler_hz=700.0, bayes=True, duration=1.0)
    v = np.asarray(outs.valid)
    sig2 = np.asarray(outs.carr_phase_sigma2)
    for ch in range(len(sats)):
        idx = np.nonzero(v[:, ch])[0]
        tail = sig2[idx[-100:], ch]
        assert np.all(np.isfinite(tail))
        # theoretical sigma2 at 45 dB-Hz, T=1ms: ~0.016 rad^2; the NIW
        # estimate should land within an order of magnitude
        assert 1e-4 < np.median(tail) < 0.3


def test_kf_low_cn0_drops_channel():
    cfg = KfTrackConfig(fs_hz=FS, code_length_chips=1023,
                        chip_rate_chips_s=1.023e6, carrier_freq_hz=1575.42e6,
                        n_channels=1, order=2, max_lock_fail=1)
    codes = {1: gps_l1ca_code(1)}
    rng = np.random.default_rng(3)
    # pure noise — no signal present
    x = (rng.normal(size=300_000) + 1j * rng.normal(size=300_000)).astype(
        np.complex64)
    eng = KfTrackingEngine(cfg, np.stack([codes[1]]))
    st = eng.init_state()
    st = eng.activate_channel(st, 0, 0, 100.0, 0.0, 0, 0)
    st, outs = eng.track_block(x, st, 280_000)
    assert not bool(np.asarray(st.active)[0])


def test_kf_order3_high_dynamics():
    """Sustained 100 Hz/s Doppler ramp (~19 m/s^2 line-of-sight accel at
    L1): the order-3 KF with the quadratic-phase correlator term holds
    lock and pins the rate state (the reference's high-dynamics scenario
    for KF tracking / the high_dyn resampler variant; its Q design tops
    out between 100 and 150 Hz/s — measured, ours matches)."""
    sats, outs = _run(order=3, doppler_hz=500.0, doppler_rate=100.0,
                      duration=2.0, n_ch=1)
    v = np.asarray(outs.valid)[:, 0]
    dop = np.asarray(outs.carrier_doppler_hz)[:, 0]
    act = np.asarray(outs.active)[:, 0]
    idx = np.nonzero(v)[0]
    assert act[idx[-1]], "channel lost lock under dynamics"
    t_end = idx[-1] * 1e-3
    truth = sats[0].doppler_hz + sats[0].doppler_rate_hz_s * t_end
    assert abs(np.mean(dop[idx[-30:]]) - truth) < 10.0
    rate = np.asarray(outs.doppler_rate_hz_s)[idx[-200:], 0]
    assert abs(np.mean(rate) - 100.0) < 20.0


def test_kf_receiver_end_to_end_fix():
    """GPS_L1_CA_KF_Tracking selected from a conf drives the KF engine as
    the channel tracker and produces PVT fixes (the reference's KF block is
    a drop-in tracking implementation, gps_l1_ca_kf_tracking_cc.h:76)."""
    import pathlib

    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.constants import GPS_L1_CA
    from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
    from gnss_sdr_1_tpu.runtime import Receiver
    from gnss_sdr_1_tpu.runtime.config import (InMemoryConfiguration,
                                               to_receiver_config)
    from gnss_sdr_1_tpu.siggen.generator import generate_baseband
    from gnss_sdr_1_tpu.siggen.scenario import build_scenario

    fs, dur = 4.0e6, 24.0
    rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = [1, 2, 3, 4, 5, 6]
    scen = build_scenario(rx_ecef, prns, t0_tow=345601.25, duration_s=dur,
                          cn0_dbhz=47.0, subframe_cycle=(1, 2, 3))
    cache = pathlib.Path("/tmp/gnss_sdr_tpu_testcache")
    cache.mkdir(exist_ok=True)
    key = cache / f"syspos_{fs:.0f}_24_v3.npy"   # shared with system tier
    if key.exists():
        x = np.load(key)[: int(fs * dur)]
    else:
        x = generate_baseband(GPS_L1_CA, scen.sats,
                              {p: gps_l1ca_code(p) for p in prns},
                              fs, dur, noise=True)

    conf = InMemoryConfiguration({
        "GNSS-SDR.internal_fs_sps": str(fs),
        "Channels_1C.count": "6",
        "Acquisition_1C.implementation": "GPS_L1_CA_PCPS_Acquisition",
        "Tracking_1C.implementation": "GPS_L1_CA_KF_Tracking",
    })
    rcfg = to_receiver_config(conf)
    assert rcfg.track_engine == "kf"
    rcfg = type(rcfg)(**{**rcfg.__dict__, "prn_search": tuple(prns)})
    rx = Receiver(rcfg)
    assert rx.trk_kind == "kf"
    sols = rx.process(x)
    assert len(sols) >= 10, "KF receiver produced no fixes"
    errs = np.stack([s.rx_ecef_m - scen.rx_ecef for s in sols])
    e3d = np.linalg.norm(errs, axis=1)
    # the KF tracker runs wide 1 ms epochs (no extended mode); hold it to
    # the reference's static 3D bar
    assert np.median(e3d) < 5.0, f"median 3D error {np.median(e3d):.2f} m"


def test_kf_tracks_boc_signal():
    """KF tracking on Galileo E1 (sinBOC): the engine runs in the VIRTUAL
    half-chip basis (replica at virtual_rate, code_length*spc), lifting the
    round-4 GPS-L1-only restriction — conf-selectable KF now covers BOC
    channels too (Galileo_E1_KF-style configuration)."""
    import dataclasses

    from gnss_sdr_1_tpu.codes import tracking_replica
    from gnss_sdr_1_tpu.constants import GALILEO_E1B
    from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig
    from gnss_sdr_1_tpu.siggen.generator import SatParams, generate_baseband

    fs = 4.0e6
    prn = 5
    code, virtual_rate, spc = tracking_replica("1B", prn)
    spec = dataclasses.replace(
        GALILEO_E1B, code_rate_chips_s=2.046e6, code_length_chips=2 * 4092,
        bit_rate_bps=250.0)
    true_dop = -1234.0
    x = generate_baseband(
        spec, [SatParams(prn=prn, doppler_hz=true_dop, delay_chips=1000.25,
                         cn0_dbhz=48.0)],
        {prn: code}, fs, 3.0, noise=True, seed=11)
    cfg = ReceiverConfig(fs_hz=fs, signal_id="1B", n_channels=1,
                         prn_search=(prn,), track_engine="kf",
                         acq_dwells=3, watchdog_symbols=0)
    rx = Receiver(cfg)
    assert rx.trk_kind == "kf"
    # virtual basis: 4092 E1B chips x sinBOC half-chip factor
    assert rx.trk.cfg.code_length_chips == 2 * 4092
    assert rx.trk.cfg.chip_rate_chips_s == pytest.approx(virtual_rate)
    rx.process(x)
    assert rx.channel_prn[0] == prn, "KF lost the BOC channel"
    # KF state x[:, 1] is the carrier Doppler [Hz]
    dop = float(np.asarray(rx.state.x)[0, 1])
    assert abs(dop - true_dop) < 25.0, dop
