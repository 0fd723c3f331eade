"""Acquisition tests.

Mirrors gps_l1_ca_pcps_acquisition_test.cc (Instantiate / ValidationOfResults
on the recorded 4 Msps capture: delay error <= 0.5 chip, Doppler error <= 1
bin) plus synthetic-grid checks.
"""

import os

import numpy as np
import pytest

from gnss_sdr_1_tpu.acquire import AcqConfig, PcpsAcquisition
from gnss_sdr_1_tpu.codes import gps_l1ca_code
from gnss_sdr_1_tpu.constants import GPS_L1_CA
from gnss_sdr_1_tpu.io import read_capture
from gnss_sdr_1_tpu.siggen import SatParams, generate_baseband

CAPTURE = "/root/reference/src/tests/signal_samples/GPS_L1_CA_ID_1_Fs_4Msps_2ms.dat"
FS = 4e6


def _engine(**kw):
    base = dict(fs_hz=FS, samples_per_code=4000, samples_per_chip=4,
                doppler_max_hz=5000, doppler_step_hz=250, sampled_ms=1,
                max_dwells=2, use_cfar=False, threshold=1.7)
    base.update(kw)
    cfg = AcqConfig(**base)
    codes = {p: gps_l1ca_code(p) for p in range(1, 9)}
    return PcpsAcquisition(cfg, codes, fs_code_rate=(1.023e6, 1023))


@pytest.mark.skipif(not os.path.exists(CAPTURE), reason="capture unavailable")
def test_recorded_capture_validation():
    """Reference truth: PRN 1, delay 524 samples, Doppler +1680 Hz
    (gps_l1_ca_pcps_acquisition_test.cc:279+)."""
    x = read_capture(CAPTURE)
    eng = _engine()
    r = eng.acquire(x)
    i = eng.prns.index(1)
    assert r.positive[i]
    # <= 0.5 chip = 2 samples
    assert abs(r.delay_samples[i] - 524) <= 2.0
    # <= 1 Doppler bin + margin (reference allows 250+25 Hz)
    assert abs(r.doppler_hz[i] - 1680) <= 275.0
    # the true satellite's statistic dominates every other channel
    others = np.delete(r.test_stat, i)
    assert r.test_stat[i] > 3.0 * others.max()


def test_synthetic_delay_doppler_and_cfar():
    codes = {p: gps_l1ca_code(p) for p in range(1, 9)}
    x = generate_baseband(
        GPS_L1_CA,
        [SatParams(prn=3, doppler_hz=-2250.0, delay_chips=401.25, cn0_dbhz=46)],
        codes, FS, 0.002, noise=True, seed=3,
    )
    eng = _engine(use_cfar=True, pfa=1e-5, threshold=0.0)
    r = eng.acquire(x)
    i = eng.prns.index(3)
    assert r.positive[i]
    true_delay = 401.25 / 1.023e6 * FS
    assert abs(r.delay_samples[i] - true_delay) <= 2.0
    assert abs(r.doppler_hz[i] - (-2250.0)) <= 275.0
    # absent satellites below threshold
    assert not r.positive[eng.prns.index(5)]


def test_two_step_fine_doppler():
    codes = {p: gps_l1ca_code(p) for p in range(1, 9)}
    x = generate_baseband(
        GPS_L1_CA,
        [SatParams(prn=2, doppler_hz=1111.0, delay_chips=100.5, cn0_dbhz=48)],
        codes, FS, 0.004, noise=True, seed=4,
    )
    eng = _engine(max_dwells=2, make_two_steps=True, doppler_step2_hz=40.0,
                  num_doppler_bins_step2=10)
    r = eng.acquire(x)
    i = eng.prns.index(2)
    assert r.positive[i]
    assert abs(r.doppler_hz[i] - 1111.0) <= 45.0


def test_threshold_from_pfa_rule():
    """SURVEY.md A.8 exponential-quantile threshold."""
    cfg = AcqConfig(fs_hz=FS, samples_per_code=4000, doppler_max_hz=5000,
                    doppler_step_hz=250, use_cfar=True, pfa=1e-5)
    thr = cfg.derived_threshold()
    import math
    ncells = 4000 * cfg.num_doppler_bins
    val = (1 - 1e-5) ** (1.0 / ncells)
    expect = -math.log1p(-val) / 4000
    assert thr == pytest.approx(expect, rel=1e-12)
    assert 0 < thr < 1.0


def test_tong_sequential_detector():
    """Tong counter converges to present/absent decisions
    (pcps_tong_acquisition_cc analogue)."""
    codes = {p: gps_l1ca_code(p) for p in range(1, 9)}
    x = generate_baseband(
        GPS_L1_CA,
        [SatParams(prn=4, doppler_hz=500.0, delay_chips=222.0, cn0_dbhz=45)],
        codes, FS, 0.040, noise=True, seed=9,
    )
    eng = _engine(max_dwells=1, threshold=1.6)
    r = eng.acquire_tong(x, tong_init=2, tong_max=8, max_dwells=30)
    i = eng.prns.index(4)
    assert r.positive[i]
    assert abs(r.delay_samples[i] - 222.0 / 1.023e6 * FS) <= 2.0
    others = np.delete(r.positive, i)
    assert not others.any()
