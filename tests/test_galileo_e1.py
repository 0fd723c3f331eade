"""Galileo E1 tests: acquisition on the recorded capture + VEML tracking.

Mirrors galileo_e1_pcps_ambiguous_acquisition_test.cc (truth: PRN 1, delay
2920 samples, Doppler -632 Hz on the 8 ms @ 4 Msps capture, bounds 0.175
chips / 166 Hz) and the VEML tracking tier.
"""

import os

import numpy as np
import pytest

from gnss_sdr_1_tpu.acquire import AcqConfig, PcpsAcquisition
from gnss_sdr_1_tpu.codes import tracking_replica
from gnss_sdr_1_tpu.codes.galileo_e1 import galileo_e1_sinboc11
from gnss_sdr_1_tpu.constants import GALILEO_E1B
from gnss_sdr_1_tpu.io import read_capture
from gnss_sdr_1_tpu.siggen import SatParams, generate_baseband
from gnss_sdr_1_tpu.track import TrackConfig, TrackingEngine

CAPTURE = "/root/reference/src/tests/signal_samples/Galileo_E1_ID_1_Fs_4Msps_8ms.dat"
FS = 4e6


@pytest.mark.skipif(not os.path.exists(CAPTURE), reason="capture unavailable")
def test_e1_acquisition_on_recorded_capture():
    x = read_capture(CAPTURE)
    cfg = AcqConfig(
        fs_hz=FS, samples_per_code=16000, samples_per_chip=4,
        doppler_max_hz=5000, doppler_step_hz=125, sampled_ms=1,
        max_dwells=2, use_cfar=False, threshold=1.5,
        bit_transition_flag=False,
    )
    replicas = {p: tracking_replica("1B", p)[0] for p in (1, 2, 11)}
    eng = PcpsAcquisition(cfg, replicas, fs_code_rate=(2 * 1.023e6, 2 * 4092))
    r = eng.acquire(x)
    i = eng.prns.index(1)
    assert r.positive[i]
    # reference bounds: 0.175 chips = 0.7 samples @4 Msps is for the CBOC
    # test; allow 2 samples for the sinBOC replica
    assert abs(r.delay_samples[i] - 2920) <= 2.0
    assert abs(r.doppler_hz[i] - (-632)) <= 166.0
    others = np.delete(r.test_stat, i)
    assert r.test_stat[i] > 2.0 * others.max()


def _e1_signal_spec():
    """Generation spec: the sinBOC 'virtual' code at 2.046e6 chips/s."""
    import dataclasses

    return dataclasses.replace(
        GALILEO_E1B,
        code_rate_chips_s=2 * 1.023e6,
        code_length_chips=2 * 4092,
        bit_rate_bps=250.0,   # one I/NAV symbol per 4 ms code period
    )


def test_e1_veml_tracking_locks():
    spec = _e1_signal_spec()
    rng = np.random.default_rng(5)
    symbols = rng.choice([-1.0, 1.0], size=400)
    td = 987.0
    code = galileo_e1_sinboc11(
        __import__("gnss_sdr_1_tpu.codes", fromlist=["galileo_e1b_code"])
        .galileo_e1b_code(1))
    x = generate_baseband(
        spec,
        [SatParams(prn=1, doppler_hz=td, delay_chips=777.5, cn0_dbhz=45,
                   nav_bits=symbols)],
        {1: code}, FS, 1.2, noise=True, seed=6)
    cfg = TrackConfig(
        fs_hz=FS, code_length_chips=4092, chip_rate_chips_s=1.023e6,
        carrier_freq_hz=1575.42e6, n_channels=1, code_samples_per_chip=2,
        veml=True, early_late_space_chips=0.15,
        very_early_late_space_chips=0.6, pll_bw_hz=15.0, dll_bw_hz=2.0,
    )
    eng = TrackingEngine(cfg, np.stack([code]))
    st = eng.init_state()
    # delay 777.5 virtual chips at 2.046e6 -> samples
    st = eng.activate_channel(st, 0, 0, 777.5 / 2.046e6 * FS, td + 20.0, 0, 0)
    base, nmax = 80000, cfg.epoch_samples_max
    dops, cn0s = [], []
    pos = 0
    while pos + base + nmax <= len(x):
        st, out = eng.track_block(x[pos : pos + base + nmax], st, base)
        v = np.asarray(out.valid[:, 0])
        dops += list(np.asarray(out.carrier_doppler_hz[:, 0])[v])
        cn0s += list(np.asarray(out.cn0_dbhz[:, 0])[v])
        pos += base
    assert bool(np.asarray(st.active)[0])
    assert abs(np.mean(dops[-40:]) - td) < 5.0
    # SNV CN0 under-reads on BOC at 4 Msps: one-sample code quantization is
    # half the BOC(1,1) main-peak width, so floor-resampler scalloping
    # modulates |P| and registers as noise (same geometry as the reference's
    # sinboc replica at this fs); lock itself is solid.
    assert np.mean(cn0s[-20:]) > 30.0
