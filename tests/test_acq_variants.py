"""QuickSync / CCCWSR acquisition variants (acquire/variants.py) and the
block factory registry (runtime/factory.py)."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.acquire import (AcqConfig, CccwsrAcquisition,
                                    QuickSyncAcquisition)
from gnss_sdr_1_tpu.codes import (galileo_e1_sinboc11, galileo_e1b_code,
                                  galileo_e1c_code, gps_l1ca_code)
from gnss_sdr_1_tpu.codes.sampling import resample_code
from gnss_sdr_1_tpu.constants import GPS_L1_CA
from gnss_sdr_1_tpu.siggen import SatParams, generate_baseband

FS = 4.092e6
SPC = 4092


def _gps_capture(prn, delay_chips, doppler_hz, cn0=47.0, duration=0.01):
    codes = {prn: gps_l1ca_code(prn)}
    sats = [SatParams(prn=prn, doppler_hz=doppler_hz,
                      delay_chips=delay_chips, cn0_dbhz=cn0)]
    return generate_baseband(GPS_L1_CA, sats, codes, FS, duration, noise=True)


@pytest.mark.parametrize("fold,cn0", [(2, 50.0), (4, 53.0)])
def test_quicksync_finds_delay_and_doppler(fold, cn0):
    # folding costs 10*log10(fold) dB of post-correlation SNR (the
    # reference documents the same loss), so higher folds need stronger CN0
    prn, delay_chips, doppler = 7, 513.25, 1750.0
    x = _gps_capture(prn, delay_chips, doppler, cn0=cn0)
    cfg = AcqConfig(fs_hz=FS, samples_per_code=SPC, samples_per_chip=4,
                    doppler_max_hz=5000.0, doppler_step_hz=250.0,
                    use_cfar=True, pfa=0.001)
    acq = QuickSyncAcquisition(cfg, {prn: gps_l1ca_code(prn)},
                               folding_factor=fold,
                               fs_code_rate=(1.023e6, 1023))
    res = acq.acquire(x)
    assert res.positive[0], f"stat {res.test_stat[0]}"
    want = delay_chips / 1.023e6 * FS
    got = res.delay_samples[0]
    err = min(abs(got - want), SPC - abs(got - want))
    assert err <= 0.5 * 4, f"delay {got} vs {want}"   # 0.5 chip at 4 s/chip
    assert abs(res.doppler_hz[0] - doppler) <= 250.0


def test_quicksync_rejects_absent_prn():
    x = _gps_capture(7, 100.0, 500.0)
    cfg = AcqConfig(fs_hz=FS, samples_per_code=SPC, samples_per_chip=4,
                    doppler_max_hz=5000.0, doppler_step_hz=250.0,
                    use_cfar=True, pfa=0.001)
    acq = QuickSyncAcquisition(cfg, {23: gps_l1ca_code(23)},
                               folding_factor=2,
                               fs_code_rate=(1.023e6, 1023))
    res = acq.acquire(x)
    assert not res.positive[0]


def test_cccwsr_combines_data_and_pilot():
    """E1-like composite: data + pilot BOC components; CCCWSR must find the
    delay regardless of the relative sign of the data symbol."""
    prn = 11
    fs = 4.092e6
    spc = 16368   # 4 ms E1 period at 4.092 MHz... (4092*4)
    b = galileo_e1_sinboc11(galileo_e1b_code(prn))  # [8184] 2 samples/chip
    c = galileo_e1_sinboc11(galileo_e1c_code(prn))
    # resample 2-samples/chip sinBOC streams to fs over one period
    db = resample_code(b, fs, 1.023e6 * 2, spc)
    dc = resample_code(c, fs, 1.023e6 * 2, spc)
    rng = np.random.default_rng(5)
    delay = 4000
    for sign in (+1.0, -1.0):
        comp = (sign * np.roll(db, delay) + np.roll(dc, delay)).astype(
            np.complex64)
        doppler = 875.0
        n = np.arange(spc)
        x = comp * np.exp(2j * np.pi * doppler * n / fs)
        x = (x + 0.5 * (rng.normal(size=spc) + 1j * rng.normal(size=spc))
             ).astype(np.complex64)
        cfg = AcqConfig(fs_hz=fs, samples_per_code=spc, samples_per_chip=4,
                        doppler_max_hz=5000.0, doppler_step_hz=250.0,
                        use_cfar=True, pfa=0.001)
        acq = CccwsrAcquisition(cfg, {prn: db}, {prn: dc})
        res = acq.acquire(x)
        assert res.positive[0]
        err = min(abs(res.delay_samples[0] - delay),
                  spc - abs(res.delay_samples[0] - delay))
        assert err <= 2, f"sign {sign}: delay {res.delay_samples[0]} vs {delay}"
        assert abs(res.doppler_hz[0] - doppler) <= 250.0


def test_factory_registry_covers_reference_names():
    from gnss_sdr_1_tpu.runtime import factory

    # the reference factory's registry breadth (gnss_block_factory.cc)
    assert len(factory.REGISTRY) >= 85
    info = factory.resolve("GPS_L1_CA_KF_Tracking")
    assert info.kind == "tracking" and info.strategy == "kf"
    assert factory.resolve("GPS_L1_CA_PCPS_OpenCl_Acquisition").status == \
        "collapsed"
    assert factory.resolve("UHD_Signal_Source").status == "hardware"
    with pytest.raises(KeyError):
        factory.resolve("Nonexistent_Block")
    # every kind is populated
    for kind, minimum in [("source", 15), ("acquisition", 20),
                          ("tracking", 20), ("telemetry", 9),
                          ("adapter", 6), ("filter", 6), ("resampler", 3),
                          ("observables", 4), ("pvt", 4)]:
        assert len(factory.names(kind)) >= minimum, kind
