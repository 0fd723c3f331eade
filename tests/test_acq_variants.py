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


def test_fine_doppler_refines_below_grid_step():
    """pcps_acquisition_fine_doppler_cc.cc:estimate_Doppler — the refined
    Doppler must beat the 250 Hz coarse grid by an order of magnitude."""
    from gnss_sdr_1_tpu.acquire import FineDopplerAcquisition, PcpsAcquisition

    prn, delay_chips, doppler = 9, 210.5, 1437.0   # off-grid Doppler
    x = _gps_capture(prn, delay_chips, doppler, cn0=47.0, duration=0.015)
    cfg = AcqConfig(fs_hz=FS, samples_per_code=SPC, samples_per_chip=4,
                    doppler_max_hz=5000.0, doppler_step_hz=250.0,
                    use_cfar=True, pfa=0.001, make_two_steps=False)
    pcps = PcpsAcquisition(cfg, {prn: gps_l1ca_code(prn)},
                           fs_code_rate=(1.023e6, 1023))
    acq = FineDopplerAcquisition(pcps, prn_replicas=10)
    res = acq.acquire(x)
    assert res.positive[0]
    # 10 ms window, 8x zero padding -> 12.5 Hz bins; allow a couple bins
    assert abs(res.doppler_hz[0] - doppler) <= 30.0, res.doppler_hz[0]
    coarse = pcps.acquire(x)
    assert abs(res.doppler_hz[0] - doppler) < abs(
        coarse.doppler_hz[0] - doppler) + 1e-9


def test_pcps_8ms_survives_bit_flip():
    """galileo_pcps_8ms_acquisition_cc: the B = [code, -code] replica must
    keep the full coherent gain when the sign flips at the period
    boundary."""
    from gnss_sdr_1_tpu.acquire import Pcps8msAcquisition

    prn = 19
    fs = 4.092e6
    spc = 16368
    b = galileo_e1_sinboc11(galileo_e1b_code(prn))
    db = resample_code(b, fs, 1.023e6 * 2, spc)
    rng = np.random.default_rng(9)
    delay, doppler = 5000, 625.0
    for flip in (+1.0, -1.0):
        two = np.concatenate([np.roll(db, delay), flip * np.roll(db, delay)])
        n = np.arange(2 * spc)
        x = (two * np.exp(2j * np.pi * doppler * n / fs)
             + 0.7 * (rng.normal(size=2 * spc)
                      + 1j * rng.normal(size=2 * spc))).astype(np.complex64)
        cfg = AcqConfig(fs_hz=fs, samples_per_code=spc, samples_per_chip=4,
                        sampled_ms=2, doppler_max_hz=2000.0,
                        doppler_step_hz=125.0, use_cfar=True, pfa=0.001)
        acq = Pcps8msAcquisition(cfg, {prn: db})
        res = acq.acquire(x)
        assert res.positive[0], f"flip {flip}: stat {res.test_stat[0]}"
        err = min(abs(res.delay_samples[0] - delay),
                  spc - abs(res.delay_samples[0] - delay))
        assert err <= 2, f"flip {flip}"
        assert abs(res.doppler_hz[0] - doppler) <= 125.0


def test_caf_noncoherent_iq_and_doppler_smoothing():
    """galileo_e5a_noncoherent_iq_acquisition_caf_cc: I+Q noncoherent
    combining finds the composite signal; the CAF filter keeps the Doppler
    decision on the true bin."""
    from gnss_sdr_1_tpu.acquire import CafAcquisition
    from gnss_sdr_1_tpu.codes.galileo_e5 import (galileo_e5ai_code,
                                                 galileo_e5aq_code)

    prn = 3
    fs = 4.092e6
    spc = 4092   # 1 ms E5a primary period at 4.092 MHz (test-rate replica)
    di = resample_code(galileo_e5ai_code(prn).astype(np.float32),
                       fs, 10.23e6, spc)
    dq = resample_code(galileo_e5aq_code(prn).astype(np.float32),
                       fs, 10.23e6, spc)
    rng = np.random.default_rng(3)
    delay, doppler = 1234, 1500.0
    n = np.arange(spc)
    comp = (np.roll(di, delay) + 1j * np.roll(dq, delay)).astype(np.complex64)
    x = (comp * np.exp(2j * np.pi * doppler * n / fs)
         + 1.0 * (rng.normal(size=spc)
                  + 1j * rng.normal(size=spc))).astype(np.complex64)
    cfg = AcqConfig(fs_hz=fs, samples_per_code=spc, samples_per_chip=4,
                    doppler_max_hz=5000.0, doppler_step_hz=250.0,
                    use_cfar=True, pfa=0.001)
    for window in (0.0, 3000.0):
        acq = CafAcquisition(cfg, {prn: di}, {prn: dq}, caf_window_hz=window)
        res = acq.acquire(x)
        assert res.positive[0], f"window {window}: stat {res.test_stat[0]}"
        err = min(abs(res.delay_samples[0] - delay),
                  spc - abs(res.delay_samples[0] - delay))
        assert err <= 2, f"window {window}"
        assert abs(res.doppler_hz[0] - doppler) <= 250.0, f"window {window}"


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


def test_registry_is_load_bearing():
    """Conf `implementation=` names change behavior through the factory:
    strategy routing (gnss_block_factory.cc:1249-2300), every native
    strategy backed by importable code, hardware blocks refused."""
    from gnss_sdr_1_tpu.runtime import factory
    from gnss_sdr_1_tpu.runtime.config import (InMemoryConfiguration,
                                               to_receiver_config)

    # every registered native strategy maps to real code
    for (kind, strat), _ in factory.STRATEGY_IMPL.items():
        assert callable(factory.strategy_impl(kind, strat)), (kind, strat)
    for b in factory.REGISTRY.values():
        if b.kind in ("acquisition", "tracking") and b.status == "native" \
                and b.strategy:
            assert (b.kind, b.strategy) in factory.STRATEGY_IMPL, b.name

    def cfg_for(props):
        return to_receiver_config(InMemoryConfiguration(props))

    c = cfg_for({"Acquisition_1C.implementation":
                 "GPS_L1_CA_PCPS_QuickSync_Acquisition"})
    assert c.acq_strategy == "quicksync"
    c = cfg_for({"Acquisition_1C.implementation":
                 "GPS_L1_CA_PCPS_Acquisition_Fine_Doppler"})
    assert c.acq_strategy == "fine_doppler"
    c = cfg_for({"Channels_1B.count": "4",
                 "Acquisition_1B.implementation":
                 "Galileo_E1_PCPS_CCCWSR_Ambiguous_Acquisition"})
    assert c.signal_id == "1B" and c.acq_strategy == "cccwsr"
    c = cfg_for({"Tracking_1C.implementation": "GPS_L1_CA_KF_Tracking"})
    assert c.track_engine == "kf"
    c = cfg_for({"Tracking_1C.correlator": "mxu"})
    assert c.correlator == "mxu"
    assert cfg_for({}).correlator == "auto"

    with pytest.raises(KeyError):
        cfg_for({"Acquisition_1C.implementation": "No_Such_Block"})
    with pytest.raises(ValueError):
        cfg_for({"Tracking_1C.implementation":
                 "GPS_L1_CA_TCP_CONNECTOR_Tracking"})


def test_receiver_dispatches_variant_acquisitions(monkeypatch):
    """The Receiver constructs the strategy-selected acquisition object."""
    from gnss_sdr_1_tpu.acquire import (CccwsrAcquisition,
                                        FineDopplerAcquisition,
                                        QuickSyncAcquisition)
    from gnss_sdr_1_tpu.runtime.receiver import Receiver, ReceiverConfig

    rx = Receiver(ReceiverConfig(fs_hz=4.092e6, n_channels=2,
                                 prn_search=(1, 7),
                                 acq_strategy="quicksync"))
    assert isinstance(rx.acq, QuickSyncAcquisition)
    rx = Receiver(ReceiverConfig(fs_hz=4.092e6, n_channels=2,
                                 prn_search=(1, 7),
                                 acq_strategy="fine_doppler"))
    assert isinstance(rx.acq, FineDopplerAcquisition)
    rx = Receiver(ReceiverConfig(fs_hz=4.092e6, signal_id="1B",
                                 n_channels=2, prn_search=(11, 12),
                                 acq_strategy="cccwsr"))
    assert isinstance(rx.acq, CccwsrAcquisition)
    with pytest.raises(ValueError):
        Receiver(ReceiverConfig(fs_hz=4.092e6, n_channels=2,
                                 prn_search=(1,), acq_strategy="caf"))
