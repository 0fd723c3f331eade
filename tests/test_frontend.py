"""SignalConditioner chain tests: DataTypeAdapter -> InputFilter ->
Resampler wired in-path (signal_conditioner.cc; factory wiring
gnss_block_factory.cc:234-252) plus conf-file realization via
runtime.config.build_frontend."""

import numpy as np

from gnss_sdr_1_tpu.condition.filters import (
    direct_resample, fractional_resample)
from gnss_sdr_1_tpu.runtime.config import (
    FileConfiguration, InMemoryConfiguration, build_frontend,
    to_receiver_config)


def _tone(fs, f, n, phi=0.3):
    t = np.arange(n) / fs
    return np.exp(1j * (2 * np.pi * f * t + phi)).astype(np.complex64)


def test_frontend_if_translation():
    """An IF-centered signal is mixed to baseband by the xlating filter
    (freq_xlating_fir_filter.cc role)."""
    fs, if_hz, n = 4.092e6, 120_000.0, 200_000
    rng = np.random.default_rng(3)
    base = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    # band-limit the test signal well inside the filter passband
    from gnss_sdr_1_tpu.condition.filters import design_lowpass_fir
    taps = design_lowpass_fir(129, 0.2 * fs, fs)
    base = np.convolve(base, taps, mode="same").astype(np.complex64)
    x_if = base * _tone(fs, if_hz, n, phi=0.0)
    fe = build_frontend(InMemoryConfiguration({
        "GNSS-SDR.internal_fs_sps": str(fs),
        "SignalSource.sampling_frequency": str(fs),
        "InputFilter.implementation": "Freq_Xlating_Fir_Filter",
        "InputFilter.IF": str(if_hz),
    }))
    assert not fe.is_passthrough
    y = fe.process(x_if)
    # compare away from filter edges, aligned for the FIR group delay
    gd = (fe.n_taps - 1) // 2
    a = base[2000 : len(y) - 2000 - gd]
    b = y[2000 + gd : len(y) - 2000]
    rho = np.vdot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert abs(rho) > 0.98


def test_frontend_resampling_paths():
    fs_in, fs_out, n = 4.092e6, 2.046e6, 100_000
    x = _tone(fs_in, 50_000.0, n)
    fe = build_frontend(InMemoryConfiguration({
        "GNSS-SDR.internal_fs_sps": str(fs_out),
        "SignalSource.sampling_frequency": str(fs_in),
        "Resampler.implementation": "Direct_Resampler",
    }))
    y = fe.process(x)
    np.testing.assert_allclose(y, direct_resample(x, fs_in, fs_out))
    # fractional path on a non-integer ratio
    fs_out2 = 2.5e6
    fe2 = build_frontend(InMemoryConfiguration({
        "GNSS-SDR.internal_fs_sps": str(fs_out2),
        "SignalSource.sampling_frequency": str(fs_in),
        "Resampler.implementation": "Mmse_Resampler",
    }))
    y2 = fe2.process(x)
    ref = _tone(1.0, 50_000.0 / fs_out2, len(y2))  # expected tone at fs_out2
    rho = np.vdot(ref, y2) / (np.linalg.norm(ref) * np.linalg.norm(y2))
    assert abs(rho) > 0.999


def test_fractional_resample_tone_phase_continuity():
    fs_in, fs_out = 3.0e6, 2.2e6
    x = _tone(fs_in, 10_000.0, 60_000)
    y = fractional_resample(x, fs_in, fs_out)
    ph = np.unwrap(np.angle(y))
    step = np.diff(ph)
    expect = 2 * np.pi * 10_000.0 / fs_out
    assert np.abs(step - expect).max() < 1e-3


def test_conf_parses_frontend_and_receiver(tmp_path):
    cfg = FileConfiguration("conf/gps_l1_ishort.conf")
    fe = build_frontend(cfg)
    assert fe.source_fs_hz == 4_000_000.0
    assert fe.internal_fs_hz == 2_000_000.0
    assert fe.resampler_impl == "Direct_Resampler"
    rcfg = to_receiver_config(cfg)
    assert rcfg.fs_hz == 2_000_000.0
    assert rcfg.n_channels == 8
    assert rcfg.extend_correlation_symbols == 20
    assert rcfg.pll_bw_narrow_hz == 12.0
    fe2 = build_frontend(FileConfiguration("conf/gps_l1_if_xlating.conf"))
    assert fe2.if_freq_hz == 420_000.0
    assert not fe2.is_passthrough


def test_channel_satellite_pinning():
    """ChannelN.satellite pins a channel to one PRN
    (gnss_flowgraph.cc:1076-1090)."""
    conf = InMemoryConfiguration({
        "GNSS-SDR.internal_fs_sps": "2046000",
        "Acquisition_1C.implementation": "GPS_L1_CA_PCPS_Acquisition",
        "Channels_1C.count": "3",
        "Channel0.satellite": "7",
    })
    rcfg = to_receiver_config(conf)
    assert rcfg.channel_satellites == (7, None, None)

    from gnss_sdr_1_tpu.runtime import Receiver

    rx = Receiver(rcfg)

    class FakeRes:
        test_stat = np.array([9.0, 8.0, 7.0])
        positive = np.array([True, True, True])
        delay_samples = np.array([10.0, 20.0, 30.0])
        doppler_hz = np.array([0.0, 100.0, -100.0])
        samplestamp = 0

    prn_of = {p: i for i, p in enumerate(rx.acq.prns)}
    fake = FakeRes()
    fake.test_stat = np.zeros(len(rx.acq.prns))
    fake.positive = np.zeros(len(rx.acq.prns), bool)
    fake.delay_samples = np.zeros(len(rx.acq.prns))
    fake.doppler_hz = np.zeros(len(rx.acq.prns))
    for p, stat in ((5, 9.0), (7, 8.0), (9, 7.0), (11, 6.0)):
        fake.test_stat[prn_of[p]] = stat
        fake.positive[prn_of[p]] = True
    rx.acq.acquire = lambda samples, samplestamp=0: fake
    rx._acquire_and_assign(0, np.zeros(rx.acq.cfg.fft_size * 2,
                                       np.complex64))
    # channel 0 is pinned to PRN 7; PRNs 5/9 fill the dynamic channels
    assert rx.channel_prn[0] == 7
    assert set(rx.channel_prn[1:]) == {5, 9}
