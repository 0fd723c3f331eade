"""Streaming pipeline (Receiver.process_stream): double-buffered segments
must reproduce the batch path's fixes, including from RAW integer blocks
(the io.network / rtl_tcp ingestion shape — SURVEY §3.1 I/O-compute
overlap)."""

import pathlib

import numpy as np
import pytest

import pytest as _pytest_mark
pytestmark = _pytest_mark.mark.slow

from gnss_sdr_1_tpu.codes import gps_l1ca_code
from gnss_sdr_1_tpu.constants import GPS_L1_CA
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig
from gnss_sdr_1_tpu.siggen.generator import generate_baseband
from gnss_sdr_1_tpu.siggen.scenario import build_scenario

FS = 4.0e6
DURATION = 24.0
RX_ECEF = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
PRNS = [1, 2, 3, 4, 5, 6]


@pytest.fixture(scope="module")
def capture():
    scen = build_scenario(RX_ECEF, PRNS, t0_tow=345601.25,
                          duration_s=DURATION, cn0_dbhz=47.0,
                          subframe_cycle=(1, 2, 3))
    cache = pathlib.Path("/tmp/gnss_sdr_tpu_testcache")
    cache.mkdir(exist_ok=True)
    key = cache / f"syspos_{FS:.0f}_{DURATION:.0f}_v3.npy"
    if key.exists():
        x = np.load(key)
    else:
        x = generate_baseband(GPS_L1_CA, scen.sats,
                              {p: gps_l1ca_code(p) for p in PRNS},
                              FS, DURATION, noise=True)
        np.save(key, x)
    return scen, x


def _assert_fixes(scen, sols, n_min):
    assert len(sols) >= n_min, f"only {len(sols)} fixes"
    errs = np.stack([s.rx_ecef_m - scen.rx_ecef for s in sols])
    e3d = np.linalg.norm(errs, axis=1)
    assert np.median(e3d) < 5.0, f"median 3D {np.median(e3d):.2f} m"


def test_stream_matches_batch_complex_blocks(capture):
    scen, x = capture

    def blocks(chunk=int(0.1 * FS)):
        pos = 0
        while pos < len(x):
            yield pos, x[pos : pos + chunk]
            pos += chunk

    rx = Receiver(ReceiverConfig(fs_hz=FS, n_channels=6,
                                 prn_search=tuple(PRNS)))
    sols = rx.process_stream(blocks(), segment_s=1.0)
    # streaming drops the final partial segment (a live stream has no
    # end-of-capture flush), so slightly fewer epochs than batch
    _assert_fixes(scen, sols, 20)


def test_stream_raw_ishort_blocks(capture):
    """RAW int16 I/Q blocks unpack on device (1/4 the f32 link width)."""
    scen, x = capture
    iq = np.empty(2 * len(x), dtype=np.int16)
    iq[0::2] = np.clip(np.round(x.real * 1000), -32767, 32767)
    iq[1::2] = np.clip(np.round(x.imag * 1000), -32767, 32767)

    def blocks(chunk_samples=int(0.1 * FS)):
        pos = 0
        while pos < len(iq):
            yield pos, iq[pos : pos + 2 * chunk_samples]
            pos += 2 * chunk_samples

    rx = Receiver(ReceiverConfig(fs_hz=FS, n_channels=6,
                                 prn_search=tuple(PRNS)))
    sols = rx.process_stream(blocks(), segment_s=1.0, raw_format="ishort")
    _assert_fixes(scen, sols, 20)


def test_stream_2bit_packed_blocks(capture):
    """Nibble-packed 2-bit I/Q blocks (LabSat/NSR class, io.formats
    '2bits_cpx'): 1/8 the planar-f32 link width, unpacked on device; the
    ~0.55 dB quantization loss must not break the position bar."""
    scen, x = capture
    sigma = np.std(x.real)
    qi = np.clip(np.round(x.real * 0.7 / sigma), -2, 1).astype(np.int64)
    qq = np.clip(np.round(x.imag * 0.7 / sigma), -2, 1).astype(np.int64)
    nibs = (qi & 3) | ((qq & 3) << 2)                  # [N]
    n2 = len(nibs) // 2 * 2
    packed = ((nibs[0:n2:2] << 4) | nibs[1:n2:2]).astype(np.uint8)

    def blocks(chunk_bytes=int(0.1 * FS) // 2):
        pos = 0
        while pos < len(packed):
            yield pos, packed[pos : pos + chunk_bytes]
            pos += chunk_bytes

    rx = Receiver(ReceiverConfig(fs_hz=FS, n_channels=6,
                                 prn_search=tuple(PRNS)))
    sols = rx.process_stream(blocks(), segment_s=1.0,
                             raw_format="2bits_cpx")
    # 2-bit quantization adds ~0.55 dB CN0 loss plus code-phase noise at
    # 2 samples/chip — hold a relaxed bar (the reference's 5 m bar is for
    # full-precision captures; its own 2-bit sources carry the same
    # penalty)
    assert len(sols) >= 20, f"only {len(sols)} fixes"
    errs = np.stack([s.rx_ecef_m - scen.rx_ecef for s in sols])
    e3d = np.linalg.norm(errs, axis=1)
    assert np.median(e3d) < 8.0, f"median 3D {np.median(e3d):.2f} m"
