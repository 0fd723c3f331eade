"""Checkpoint/resume (SURVEY.md §5): a receiver snapshotted mid-capture
and resumed in a fresh process continues the run — tracking scan state,
decoder FSMs, observables histories and the RX clock all carry over."""

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


@pytest.fixture(scope="module")
def capture():
    rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    prns = [1, 2, 3, 4, 5, 6]
    scen = build_scenario(rx_ecef, prns, t0_tow=345601.25,
                          duration_s=DURATION, cn0_dbhz=47.0,
                          subframe_cycle=(1, 2, 3))
    cache = pathlib.Path("/tmp/gnss_sdr_tpu_testcache")
    cache.mkdir(exist_ok=True)
    key = cache / f"syspos_{FS:.0f}_{DURATION:.0f}_v3.npy"   # shared with
    if key.exists():                                         # system test
        x = np.load(key)
    else:
        x = generate_baseband(GPS_L1_CA, scen.sats,
                              {p: gps_l1ca_code(p) for p in prns},
                              FS, DURATION, noise=True)
        np.save(key, x)
    return scen, x


def test_checkpoint_resume_continues_run(capture, tmp_path):
    scen, x = capture
    prns = tuple(s.prn for s in scen.sats)
    split = int(FS * 12.0)
    ck = str(tmp_path / "receiver.ckpt")

    rx1 = Receiver(ReceiverConfig(fs_hz=FS, n_channels=6, prn_search=prns))
    rx1.process(x[:split])
    consumed = rx1._abs_base
    assert consumed > 0
    n_eph_mid = sum(1 for d in rx1.decoders.values()
                    if getattr(d, "ephemeris_complete", False))
    rx1.checkpoint(ck)

    rx2 = Receiver.resume_from(ck)
    # resumed object carries the run state
    assert rx2._abs_base == consumed
    assert rx2.channel_prn == rx1.channel_prn
    assert sum(1 for d in rx2.decoders.values()
               if getattr(d, "ephemeris_complete", False)) == n_eph_mid
    np.testing.assert_array_equal(np.asarray(rx2.state.start),
                                  np.asarray(rx1.state.start))
    sols = rx2.process(x[consumed:])

    # the resumed run produces fixes at the reference accuracy bar
    assert len(sols) >= 30
    tail = sols[-10:]
    errs = np.stack([s.rx_ecef_m - scen.rx_ecef for s in tail])
    assert np.median(np.linalg.norm(errs, axis=1)) < 5.0

    # and matches an uninterrupted run's final fixes to sub-meter
    rx3 = Receiver(ReceiverConfig(fs_hz=FS, n_channels=6, prn_search=prns))
    sols3 = rx3.process(x)
    d = np.linalg.norm(np.mean([s.rx_ecef_m for s in sols[-10:]], axis=0)
                       - np.mean([s.rx_ecef_m for s in sols3[-10:]], axis=0))
    assert d < 1.0, f"resumed vs uninterrupted final fix differs by {d:.2f} m"
