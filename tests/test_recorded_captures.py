"""Regression tier on the reference's RECORDED IQ captures — correctness
evidence that is not self-generated (siggen-free).

Truth values come from the reference's own unit tests:
- Galileo E1 8 ms @ 4 Msps: PRN 1, delay 2920 samples, Doppler -632 Hz
  (galileo_e1_pcps_ambiguous_acquisition_test.cc:293-294, tolerance
  <= 0.5 chip / <= 1 bin at :353-357)
- NT1065 GLONASS L1 4 ms @ 6.625 Msps: slot 11, delay 1343 samples,
  Doppler -2750 Hz (glonass_l1_ca_dll_pll_tracking_test.cc:138-165 —
  the acquisition handoff the tracking test is seeded with)
- GPS L1 2 ms @ 4 Msps is covered by tests/test_acquisition.py.
"""

import os

import numpy as np
import pytest

from gnss_sdr_1_tpu.acquire import AcqConfig, PcpsAcquisition
from gnss_sdr_1_tpu.codes import glonass_ca_code, tracking_replica
from gnss_sdr_1_tpu.io import read_capture

SAMPLES = "/root/reference/src/tests/signal_samples"
GAL_CAPTURE = f"{SAMPLES}/Galileo_E1_ID_1_Fs_4Msps_8ms.dat"
GLO_CAPTURE = f"{SAMPLES}/NT1065_GLONASS_L1_20160831_fs6625e6_if0e3_4ms.bin"


@pytest.mark.skipif(not os.path.exists(GAL_CAPTURE),
                    reason="capture unavailable")
def test_galileo_e1_recorded_acquisition():
    """E1B acquisition on the recorded CBOC capture: the E1B sinBOC replica
    correlates against the true E1B+E1C sum; bit_transition handles the
    possible symbol flip between the two 4 ms code periods."""
    fs = 4e6
    x = read_capture(GAL_CAPTURE)
    assert len(x) == 32000
    prns = [1, 2, 11, 19]
    codes, vrate, spc = {}, None, None
    for p in prns:
        rep, vrate, spc = tracking_replica("1B", p)
        codes[p] = rep
    cfg = AcqConfig(
        fs_hz=fs, samples_per_code=16000, samples_per_chip=4,
        doppler_max_hz=5000.0, doppler_step_hz=125.0, max_dwells=1,
        bit_transition_flag=True, use_cfar=False, threshold=1.5)
    eng = PcpsAcquisition(cfg, codes, fs_code_rate=(vrate, 4092 * spc))
    r = eng.acquire(x)
    i = eng.prns.index(1)
    assert r.positive[i], f"stats {r.test_stat}"
    # reference tolerance: 0.5 E1 chip = 1.955 samples (:353)
    assert abs(r.delay_samples[i] - 2920) <= 2.0, r.delay_samples[i]
    # <= 1 Doppler bin + margin
    assert abs(r.doppler_hz[i] - (-632.0)) <= 150.0, r.doppler_hz[i]
    # absent satellites stay below the detection statistic
    others = np.delete(np.asarray(r.test_stat), i)
    assert r.test_stat[i] > 1.5 * others.max()


@pytest.mark.skipif(not os.path.exists(GLO_CAPTURE),
                    reason="capture unavailable")
def test_glonass_nt1065_recorded_acquisition():
    """GLONASS L1 C/A acquisition on the NT1065 front-end capture (slot 11
    at frequency channel 0 after the NT1065 downconversion).  The capture
    is 4 ms; two 1 ms dwells accumulate non-coherently over the doubled
    bit_transition window (meander flips every 10 ms)."""
    fs = 6.625e6
    # gr_complex with a 4-byte truncated tail: 26499 whole samples = 4 ms
    x = read_capture(GLO_CAPTURE)
    assert len(x) == 26499
    code = glonass_ca_code()
    slots = [3, 7, 11, 18]
    cfg = AcqConfig(
        fs_hz=fs, samples_per_code=int(round(fs * 1e-3)),
        samples_per_chip=13, doppler_max_hz=5000.0, doppler_step_hz=250.0,
        max_dwells=2, bit_transition_flag=True, use_cfar=False,
        threshold=1.5, make_two_steps=True, doppler_step2_hz=50.0,
        num_doppler_bins_step2=10)
    eng = PcpsAcquisition(cfg, {s: code for s in slots},
                          fs_code_rate=(0.511e6, 511))
    r = eng.acquire(x)
    i = eng.prns.index(11)
    assert r.positive[i], f"stats {r.test_stat}"
    # all slots share the PRN code, so every channel peaks at the same
    # delay; the truth handoff is delay 1343, doppler -2750 (tracking test)
    assert abs(r.delay_samples[i] - 1343) <= 7.0, r.delay_samples[i]
    assert abs(r.doppler_hz[i] - (-2750.0)) <= 300.0, r.doppler_hz[i]
