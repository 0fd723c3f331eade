"""PRN code generation unit tests.

Mirrors the reference's arithmetic/code-generation tier
(src/tests/unit-tests/arithmetic/code_generation_test.cc + volk QA)
with ICD check values.
"""

import numpy as np
import pytest

from gnss_sdr_1_tpu.codes import (
    beidou_b1i_code,
    beidou_b3i_code,
    galileo_e1b_code,
    galileo_e1c_code,
    galileo_e5ai_code,
    generate_code,
    glonass_ca_code,
    gps_l1ca_code,
    gps_l2cm_code,
    gps_l5i_code,
    gps_l5q_code,
    resample_code,
)
from gnss_sdr_1_tpu.codes.gps_l1ca import gps_l1ca_first10_octal


# IS-GPS-200 Table 3-I "first 10 chips octal" check values
@pytest.mark.parametrize(
    "prn,octal",
    [(1, 1440), (2, 1620), (3, 1710), (4, 1744), (5, 1133),
     (10, 1504), (20, 1715), (25, 1743), (32, 1712)],
)
def test_l1ca_icd_first10(prn, octal):
    assert gps_l1ca_first10_octal(prn) == octal


def test_l1ca_balance_and_autocorrelation():
    c = gps_l1ca_code(1)
    assert c.shape == (1023,)
    assert abs(c.sum()) == 1.0           # Gold code balance
    # circular autocorrelation sidelobes bounded (Gold: {-65, -1, 63})
    f = np.fft.fft(c)
    ac = np.real(np.fft.ifft(f * np.conj(f)))
    assert ac[0] == pytest.approx(1023.0, abs=1e-3)
    assert np.abs(ac[1:]).max() <= 65.0 + 1e-3


def test_l1ca_cross_correlation_bound():
    a, b = gps_l1ca_code(3), gps_l1ca_code(7)
    f = np.fft.fft(a) * np.conj(np.fft.fft(b))
    cc = np.real(np.fft.ifft(f))
    assert np.abs(cc).max() <= 65.0 + 1e-3


def test_l2cm_l5_lengths_and_orthogonality():
    l2 = gps_l2cm_code(1)
    assert l2.shape == (10230,)
    l5i, l5q = gps_l5i_code(1), gps_l5q_code(1)
    assert l5i.shape == l5q.shape == (10230,)
    # I/Q components of the same SV are near-orthogonal
    assert abs(np.dot(l5i, l5q)) < 600
    assert abs(np.dot(gps_l5i_code(1), gps_l5i_code(2))) < 600


def test_galileo_codes():
    e1b, e1c = galileo_e1b_code(1), galileo_e1c_code(1)
    assert e1b.shape == e1c.shape == (4092,)
    assert abs(np.dot(e1b, e1c)) < 300
    e5 = galileo_e5ai_code(1)
    assert e5.shape == (10230,)
    assert set(np.unique(e1b)) == {-1.0, 1.0}


def test_glonass_msequence():
    g = glonass_ca_code()
    assert g.shape == (511,)
    # m-sequence: two-valued circular autocorrelation {511, -1}
    f = np.fft.fft(g)
    ac = np.real(np.fft.ifft(f * np.conj(f)))
    assert ac[0] == pytest.approx(511.0, abs=1e-3)
    assert np.allclose(ac[1:], -1.0, atol=1e-3)


def test_beidou_codes():
    b1 = beidou_b1i_code(1)
    assert b1.shape == (2046,)
    assert abs(np.dot(b1, beidou_b1i_code(2))) < 130
    b3 = beidou_b3i_code(1)
    assert b3.shape == (10230,)
    assert abs(np.dot(b3, beidou_b3i_code(2))) < 700


def test_generate_code_dispatch():
    for sid in ("1C", "2S", "L5", "1B", "5X", "1G", "2G", "B1", "B3"):
        c = generate_code(sid, 1)
        assert set(np.unique(c)) <= {-1.0, 1.0}


def test_resampler_floor_contract():
    """SURVEY.md A.2: idx = floor(step*n + shift) mod L, no interpolation."""
    chips = np.arange(10, dtype=np.float32)
    out = resample_code(chips, fs_hz=4.0, code_rate_chips_s=1.0, n_samples=12,
                        chip_shift=0.5)
    expect = chips[np.mod(np.floor(np.arange(12) * 0.25 + 0.5).astype(int), 10)]
    assert np.array_equal(out, expect)
