"""Native host-runtime tests: unpack kernels, Viterbi K=7, CRC-24Q.

Mirrors the reference's libswiftcnav usage (viterbi27.c, edc.c) and the
volk type-convert QA.
"""

import numpy as np
import pytest

from gnss_sdr_1_tpu.utils.native import (
    G1_POLY,
    G2_POLY,
    crc24q,
    have_native,
    unpack_planar,
    viterbi27,
)


def _encode(bits):
    reg = 0
    syms = []
    for b in bits:
        reg = (int(b) << 6) | (reg >> 1)
        syms.append(255 * (bin(reg & G1_POLY).count("1") & 1))
        syms.append(255 * (bin(reg & G2_POLY).count("1") & 1))
    return np.asarray(syms, dtype=np.uint8)


def test_native_library_builds():
    assert have_native()


def test_viterbi_noise_free_and_with_errors():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 300).astype(np.uint8)
    bits[-6:] = 0
    syms = _encode(bits)
    dec, metric = viterbi27(syms)
    assert np.array_equal(dec, bits)
    assert metric == 0
    # random hard symbol errors well inside correction capability
    noisy = syms.copy()
    pos = rng.choice(len(syms), 20, replace=False)
    noisy[pos] = 255 - noisy[pos]
    dec2, _ = viterbi27(noisy)
    assert np.array_equal(dec2, bits)


def test_viterbi_python_fallback_matches_native():
    from gnss_sdr_1_tpu.utils.native import _viterbi27_py

    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 60).astype(np.uint8)
    bits[-6:] = 0
    syms = _encode(bits)
    noisy = syms.copy()
    noisy[::11] = 200 - noisy[::11] // 2
    d_native, m_native = viterbi27(noisy)
    d_py, m_py = _viterbi27_py(np.ascontiguousarray(noisy), len(noisy) // 2,
                               G1_POLY, G2_POLY)
    assert np.array_equal(d_native, d_py)
    assert m_native == m_py


def test_crc24q_matches_reference_table():
    """First entries of the reference's CRC24QTAB (edc.c):
    crc24q of single bytes 0..3 = 000000, 864CFB, 8AD50D, 0C99F6."""
    assert crc24q(bytes([0])) == 0x000000
    assert crc24q(bytes([1])) == 0x864CFB
    assert crc24q(bytes([2])) == 0x8AD50D
    assert crc24q(bytes([3])) == 0x0C99F6
    assert crc24q(b"123456789") == 0xCDE703


def test_unpack_kernels():
    raw = np.array([100, -200, 300, -400], dtype=np.int16)
    u = unpack_planar(raw, "ishort")
    assert u.shape == (2, 2)
    assert u.tolist() == [[100.0, -200.0], [300.0, -400.0]]
    rawb = np.array([1, -2, 3], dtype=np.int8)
    ub = unpack_planar(rawb, "byte")
    assert ub.tolist() == [[1.0, 0.0], [-2.0, 0.0], [3.0, 0.0]]
