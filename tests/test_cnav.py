"""CNAV framing tests: encode a message stream (FEC + CRC), decode through
the CnavDecoder with noise, polarity inversion and symbol-phase offset."""

import numpy as np

from gnss_sdr_1_tpu.telemetry.cnav import (
    CNAV_PREAMBLE,
    CnavDecoder,
    crc_check,
)
from gnss_sdr_1_tpu.utils.native import G1_POLY, G2_POLY, crc24q


def _make_message(prn: int, msg_type: int, tow_next_s: float) -> np.ndarray:
    bits = np.zeros(300, dtype=np.int64)
    bits[:8] = CNAV_PREAMBLE

    def put(lo, hi, v):
        for k in range(hi - lo):
            bits[hi - 1 - k] = (v >> k) & 1

    put(8, 14, prn)
    put(14, 20, msg_type)
    put(20, 37, int(tow_next_s / 6.0))
    rng = np.random.default_rng(prn * 100 + msg_type)
    bits[38:276] = rng.integers(0, 2, 238)
    data = bits[:276]
    pad = (-len(data)) % 8
    by = np.packbits(np.concatenate([data, np.zeros(pad, np.int64)]).astype(np.uint8))
    crc = crc24q(by.tobytes())
    put(276, 300, crc)
    return bits


def _encode_fec(bits: np.ndarray) -> np.ndarray:
    reg = 0
    syms = []
    for b in bits:
        reg = (int(b) << 6) | (reg >> 1)
        syms.append(bin(reg & G1_POLY).count("1") & 1)
        syms.append(bin(reg & G2_POLY).count("1") & 1)
    return np.asarray(syms, dtype=np.int64)


def test_crc_roundtrip():
    m = _make_message(7, 10, 345612.0)
    assert crc_check(m)
    m[50] ^= 1
    assert not crc_check(m)


def test_decoder_end_to_end():
    msgs = [_make_message(7, t, 345600.0 + 12.0 * (k + 1))
            for k, t in enumerate((10, 11, 30))]
    bits = np.concatenate([np.zeros(40, dtype=np.int64)] + list(msgs))
    syms = _encode_fec(bits)
    # symbols -> prompt amplitudes with noise, inverted polarity, phase slip
    rng = np.random.default_rng(0)
    amp = (1.0 - 2.0 * syms) * -300.0
    amp = amp + rng.standard_normal(len(amp)) * 60.0
    amp = np.concatenate([[250.0], amp])     # one stray leading symbol
    dec = CnavDecoder(prn=7)
    for i in range(0, len(amp), 120):
        dec.push(amp[i : i + 120])
    assert dec.frame_sync
    types = [m.msg_type for m in dec.messages]
    assert 10 in types and 11 in types
    m0 = dec.messages[0]
    assert m0.prn == 7
    assert m0.tow_next_s in (345612.0, 345624.0, 345636.0)
    # TOW propagation: 20 ms per symbol
    t_a = dec.tow_at_symbol(1000)
    t_b = dec.tow_at_symbol(1250)
    assert abs((t_b - t_a) - 5.0) < 1e-9


def test_cnav_ephemeris_field_roundtrip():
    """MT10/11/30 encode -> FEC symbols -> decoder recovers every ephemeris,
    clock and iono field at ICD quantization (IS-GPS-200 30.3.3.1-3;
    gps_cnav_navigation_message.cc analogue)."""
    from gnss_sdr_1_tpu.telemetry.cnav import (A_REF_M, OMEGA_DOT_REF_SC,
                                               CnavEphemeris, encode_message)
    from gnss_sdr_1_tpu.telemetry.lnav import GpsIono

    eph = CnavEphemeris(
        prn=7, wn=2190, top=345600.0, toe=345600.0, toc=345600.0,
        delta_a=8341.25, a_dot=-0.25, delta_n0=1.2e-9, delta_n0_dot=1e-13,
        m0=0.41, e=1.3e-2, omega=-0.74, omega0=0.23, i0=0.306,
        delta_omega_dot=3.1e-10, i0_dot=-1.9e-10,
        cis=1.2e-8, cic=-3.1e-8, crs=14.5, crc=201.0,
        cus=7.6e-6, cuc=-2.2e-6,
        af0=-1.9e-4, af1=-3.1e-12, af2=1e-15, tgd=-9.8e-9,
        isc_l2c=-1.5e-9, isc_l5i=2.1e-9)
    iono = GpsIono(alpha0=1.1176e-8, alpha1=-7.4506e-9, alpha2=-5.96e-8,
                   alpha3=1.19e-7, beta0=90112.0, beta1=-16384.0,
                   beta2=-196608.0, beta3=65536.0)
    msgs = [encode_message(10, eph, 345612.0),
            encode_message(11, eph, 345624.0),
            encode_message(30, eph, 345636.0, iono=iono)]
    assert all(crc_check(m) for m in msgs)
    bits = np.concatenate([np.zeros(25, dtype=np.int64)] + msgs)
    syms = _encode_fec(bits)
    rng = np.random.default_rng(5)
    amp = (1.0 - 2.0 * syms) * 200.0 + rng.standard_normal(2 * len(bits)) * 40.0
    dec = CnavDecoder(prn=7)
    dec.push(amp)
    assert dec.ephemeris_complete
    got = dec.ephemeris
    for f, tol in (("delta_a", 2.0**-9), ("a_dot", 2.0**-21),
                   ("delta_n0", 2.0**-44), ("m0", 2.0**-32),
                   ("e", 2.0**-34), ("omega", 2.0**-32),
                   ("omega0", 2.0**-32), ("i0", 2.0**-32),
                   ("delta_omega_dot", 2.0**-44), ("i0_dot", 2.0**-44),
                   ("cis", 2.0**-30), ("cic", 2.0**-30), ("crs", 2.0**-8),
                   ("crc", 2.0**-8), ("cus", 2.0**-30), ("cuc", 2.0**-30),
                   ("af0", 2.0**-35), ("af1", 2.0**-48), ("tgd", 2.0**-35),
                   ("isc_l2c", 2.0**-35), ("isc_l5i", 2.0**-35)):
        assert abs(getattr(got, f) - getattr(eph, f)) <= tol, f
    assert (got.wn, got.toe, got.toc, got.top) == (2190, 345600.0, 345600.0,
                                                   345600.0)
    assert dec.iono.valid
    assert dec.iono.alpha0 == np.float64(1.1176e-8).round(12) or \
        abs(dec.iono.alpha0 - iono.alpha0) <= 2.0**-30
    assert abs(dec.iono.beta2 - iono.beta2) <= 2.0**16
    # Keplerian conversion folds in the CNAV reference offsets
    kep = got.to_keplerian()
    assert kep.sqrt_a == np.sqrt(A_REF_M + got.delta_a)
    assert kep.omega_dot == OMEGA_DOT_REF_SC + got.delta_omega_dot
    assert kep.af0 == got.af0 and kep.toe == got.toe
