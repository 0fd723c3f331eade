"""SBAS L1 decoder tests (sbas_l1_telemetry_decoder_gs.cc analogue)."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.telemetry.sbas import (SbasDecoder, SbasGeoNav,
                                           crc_check, decode_mt9, encode_mt9)
from gnss_sdr_1_tpu.utils.native import G1_POLY, G2_POLY


def _nav():
    return SbasGeoNav(
        iodn=3, t0=45616.0, ura=2,
        pos_m=(24786016.64, -34155781.92, -74213.2),
        vel_ms=(1.2, -0.8, 0.52),
        acc_ms2=(0.0000125, -0.0000375, 0.000125),
        agf0=-4.6566e-9, agf1=9.0949e-13)


def _encode_fec(bits):
    reg = 0
    syms = []
    for b in bits:
        reg = (int(b) << 6) | (reg >> 1)
        syms.append(bin(reg & G1_POLY).count("1") & 1)
        syms.append(bin(reg & G2_POLY).count("1") & 1)
    return np.asarray(syms, dtype=np.int64)


def test_mt9_block_roundtrip_and_crc():
    nav = _nav()
    b = encode_mt9(nav, preamble_idx=1)
    assert crc_check(b)
    out = decode_mt9(b)
    assert out.valid and out.iodn == 3 and out.t0 == nav.t0
    for got, want, tol in zip(out.pos_m, nav.pos_m, (0.08, 0.08, 0.4)):
        assert abs(got - want) <= tol
    for got, want in zip(out.vel_ms, nav.vel_ms):
        assert abs(got - want) <= 0.004
    for got, want in zip(out.acc_ms2, nav.acc_ms2):
        assert got == pytest.approx(want, abs=0.0000625)
    assert out.agf0 == pytest.approx(nav.agf0, abs=2.0**-31)
    b[40] ^= 1
    assert not crc_check(b)


def test_sbas_stream_decoder():
    nav = _nav()
    blocks = [encode_mt9(nav, preamble_idx=k) for k in range(3)]
    bits = np.concatenate([np.zeros(17, dtype=np.int64)] + blocks)
    syms = _encode_fec(bits)
    rng = np.random.default_rng(11)
    amp = -((1.0 - 2.0 * syms) * 150.0) + 30.0 * rng.standard_normal(len(syms))
    dec = SbasDecoder(prn=123)
    for i in range(0, len(amp), 333):
        dec.push(amp[i : i + 333])
    assert dec.frame_sync
    assert dec.geo_nav.valid
    assert dec.geo_nav.pos_m[0] == pytest.approx(nav.pos_m[0], abs=0.08)
    assert {m.msg_type for m in dec.messages} == {9}
    # quadratic extrapolation
    p = dec.geo_nav.position_at(nav.t0 + 10.0)
    expect = (np.asarray(dec.geo_nav.pos_m)
              + 10.0 * np.asarray(dec.geo_nav.vel_ms)
              + 50.0 * np.asarray(dec.geo_nav.acc_ms2))
    assert np.allclose(p, expect)
