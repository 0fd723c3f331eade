"""BeiDou D1 NAV tests: BCH(15,11) codec with error correction, word
interleaving, subframe roundtrip, stream decoder."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.telemetry.beidou_dnav import (
    BeidouEphemeris,
    D1_FIELDS,
    DnavDecoder,
    bch1511_decode,
    bch1511_encode,
    decode_subframe,
    decode_word,
    encode_subframe_bits,
    encode_word,
)


def test_bch_roundtrip_and_single_error_correction():
    rng = np.random.default_rng(0)
    for _ in range(20):
        data = rng.integers(0, 2, 11)
        cw = bch1511_encode(data)
        out, ok = bch1511_decode(cw)
        assert ok and np.array_equal(out, data)
        # flip any single bit -> corrected
        pos = int(rng.integers(0, 15))
        cw2 = cw.copy()
        cw2[pos] ^= 1
        out2, ok2 = bch1511_decode(cw2)
        assert ok2 and np.array_equal(out2, data)


def test_word_interleave_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2, 22)
    w = encode_word(data)
    out, ok = decode_word(w)
    assert ok and np.array_equal(out[:22], data)


def test_subframe_roundtrip():
    sf = encode_subframe_bits(3, 234567.0)
    assert sf.shape == (300,)
    r = decode_subframe(sf)
    assert r is not None
    assert r["fra_id"] == 3
    assert r["sow_s"] == 234567.0


def test_d1_ephemeris_field_roundtrip():
    """ICD field placement (Beidou_DNAV.h positions/scale factors): encode
    subframes 1-3 from a truth ephemeris, stream-decode, compare fields."""
    truth = BeidouEphemeris(
        prn=8, week=810, toc=345600.0, toe=345600.0,
        af0=-3.2e-5, af1=1.1e-11, af2=0.0, tgd=4.7e-9,
        sqrt_a=np.sqrt(27_906_100.0), e=0.0031,
        m0=0.41, delta_n=1.1e-9, omega0=-0.73, i0=0.31,
        omega=0.22, omega_dot=-2.1e-9, idot=8.0e-11,
        cuc=1.2e-6, cus=-2.3e-6, crc=180.5, crs=-41.25,
        cic=4.0e-8, cis=-6.0e-8)
    sow0 = 345600.0
    sfs = [encode_subframe_bits(1, sow0, {
        "wn": truth.week, "toc": truth.toc, "tgd1": truth.tgd,
        "a0": truth.af0, "a1": truth.af1, "a2": truth.af2,
        "alpha0": 1.1e-8, "beta0": 90112.0}),
        encode_subframe_bits(2, sow0 + 6.0, {
            "delta_n": truth.delta_n, "cuc": truth.cuc, "m0": truth.m0,
            "e": truth.e, "cus": truth.cus, "crc": truth.crc,
            "crs": truth.crs, "sqrt_a": truth.sqrt_a,
            "toe_msb": int(truth.toe / 8.0) >> 15}),
        encode_subframe_bits(3, sow0 + 12.0, {
            "toe_lsb": int(truth.toe / 8.0) & 0x7FFF, "i0": truth.i0,
            "cic": truth.cic, "omega_dot": truth.omega_dot,
            "cis": truth.cis, "idot": truth.idot,
            "omega0": truth.omega0, "omega": truth.omega})]
    dec = DnavDecoder(prn=8)
    dec.push(1.0 - 2.0 * np.concatenate(sfs).astype(np.float64))
    assert dec.ephemeris_complete
    e = dec.ephemeris
    assert e.week == truth.week
    assert e.toe == truth.toe
    assert e.toc == truth.toc
    assert e.sqrt_a == pytest.approx(truth.sqrt_a, abs=2e-6)
    assert e.e == pytest.approx(truth.e, abs=2e-10)
    assert e.m0 == pytest.approx(truth.m0, abs=1e-9)
    assert e.omega0 == pytest.approx(truth.omega0, abs=1e-9)
    assert e.omega == pytest.approx(truth.omega, abs=1e-9)
    assert e.i0 == pytest.approx(truth.i0, abs=1e-9)
    assert e.omega_dot == pytest.approx(truth.omega_dot, abs=2e-13)
    assert e.idot == pytest.approx(truth.idot, abs=2e-13)
    assert e.delta_n == pytest.approx(truth.delta_n, abs=2e-13)
    assert e.af0 == pytest.approx(truth.af0, abs=2e-10)
    assert e.af1 == pytest.approx(truth.af1, abs=1e-15)
    assert e.tgd == pytest.approx(truth.tgd, abs=1e-10)
    assert e.cuc == pytest.approx(truth.cuc, abs=5e-10)
    assert e.crc == pytest.approx(truth.crc, abs=0.02)
    assert e.crs == pytest.approx(truth.crs, abs=0.02)
    assert dec.iono.valid
    assert dec.iono.alpha[0] == pytest.approx(1.1e-8, abs=1e-9)


def test_stream_decoder_with_noise():
    sfs = [encode_subframe_bits(k, 345600.0 + 6.0 * k) for k in (1, 2, 3)]
    bits = np.concatenate([np.zeros(17, dtype=np.int64)] + sfs)
    amp = (1.0 - 2.0 * bits) * 300.0
    rng = np.random.default_rng(3)
    amp += rng.standard_normal(len(amp)) * 40.0
    dec = DnavDecoder(prn=6)
    for i in range(0, len(amp), 111):
        dec.push(amp[i : i + 111])
    assert dec.frame_sync
    assert set(dec.subframes) >= {1, 2}
    assert dec.subframes[2]["sow_s"] == 345612.0
    t1, t2 = dec.sow_at_symbol(100), dec.sow_at_symbol(150)
    assert t2 - t1 == pytest.approx(1.0, abs=1e-12)
