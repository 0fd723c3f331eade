"""Galileo I/NAV tests: FEC/interleaver/CRC page roundtrip and the full
symbol-stream decoder with noise and polarity inversion."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.telemetry.inav import (
    GalileoEphemeris,
    InavDecoder,
    check_page_crc,
    decode_part,
    decode_word,
    encode_page,
    encode_word,
    _fec_encode,
    _interleave,
    _deinterleave,
)


def _eph():
    return GalileoEphemeris(
        prn=11, iod_nav=37, toe=345600.0, toc=345600.0,
        m0=0.31, e=0.0003, sqrt_a=float(np.sqrt(29600e3)),
        omega0=-0.41, i0=0.3122, omega=0.177,
        omega_dot=-1.9e-9, idot=1.2e-10, delta_n=8.8e-10,
        cuc=-1.2e-6, cus=7.5e-6, crc=198.5, crs=12.4,
        cic=2.1e-8, cis=-4.0e-8,
        af0=-3.3e-4, af1=-8.0e-12, af2=0.0,
        wn=1150, tow=345602.0,
    )


def test_interleaver_roundtrip():
    x = np.arange(240)
    assert np.array_equal(_deinterleave(_interleave(x)), x)


def test_fec_page_roundtrip():
    eph = _eph()
    w = encode_word(1, eph)
    page = encode_page(w)
    assert page.shape == (500,)
    # decode both parts (hard symbols)
    even = decode_part((page[10:250] * 255).astype(np.uint8))
    odd = decode_part((page[260:500] * 255).astype(np.uint8))
    assert even[0] == 0 and odd[0] == 1
    assert check_page_crc(even, odd)
    out = GalileoEphemeris()
    wt = decode_word(np.concatenate([even[2:114], odd[2:18]]), out)
    assert wt == 1
    assert out.sqrt_a == pytest.approx(eph.sqrt_a, abs=2e-6)
    assert out.m0 == pytest.approx(eph.m0, abs=2**-30)
    assert out.e == pytest.approx(eph.e, abs=2**-32)


def test_word_field_roundtrip_all_types():
    eph = _eph()
    out = GalileoEphemeris()
    for wt in (1, 2, 3, 4, 5):
        decode_word(encode_word(wt, eph), out)
    assert out.omega0 == pytest.approx(eph.omega0, abs=2**-30)
    assert out.idot == pytest.approx(eph.idot, abs=2**-42)
    assert out.crc == pytest.approx(eph.crc, abs=2**-4)
    assert out.af0 == pytest.approx(eph.af0, abs=2**-33)
    assert out.af1 == pytest.approx(eph.af1, abs=2**-45)
    assert out.toc == eph.toc
    assert out.wn == 1150 and out.tow == 345602.0


def test_stream_decoder_with_noise_and_polarity():
    eph = _eph()
    pages = [encode_page(encode_word(wt, eph)) for wt in (5, 1, 2, 3, 4, 5)]
    sym_bits = np.concatenate([np.zeros(37, dtype=np.int64)] + pages)
    amp = (1.0 - 2.0 * sym_bits) * -250.0      # inverted polarity
    rng = np.random.default_rng(0)
    amp = amp + rng.standard_normal(len(amp)) * 40.0
    dec = InavDecoder(prn=11)
    for i in range(0, len(amp), 210):
        dec.push(amp[i : i + 210])
    assert dec.page_sync
    assert dec.ephemeris_complete
    assert 5 in dec.words
    assert dec.ephemeris.sqrt_a == pytest.approx(eph.sqrt_a, abs=2e-6)
    assert dec.ephemeris.iod_nav == 37
    # TOW anchored at a word-5 page start: symbols advance 4 ms each
    t1 = dec.tow_at_symbol(1000)
    t2 = dec.tow_at_symbol(1500)
    assert t1 is not None and t2 - t1 == pytest.approx(2.0, abs=1e-12)
