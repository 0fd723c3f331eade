"""Galileo E5a F/NAV tests: page FEC/CRC round-trip, stream decoder,
CS20 channel adapter (galileo_fnav_message.cc / E5a branch of
galileo_telemetry_decoder_gs.cc coverage analogue)."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.telemetry.fnav import (FnavDecoder, FnavExtras,
                                           PAGE_SYMBOLS, decode_page_bits,
                                           decode_symbols, encode_page,
                                           encode_page_bits)
from gnss_sdr_1_tpu.telemetry.inav import GalileoEphemeris


def _test_eph():
    return GalileoEphemeris(
        prn=19, iod_nav=77, toe=345600.0, toc=345600.0,
        m0=0.35, e=2.5e-4, sqrt_a=5440.6, omega0=-0.82, i0=0.31,
        omega=0.66, omega_dot=-1.8e-9, idot=2.2e-10, delta_n=1.3e-9,
        cuc=-2.9e-6, cus=8.1e-6, crc=187.5, crs=-24.0,
        cic=3.2e-8, cis=-1.1e-8, af0=-3.7e-4, af1=-8.0e-12, af2=0.0,
        wn=1042, tow=345610.0)


def test_fnav_page_bits_roundtrip_all_types():
    eph = _test_eph()
    ex = FnavExtras(bgd_e1e5a=4.5e-9, ai0=25.0, ai1=0.25, ai2=0.005,
                    utc_a0=-9.3e-9, utc_a1=2.7e-15, delta_t_ls=18)
    out_eph, out_ex = GalileoEphemeris(), FnavExtras()
    for ptype in (1, 2, 3, 4):
        b = encode_page_bits(ptype, eph, ex)
        assert decode_page_bits(b, out_eph, out_ex) == ptype
    for f in ("iod_nav", "toe", "toc", "wn"):
        assert getattr(out_eph, f) == getattr(eph, f)
    for f, tol in (("m0", 2.0**-31), ("e", 2.0**-33), ("sqrt_a", 2.0**-19),
                   ("omega0", 2.0**-31), ("i0", 2.0**-31),
                   ("omega", 2.0**-31), ("omega_dot", 2.0**-43),
                   ("idot", 2.0**-43), ("delta_n", 2.0**-43),
                   ("cuc", 2.0**-29), ("cus", 2.0**-29), ("crc", 2.0**-5),
                   ("crs", 2.0**-5), ("cic", 2.0**-29), ("cis", 2.0**-29),
                   ("af0", 2.0**-34), ("af1", 2.0**-46)):
        assert getattr(out_eph, f) == pytest.approx(getattr(eph, f), abs=tol)
    assert out_ex.bgd_e1e5a == pytest.approx(ex.bgd_e1e5a, abs=2.0**-32)
    assert out_ex.ai0 == pytest.approx(ex.ai0, abs=2.0**-2)
    assert out_ex.utc_a0 == pytest.approx(ex.utc_a0, abs=2.0**-30)
    assert out_ex.delta_t_ls == ex.delta_t_ls


def test_fnav_symbol_fec_crc_roundtrip_and_error_rejection():
    eph = _test_eph()
    page = encode_page(2, eph)
    assert len(page) == PAGE_SYMBOLS
    body = page[12:]
    # hard symbols at full confidence
    hard = np.where(body == 1, 255, 0).astype(np.uint8)
    bits = decode_symbols(hard)
    assert bits is not None
    out = GalileoEphemeris()
    assert decode_page_bits(bits[:214], out) == 2
    assert out.sqrt_a == pytest.approx(eph.sqrt_a, abs=2.0**-19)
    # Viterbi corrects a few flipped symbols
    noisy = hard.copy()
    noisy[[7, 101, 333]] = 255 - noisy[[7, 101, 333]]
    assert decode_symbols(noisy) is not None
    # heavy corruption must fail CRC, not return garbage
    trashed = hard.copy()
    trashed[::3] = 255 - trashed[::3]
    assert decode_symbols(trashed) is None


def test_fnav_stream_decoder_collects_ephemeris():
    eph = _test_eph()
    rng = np.random.default_rng(7)
    syms = []
    for k, ptype in enumerate((1, 2, 3, 4, 1)):
        e = GalileoEphemeris(**{**eph.__dict__, "tow": eph.tow + 10.0 * k})
        syms.append(encode_page(ptype, e))
    stream = np.concatenate(syms).astype(np.float64)
    amp = (1.0 - 2.0 * stream) + 0.2 * rng.standard_normal(len(stream))
    dec = FnavDecoder(prn=19)
    # leading garbage + chunked feed, inverted polarity
    lead = 0.2 * rng.standard_normal(137)
    full = -np.concatenate([lead, amp])
    for i in range(0, len(full), 400):
        dec.push(full[i : i + 400])
    assert dec.ephemeris_complete
    assert dec.ephemeris.sqrt_a == pytest.approx(eph.sqrt_a, abs=2.0**-19)
    assert dec.ephemeris.af0 == pytest.approx(eph.af0, abs=2.0**-34)
    # TOW anchored at a page start, advancing 20 ms per symbol
    t0 = dec.tow_at_symbol(dec._tow_symbol)
    assert t0 == pytest.approx(dec._tow_s)
    assert dec.tow_at_symbol(dec._tow_symbol + 50) == pytest.approx(t0 + 1.0)


def test_e5a_channel_adapter_cs20_wipe():
    from gnss_sdr_1_tpu.codes.galileo_e5 import galileo_e5ai_secondary
    from gnss_sdr_1_tpu.telemetry.channel_adapters import (
        GalileoE5aChannelDecoder)

    eph = _test_eph()
    pages = [encode_page(p, eph) for p in (1, 2, 3, 4)]
    sym_bits = np.concatenate(pages)
    sym_amp = 1.0 - 2.0 * sym_bits
    cs20 = np.asarray(galileo_e5ai_secondary(), dtype=np.float64)
    # 1 ms prompts: symbol amplitude x CS20 chip, plus noise and an offset
    prompts = (sym_amp[:, None] * cs20[None, :]).reshape(-1)
    rng = np.random.default_rng(3)
    prompts = prompts + 0.15 * rng.standard_normal(len(prompts))
    prompts = np.concatenate([0.15 * rng.standard_normal(13), prompts])
    ad = GalileoE5aChannelDecoder(prn=19)
    for i in range(0, len(prompts), 1000):
        ad.push(prompts[i : i + 1000])
    assert ad.ephemeris_complete
    kep = ad.ephemeris
    assert kep.sqrt_a == pytest.approx(eph.sqrt_a, abs=2.0**-19)
    # TOW at 1 ms epochs interpolates between 20 ms symbols
    base_epoch = ad._sym_epoch0 + 20 * ad._dec._tow_symbol
    assert ad.tow_at_symbol(base_epoch) == pytest.approx(ad._dec._tow_s)
    assert ad.tow_at_symbol(base_epoch + 5) == pytest.approx(
        ad._dec._tow_s + 0.005)
