"""BeiDou D2 NAV (GEO PRN 1-5): page round-trip, split-field assembly,
and the 2 ms-symbol channel adapter path (reference
beidou_dnav_navigation_message.cc d2_subframe_decoder :746-933)."""

import numpy as np

from gnss_sdr_1_tpu.telemetry.beidou_dnav import (
    BeidouEphemeris, BeidouIono, D2Decoder, d2_fields_for, decode_subframe,
    encode_d2_page_bits)
from gnss_sdr_1_tpu.telemetry.channel_adapters import BeidouChannelDecoder


def _eph():
    return BeidouEphemeris(
        prn=3, week=810, toc=345600.0, toe=345600.0,
        af0=-2.354671e-4, af1=3.1832314e-12, af2=0.0, tgd=8.0e-9,
        iodc=11, iode=7,
        sqrt_a=6493.41, e=0.002913, m0=0.30123, delta_n=1.2e-9 / np.pi,
        omega0=-0.61223, i0=0.0316 / np.pi, omega=0.8811,
        omega_dot=-6.8e-10 / np.pi, idot=2.1e-11 / np.pi,
        cuc=-6.2e-6, cus=7.3e-6, crc=201.3, crs=-55.1,
        cic=-7.5e-8, cis=1.1e-7, sat_h1=0)


def _iono():
    return BeidouIono(alpha=(1.1176e-8, 2.98e-8, -1.789e-7, 1.19e-7),
                      beta=(92160.0, 49152.0, -131072.0, -196608.0),
                      valid=True)


def _page_stream(eph, iono, sow0=345600.0, frames=False, seed=0):
    """Transmitted bit stream of subframe-1 pages 1..10.

    frames=False: pages back-to-back (decoder-layer test).
    frames=True: realistic 3 s frames — each page followed by four filler
    subframes (the D2 subframes 2-5 the decoder skips), page SOW integral.
    """
    rng = np.random.default_rng(seed)
    bits = []
    for k, page in enumerate(range(1, 11)):
        sow = sow0 + (3.0 * k if frames else 1.0 * k)
        bits.append(encode_d2_page_bits(
            page, sow, d2_fields_for(eph, page, iono)))
        if frames:
            bits.append(rng.integers(0, 2, size=4 * 300).astype(np.int64))
    return np.concatenate(bits)


def test_d2_page_roundtrip():
    eph, iono = _eph(), _iono()
    for page in range(1, 11):
        tx = encode_d2_page_bits(page, 345600.0 + page,
                                 d2_fields_for(eph, page, iono))
        r = decode_subframe(tx)
        assert r is not None and r["fra_id"] == 1
        assert r["sow_s"] == 345600.0 + page


def test_d2_ephemeris_assembly():
    eph, iono = _eph(), _iono()
    dec = D2Decoder(prn=3)
    stream = _page_stream(eph, iono)
    # symbols at amplitude 1, 0 -> +1, 1 -> -1 like the decoders expect
    dec.push(1.0 - 2.0 * stream)
    assert dec.ephemeris_complete
    got = dec.ephemeris
    for name in ("week", "iodc", "iode", "sat_h1"):
        assert getattr(got, name) == getattr(eph, name), name
    # quantized fields within one LSB
    tol = {"af0": 2.0**-33, "af1": 2.0**-50, "sqrt_a": 2.0**-19,
           "e": 2.0**-33, "m0": 2.0**-31, "delta_n": 2.0**-43,
           "omega0": 2.0**-31, "i0": 2.0**-31, "omega": 2.0**-31,
           "omega_dot": 2.0**-43, "idot": 2.0**-43,
           "cuc": 2.0**-31, "cus": 2.0**-31, "crc": 2.0**-6,
           "crs": 2.0**-6, "cic": 2.0**-31, "cis": 2.0**-31,
           "toc": 8.0, "toe": 8.0, "tgd": 0.1e-9}
    for name, lsb in tol.items():
        assert abs(getattr(got, name) - getattr(eph, name)) <= lsb, name
    assert dec.iono.valid
    np.testing.assert_allclose(dec.iono.alpha, iono.alpha, atol=2.0**-24)
    np.testing.assert_allclose(dec.iono.beta, iono.beta, atol=2.0**16)


def test_d2_adapter_both_phases_and_polarity():
    """1 ms prompts -> 2 ms symbols through BeidouChannelDecoder, for both
    2-epoch phases and both polarities, with noise."""
    eph, iono = _eph(), _iono()
    stream = _page_stream(eph, iono, frames=True)
    sym = 1.0 - 2.0 * stream                  # [N] +-1 at 2 ms
    rng = np.random.default_rng(4)
    for phase in (0, 1):
        for pol in (1.0, -1.0):
            prompts = np.repeat(pol * sym, 2)  # 1 ms epochs
            prompts = np.concatenate([rng.normal(size=phase), prompts])
            prompts = prompts + 0.25 * rng.normal(size=len(prompts))
            dec = BeidouChannelDecoder(prn=2)
            assert dec.is_geo
            for i in range(0, len(prompts), 500):
                dec.push(prompts[i : i + 500])
            assert dec.ephemeris_complete, (phase, pol)
            assert dec.ephemeris.week == eph.week
            # TOW propagation: page k starts at symbol 1500k with
            # SOW = 345600 + 3k; check an epoch 20 symbols past page 0
            sow = dec.tow_at_symbol(phase + 40)   # symbol 20
            assert sow is not None
            assert abs(sow - (345600.0 + 0.002 * 20)) < 1e-9, (phase, pol)


def test_d1_adapter_unchanged_for_meo():
    dec = BeidouChannelDecoder(prn=8)
    assert not dec.is_geo
    assert dec.sec_sync_offset is None   # until NH sync
