"""Telemetry tests: LNAV encode/decode roundtrip, parity, polarity
invariance, and the full symbol-stream decoder (bit sync + frame sync + TOW).

Mirrors gps_l1_ca_telemetry_decoder_test.cc.
"""

import dataclasses

import numpy as np
import pytest

from gnss_sdr_1_tpu.telemetry.decoder import LnavDecoder
from gnss_sdr_1_tpu.telemetry.lnav import (
    GpsEphemeris,
    decode_subframe,
    encode_lnav_frame,
    parity_check,
)


def _eph() -> GpsEphemeris:
    return GpsEphemeris(
        prn=7, week=220, toc=302400, af0=4.2e-5, af1=1.8e-12, af2=0.0,
        tgd=4.65e-9, iodc=321, iode=65, toe=302400,
        sqrt_a=float(np.sqrt(26560e3)), e=0.011, m0=0.35,
        delta_n=1.5e-9 / np.pi, omega0=-0.62, i0=0.31, omega=0.22,
        omega_dot=-2.6e-9 / np.pi, idot=1.1e-10 / np.pi,
        cuc=2.1e-6, cus=7.3e-6, crc=210.5, crs=-45.2, cic=-5.6e-8, cis=9.3e-8,
    )


def test_roundtrip_within_quantization():
    eph = _eph()
    bits = encode_lnav_frame(eph, 302400.0, n_subframes=3)
    out = GpsEphemeris()
    d29s = d30s = 0
    for k in range(3):
        sf = bits[k * 300 : (k + 1) * 300]
        r = decode_subframe(sf, d29s, d30s, out)
        assert r == (k + 1, 302400.0 + (k + 1) * 6.0)
        d29s, d30s = int(sf[-2]), int(sf[-1])
    # ICD Table 20-I LSB per field
    lsb = {"crs": 2.0**-5, "crc": 2.0**-5, "cuc": 2.0**-29, "cus": 2.0**-29,
           "cic": 2.0**-29, "cis": 2.0**-29, "af0": 2.0**-31, "af1": 2.0**-43,
           "af2": 2.0**-55, "tgd": 2.0**-31, "delta_n": 2.0**-43,
           "omega_dot": 2.0**-43, "idot": 2.0**-43, "e": 2.0**-33,
           "sqrt_a": 2.0**-19, "m0": 2.0**-31, "omega0": 2.0**-31,
           "i0": 2.0**-31, "omega": 2.0**-31, "toc": 16.0, "toe": 16.0}
    for f in dataclasses.fields(eph):
        if f.name == "prn":
            continue
        a, b = getattr(eph, f.name), getattr(out, f.name)
        assert abs(a - b) <= max(1e-9 * abs(a), lsb.get(f.name, 1e-12)), f.name


def test_parity_detects_bit_flips():
    bits = encode_lnav_frame(_eph(), 302400.0, n_subframes=1)
    w = bits[60:90].copy()          # word 3
    d29s, d30s = int(bits[58]), int(bits[59])
    assert parity_check(w, d29s, d30s)
    w[5] ^= 1
    assert not parity_check(w, d29s, d30s)


def test_polarity_invariance():
    bits = encode_lnav_frame(_eph(), 302400.0, n_subframes=2)
    inv = 1 - bits
    out = GpsEphemeris()
    r = decode_subframe(inv[300:600], int(inv[298]), int(inv[299]), out)
    assert r is not None and r[0] == 2
    assert out.sqrt_a == pytest.approx(_eph().sqrt_a, abs=1e-3)


def test_stream_decoder_bit_and_frame_sync():
    """Symbols with an arbitrary bit-phase offset and inverted polarity must
    sync and produce the right TOW at each symbol."""
    eph = _eph()
    tow0 = 345600.0
    bits = encode_lnav_frame(eph, tow0, n_subframes=5, subframe_cycle=(1, 2, 3))
    amp = 1.0 - 2.0 * bits           # bit 1 -> -1
    offset = 7                        # symbols before the first full bit
    rng = np.random.default_rng(0)
    sym = np.repeat(amp, 20)
    sym = np.concatenate([amp[:1] * np.ones(offset), sym])
    sym = -sym                        # Costas 180-deg ambiguity
    sym = sym * 300.0 + rng.standard_normal(len(sym)) * 30.0
    starts = np.arange(len(sym), dtype=np.int64) * 4000

    dec = LnavDecoder(prn=7)
    # feed in chunks like the block pipeline does
    for i in range(0, len(sym), 160):
        dec.push(sym[i : i + 160], starts[i : i + 160])
    assert dec.bit_offset == offset % 20
    assert dec.frame_sync
    assert dec.ephemeris_complete
    assert dec.ephemeris.sqrt_a == pytest.approx(eph.sqrt_a, abs=1e-3)
    # TOW contract: symbol at the start of subframe k has TOW tow0 + 6k;
    # symbol index of subframe 1 start = offset (bit 0 begins there)
    tow = dec.tow_at_symbol(offset)
    assert tow == pytest.approx(tow0, abs=1e-9)
    tow2 = dec.tow_at_symbol(offset + 12345)
    assert tow2 == pytest.approx(tow0 + 12.345, abs=1e-9)


def test_lnav_subframe4_page18_iono_utc_roundtrip():
    """Subframe 4 page 18 carries iono+UTC; encode -> decode recovers every
    field at its ICD quantization (gps_navigation_message.cc SV_ID 56)."""
    from gnss_sdr_1_tpu.telemetry.lnav import (GpsEphemeris, GpsIono, GpsUtc,
                                               decode_subframe,
                                               encode_subframe)
    iono = GpsIono(alpha0=1.1176e-8, alpha1=-7.4506e-9, alpha2=-5.9605e-8,
                   alpha3=1.1921e-7, beta0=90112.0, beta1=-16384.0,
                   beta2=-196608.0, beta3=65536.0)
    utc = GpsUtc(a0=-9.3132e-9, a1=2.6645e-15, tot=405504.0, wn_t=150,
                 delta_t_ls=18, wn_lsf=137, dn=7, delta_t_lsf=18)
    eph = GpsEphemeris()
    bits, _, _ = encode_subframe(4, eph, 12.0, 0, 0, iono=iono, utc=utc)
    iono2, utc2 = GpsIono(), GpsUtc()
    out = decode_subframe(bits, 0, 0, GpsEphemeris(), iono=iono2, utc=utc2)
    assert out is not None and out[0] == 4
    assert iono2.valid and utc2.valid
    for f in ("alpha0", "alpha1", "alpha2", "alpha3",
              "beta0", "beta1", "beta2", "beta3"):
        assert getattr(iono2, f) == pytest.approx(getattr(iono, f), rel=1e-3)
    assert utc2.a0 == pytest.approx(utc.a0, abs=2.0**-30)
    assert utc2.a1 == pytest.approx(utc.a1, abs=2.0**-50)
    assert (utc2.tot, utc2.wn_t) == (utc.tot, utc.wn_t)
    assert (utc2.delta_t_ls, utc2.wn_lsf, utc2.dn, utc2.delta_t_lsf) == \
        (utc.delta_t_ls, utc.wn_lsf, utc.dn, utc.delta_t_lsf)


def test_almanac_pages_roundtrip_and_stream_decode():
    """Subframe 4/5 almanac pages (IS-GPS-200 Table 20-VI;
    gps_navigation_message.cc :651-area): encode pages in the frame cycle,
    collect them via LnavDecoder.almanacs, feed warm-start prediction."""
    from gnss_sdr_1_tpu.telemetry.lnav import GpsAlmanac

    eph = _eph()
    alms = [GpsAlmanac(prn=p, e=0.009 + 1e-4 * p, toa=303104.0,
                       delta_i=0.01 * (p - 10) / 10.0,
                       omega_dot=-2.5e-9 / np.pi, sv_health=0,
                       sqrt_a=float(np.sqrt(26560e3)),
                       omega0=-0.6 + 0.05 * p, omega=0.2, m0=0.08 * (p % 10),
                       af0=3e-5, af1=1e-11)
            for p in (9, 17, 25)]
    bits = encode_lnav_frame(eph, 302400.0, n_subframes=10,
                             subframe_cycle=(1, 2, 3, 4, 5), almanacs=alms)
    # direct decode roundtrip
    out = GpsEphemeris()
    got: dict[int, GpsAlmanac] = {}
    d29s = d30s = 0
    for k in range(10):
        sf = bits[k * 300 : (k + 1) * 300]
        r = decode_subframe(sf, d29s, d30s, out, almanacs=got)
        assert r is not None
        d29s, d30s = int(sf[-2]), int(sf[-1])
    assert set(got) == {9, 17, 25}
    a = got[17]
    t = alms[1]
    assert a.e == pytest.approx(t.e, abs=2.0**-21)
    assert a.toa == t.toa
    assert a.sqrt_a == pytest.approx(t.sqrt_a, abs=2.0**-11)
    assert a.omega0 == pytest.approx(t.omega0, abs=2.0**-23)
    assert a.m0 == pytest.approx(t.m0, abs=2.0**-23)
    assert a.delta_i == pytest.approx(t.delta_i, abs=2.0**-19)
    assert a.af0 == pytest.approx(t.af0, abs=2.0**-20)

    # full symbol-stream decoder collects the pages
    sym = np.repeat(1.0 - 2.0 * bits, 20) * 120.0
    dec = LnavDecoder(prn=7)
    dec.push(sym, np.arange(len(sym)) * 1000)
    assert set(dec.almanacs) == {9, 17, 25}

    # almanac-only warm start predicts visibility/Doppler
    from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
    from gnss_sdr_1_tpu.runtime.assistance import (
        predict_visible, predict_visible_from_almanac)

    rx = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    vis_alm = predict_visible_from_almanac(dec.almanacs, rx, 302400.0,
                                           min_elevation_deg=-90.0)
    assert set(vis_alm) == {9, 17, 25}
    # doppler from the almanac orbit matches the same orbit's ephemeris form
    vis_eph = predict_visible(
        {p: a.to_ephemeris() for p, a in dec.almanacs.items()}, rx, 302400.0,
        min_elevation_deg=-90.0)
    for p in vis_alm:
        assert vis_alm[p]["doppler_hz"] == pytest.approx(
            vis_eph[p]["doppler_hz"], abs=1e-6)
