"""Per-system auxiliary navigation data: Galileo iono/UTC/almanac (I/NAV
words 5-10), GLONASS UTC/almanac (GNAV strings 5-15), BeiDou D1
almanac/UTC (subframes 4-5) — the reference's per-system model classes
(SURVEY.md §2.3: gps/galileo/glonass/beidou iono, utc_model, almanac)."""

import numpy as np

from gnss_sdr_1_tpu.telemetry.beidou_dnav import (
    BeidouAlmanac, BeidouUtc, D1_ALM_FIELDS, DnavDecoder,
    d1_decode_aux_page, decode_subframe, encode_d1_page_bits)
from gnss_sdr_1_tpu.telemetry.gnav import (
    GlonassAlmanac, GlonassUtc, GnavAux, decode_string_aux,
    encode_string_aux)
from gnss_sdr_1_tpu.telemetry.inav import (
    GalileoAlmanac, GalileoIono, GalileoUtc, InavAux, decode_aux_word,
    encode_aux_word)


def test_galileo_words_5_to_10_roundtrip():
    aux = InavAux()
    aux.iono = GalileoIono(ai0=75.25, ai1=0.5, ai2=0.0123,
                           region_flags=(True, False, True, False, False),
                           valid=True)
    aux.utc = GalileoUtc(a0=-9.3e-9, a1=8.8e-15, delta_t_ls=18,
                         t0t=432000.0, wn0t=81, wn_lsf=137, dn=7,
                         delta_t_lsf=18, a0_g=3.2e-9, a1_g=-1.1e-14,
                         t0_g=345600.0, wn0_g=41, valid=True)
    aux.bgd_e1e5a, aux.bgd_e1e5b = 4.3e-9, 5.1e-9
    sats = [GalileoAlmanac(prn=p, ioda=9, wna=2, t0a=600.0 * 33,
                           delta_sqrt_a=0.03, e=0.0003 * p,
                           omega=0.05 * p - 0.9, delta_i=0.01,
                           omega0=-0.03 * p, omega_dot=-2e-9, m0=0.04 * p,
                           af0=1e-5, af1=3e-11)
            for p in (11, 12, 19)]
    aux._stage["sats"] = sats
    out = InavAux()
    for wt in (5, 6, 7, 8, 9, 10):
        decode_aux_word(encode_aux_word(wt, aux, wn=1200, tow=345600), out)
    assert out.iono.valid and abs(out.iono.ai0 - 75.25) < 0.25
    assert out.iono.region_flags == (True, False, True, False, False)
    assert abs(out.bgd_e1e5a - 4.3e-9) < 2.0**-32
    assert out.utc.valid and out.utc.delta_t_ls == 18
    assert out.utc.t0t == 432000.0 and out.utc.dn == 7
    assert abs(out.utc.a0 - (-9.3e-9)) < 2.0**-30
    assert abs(out.utc.a0_g - 3.2e-9) < 2.0**-35 and out.utc.wn0_g == 41
    assert set(out.almanacs) == {11, 12, 19}
    for i, p in enumerate((11, 12, 19)):
        g, w = out.almanacs[p], sats[i]
        for f, lsb in (("delta_sqrt_a", 2**-9), ("e", 2**-16),
                       ("omega", 2**-15), ("delta_i", 2**-14),
                       ("omega0", 2**-15), ("omega_dot", 2**-33),
                       ("m0", 2**-15), ("af0", 2**-19), ("af1", 2**-38)):
            assert abs(getattr(g, f) - getattr(w, f)) <= lsb, (p, f)
        assert g.t0a == w.t0a and g.wna == w.wna and g.ioda == 9


def test_glonass_string5_and_almanac_roundtrip():
    aux = GnavAux()
    aux.utc = GlonassUtc(n_a=251, tau_c=-1.3e-7, n_4=7, tau_gps=2.1e-8,
                         valid=True)
    alm = GlonassAlmanac(slot=14, c_n=1, m_n=1, tau_n=4.2e-5,
                         lambda_n=-2.11, delta_i_n=0.021, epsilon_n=0.0012,
                         omega_n=1.04, t_lambda_n=33211.5, delta_t_n=-655.1,
                         delta_t_dot_n=0.003, h_n=25, l_n=0)
    out = GnavAux()
    assert decode_string_aux(encode_string_aux(5, aux), out) == 5
    assert decode_string_aux(encode_string_aux(6, aux, alm), out) == 6
    assert decode_string_aux(encode_string_aux(7, aux, alm), out) == 7
    assert out.utc.valid and out.utc.n_4 == 7 and out.utc.n_a == 251
    assert abs(out.utc.tau_c + 1.3e-7) < 2.0**-31
    assert abs(out.utc.tau_gps - 2.1e-8) < 2.0**-30
    g = out.almanacs[14]
    assert g.freq_channel_k == -7            # H_n=25 -> k=-7 (:489-492)
    for f, tol in (("tau_n", 2**-18), ("lambda_n", 2**-18),
                   ("delta_i_n", 2**-18), ("epsilon_n", 2**-20),
                   ("omega_n", 2**-13), ("t_lambda_n", 2**-5),
                   ("delta_t_n", 2**-9), ("delta_t_dot_n", 2**-14)):
        assert abs(getattr(g, f) - getattr(alm, f)) <= tol, f
    # odd string without its even partner does not emit an almanac
    out2 = GnavAux()
    assert decode_string_aux(encode_string_aux(7, aux, alm), out2) == 7
    assert not out2.almanacs


def test_beidou_d1_almanac_and_utc_pages():
    alm = dict(sqrt_a=6493.35, a0=-3.1e-5, a1=2.2e-12, omega0=-0.42,
               e=0.0021, delta_i=0.004, toa=81920.0, omega_dot=-2.1e-9,
               omega=0.61, m0=-0.83)
    # subframe 4 page 9 -> PRN 9; subframe 5 page 3 -> PRN 27
    for fra, pnum, prn in ((4, 9, 9), (5, 3, 27)):
        r = decode_subframe(encode_d1_page_bits(fra, pnum, 345600.0, alm))
        a = d1_decode_aux_page(fra, r["layout"])
        assert isinstance(a, BeidouAlmanac) and a.prn == prn
        for k, v in alm.items():
            assert abs(getattr(a, k) - v) <= D1_ALM_FIELDS[k][1], k
    utc = dict(a0utc=-2.8e-9, a1utc=3.1e-15, delta_t_ls=4, wn_lsf=120,
               dn=6, delta_t_lsf=4)
    r = decode_subframe(encode_d1_page_bits(5, 10, 345606.0, utc))
    u = d1_decode_aux_page(5, r["layout"])
    assert isinstance(u, BeidouUtc) and u.valid
    assert u.delta_t_ls == 4 and u.wn_lsf == 120 and u.dn == 6
    assert abs(u.a0 + 2.8e-9) < 2.0**-30 and abs(u.a1 - 3.1e-15) < 2.0**-50


def test_beidou_decoder_collects_aux_pages():
    alm = dict(sqrt_a=6493.35, a0=-3.1e-5, a1=2.2e-12, omega0=-0.42,
               e=0.0021, delta_i=0.004, toa=81920.0, omega_dot=-2.1e-9,
               omega=0.61, m0=-0.83)
    utc = dict(a0utc=-2.8e-9, a1utc=3.1e-15, delta_t_ls=4, wn_lsf=120,
               dn=6, delta_t_lsf=4)
    stream = np.concatenate([
        encode_d1_page_bits(4, 7, 345600.0, alm),
        encode_d1_page_bits(5, 10, 345606.0, utc),
    ])
    dec = DnavDecoder(prn=8)
    dec.push(1.0 - 2.0 * stream)
    assert 7 in dec.almanacs and dec.almanacs[7].prn == 7
    assert dec.utc is not None and dec.utc.valid and dec.utc.delta_t_ls == 4
