"""GLONASS GNAV tests: Hamming code, string roundtrip, symbol layer,
stream decoder, RK4 orbit propagation."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.pvt.glonass_orbits import (
    glonass_clock_correction,
    glonass_satpos,
)
from gnss_sdr_1_tpu.telemetry.gnav import (
    GlonassEphemeris,
    GnavDecoder,
    decode_string,
    encode_string,
    hamming_check,
    string_to_symbols,
    symbols_to_string,
)


def _eph():
    # a plausible GLONASS state (circular MEO ~19100 km)
    return GlonassEphemeris(
        slot=5, freq_channel=1, tb_s=11700.0, tk_s=11730.0,
        x_km=11000.123, y_km=-12500.456, z_km=17999.789,
        vx_kms=2.5001, vy_kms=1.2002, vz_kms=-0.7003,
        ax_kms2=1.86e-9, ay_kms2=-0.93e-9, az_kms2=2.79e-9,
        gamma_n=1.8e-12, tau_n_s=-6.5e-6, health_bn=0, nt_days=500,
    )


def test_hamming_encode_check_and_error_detection():
    b = encode_string(1, _eph())
    assert hamming_check(b)
    b2 = b.copy()
    b2[40] ^= 1
    assert not hamming_check(b2)


def test_string_roundtrip_all_fields():
    eph = _eph()
    out = GlonassEphemeris()
    for sid in (1, 2, 3, 4):
        r = decode_string(encode_string(sid, eph), out)
        assert r == sid
    assert out.x_km == pytest.approx(eph.x_km, abs=2**-11)
    assert out.y_km == pytest.approx(eph.y_km, abs=2**-11)
    assert out.z_km == pytest.approx(eph.z_km, abs=2**-11)
    assert out.vx_kms == pytest.approx(eph.vx_kms, abs=2**-20)
    assert out.az_kms2 == pytest.approx(eph.az_kms2, abs=2**-30)
    assert out.tb_s == eph.tb_s
    assert out.tk_s == pytest.approx(11730.0 - 11730.0 % 30 + 30 * 0, abs=30)
    assert out.tau_n_s == pytest.approx(eph.tau_n_s, abs=2**-30)
    assert out.gamma_n == pytest.approx(eph.gamma_n, abs=2**-40)
    assert out.slot == 5 and out.nt_days == 500


def test_symbol_layer_roundtrip():
    b = encode_string(2, _eph())
    syms = string_to_symbols(b)
    assert syms.shape == (200,)
    back = symbols_to_string(syms)
    assert np.array_equal(back, b)


def test_stream_decoder():
    eph = _eph()
    stream = np.concatenate(
        [np.ones(23, dtype=np.int64) * 0]
        + [string_to_symbols(encode_string(sid, eph))
           for sid in (1, 2, 3, 4, 1)])
    amp = (1.0 - 2.0 * stream) * -200.0       # inverted polarity
    rng = np.random.default_rng(1)
    amp = amp + rng.standard_normal(len(amp)) * 30.0
    dec = GnavDecoder(slot=5)
    for i in range(0, len(amp), 97):
        dec.push(amp[i : i + 97])
    assert dec.string_sync
    assert dec.ephemeris_complete
    assert dec.ephemeris.x_km == pytest.approx(eph.x_km, abs=2**-11)
    assert dec.ephemeris.tb_s == eph.tb_s


def test_rk4_orbit_sanity():
    eph = _eph()
    pos0, vel0 = glonass_satpos(eph, eph.tb_s)
    assert np.allclose(pos0, [11000123.0, -12500456.0, 17999789.0], atol=2.0)
    pos1, vel1 = glonass_satpos(eph, eph.tb_s + 300.0)
    # radius stays MEO-ish and motion is consistent with velocity
    assert 2.0e7 < np.linalg.norm(pos1) * 1.035 < 3.0e7
    fd = (pos1 - pos0) / 300.0
    assert np.linalg.norm(fd - (vel0 + vel1) / 2.0) < 5.0
    assert glonass_clock_correction(eph, eph.tb_s + 100.0) == pytest.approx(
        6.5e-6 + 1.8e-12 * 100.0, rel=1e-6)
