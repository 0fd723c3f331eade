"""SUPL A-GNSS client/server (runtime/supl.py): assistance payload
round-trip at broadcast quantization and the full loopback session flow
(reference gnss_sdr_supl_client.cc + supl.c session: START -> RESPONSE ->
POS INIT -> POS -> END)."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.runtime.supl import (AcqAssist, SuplAssist, SuplClient,
                                         SuplServer, decode_assist,
                                         encode_assist)
from gnss_sdr_1_tpu.telemetry.lnav import GpsEphemeris, GpsIono, GpsUtc


def _assist():
    ephs = {}
    rng = np.random.default_rng(1)
    for prn in (2, 5, 17, 29):
        ephs[prn] = GpsEphemeris(
            prn=prn, week=314, toc=345600.0, toe=345600.0,
            af0=-1.5e-4, af1=2.3e-12, af2=0.0, tgd=4.7e-9, iodc=44,
            iode=44, sv_health=0,
            sqrt_a=5153.7 + prn * 0.01, e=0.012, m0=float(rng.uniform(-1, 1)),
            delta_n=1.4e-9 / np.pi, omega0=float(rng.uniform(-1, 1)),
            i0=0.31, omega=float(rng.uniform(-1, 1)),
            omega_dot=-8.1e-9 / np.pi, idot=3e-11 / np.pi,
            cuc=-3.1e-6, cus=7.9e-6, crc=230.1, crs=-42.9,
            cic=-9.3e-8, cis=5.6e-8)
    iono = GpsIono(1.2e-8, -7.45e-9, -5.96e-8, 1.19e-7,
                   96256.0, -32768.0, -196608.0, 196608.0, valid=True)
    utc = GpsUtc(a0=9.3e-10, a1=8.8e-15, tot=405504.0, wn_t=58,
                 delta_t_ls=18, wn_lsf=137, dn=7, delta_t_lsf=18, valid=True)
    acq = {2: AcqAssist(prn=2, doppler0_hz=-2250.0, doppler1_hz_s=0.5,
                        code_phase_chips=512.25, code_phase_int_ms=37,
                        azimuth_deg=214.0, elevation_deg=48.0)}
    return SuplAssist(ref_time_week=2314, ref_time_tow_s=345601.25,
                      ref_lat_deg=41.2750, ref_lon_deg=1.9880,
                      ref_alt_m=80.0, has_ref_location=True,
                      ephemerides=ephs, iono=iono, utc=utc, acq_assist=acq)


def test_assist_payload_roundtrip():
    a = _assist()
    b = decode_assist(encode_assist(a))
    assert b.ref_time_week == 2314
    assert abs(b.ref_time_tow_s - 345601.25) < 0.01
    assert abs(b.ref_lat_deg - 41.2750) < 1e-4
    assert abs(b.ref_lon_deg - 1.9880) < 1e-4
    assert abs(b.ref_alt_m - 80.0) < 1.0
    assert set(b.ephemerides) == set(a.ephemerides)
    for prn, e in a.ephemerides.items():
        g = b.ephemerides[prn]
        # broadcast quantization: exact at the LNAV LSBs
        for name, lsb in (("sqrt_a", 2.0**-19), ("e", 2.0**-33),
                          ("m0", 2.0**-31), ("omega0", 2.0**-31),
                          ("af0", 2.0**-31), ("delta_n", 2.0**-43),
                          ("crc", 2.0**-5), ("cuc", 2.0**-29)):
            assert abs(getattr(g, name) - getattr(e, name)) <= lsb, name
        assert g.week == e.week and g.iodc == e.iodc
    assert b.iono is not None and abs(b.iono.alpha0 - 1.2e-8) < 2.0**-30
    assert b.utc is not None and b.utc.delta_t_ls == 18
    q = b.acq_assist[2]
    assert abs(q.doppler0_hz - (-2250.0)) <= 2.5
    assert abs(q.code_phase_chips - 512.25) <= 1.1
    assert q.code_phase_int_ms == 37


def test_supl_session_loopback():
    a = _assist()
    srv = SuplServer(a, port=0)
    try:
        cli = SuplClient("127.0.0.1", srv.port)
        assert cli.get_assistance(244, 5, 0x59E2, 0x31B0) == 0
        assert set(cli.gps_ephemeris_map) == {2, 5, 17, 29}
        # RRLP GPSTime carries the 10-bit mod-1024 week (TS 44.031
        # gpsWeek INTEGER(0..1023)): 2314 mod 1024 = 266
        assert cli.gps_time is not None and cli.gps_time[0] == 2314 % 1024
        assert cli.gps_ref_loc is not None
        assert abs(cli.gps_ref_loc[0] - 41.275) < 1e-4
        assert cli.gps_iono.valid
        assert cli.gps_utc.valid and cli.gps_utc.delta_t_ls == 18
        assert 2 in cli.gps_acq_map
    finally:
        srv.close()


def test_supl_client_handles_dead_server():
    cli = SuplClient("127.0.0.1", 1)    # nothing listens there
    assert cli.get_assistance() != 0


def test_supl_feeds_receiver_assisted_acquisition():
    """SUPL assistance -> Receiver.set_assistance gates acquisition by
    predicted Doppler windows (control_thread.cc:566 assist_GNSS)."""
    from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
    from gnss_sdr_1_tpu.runtime.receiver import Receiver, ReceiverConfig

    a = _assist()
    srv = SuplServer(a, port=0)
    try:
        cli = SuplClient("127.0.0.1", srv.port)
        assert cli.get_assistance() == 0
        rx = Receiver(ReceiverConfig(fs_hz=4.092e6, n_channels=4,
                                     prn_search=(2, 5, 17, 29)))
        lat, lon, alt = cli.gps_ref_loc
        n_vis = rx.set_assistance(
            cli.gps_ephemeris_map,
            llh_to_ecef(np.radians(lat), np.radians(lon), alt),
            cli.gps_time[1])
        assert 0 <= n_vis <= 4
    finally:
        srv.close()


# ---------------- RRLP ASN.1 UPER (round 4) ----------------

def test_rrlp_uper_byte_fixture_iono_only():
    """Hand-computed UPER bitstream (X.691 + TS 44.031 tables, widths per
    the reference's asn-rrlp per-constraints): PDU refNumber=1 carrying
    assistanceData with ONLY an ionosphericModel.

    bits: refNumber(3)=001 | choice ext=0 | choice idx(3)=010 (assistance
    Data) | seq ext=0 | optionals(6)=000100 (gps-AssistData) | ControlHeader
    bitmap(9)=000010000 (ionosphericModel) | 8 x 8-bit two's-complement
    alfa/beta."""
    from gnss_sdr_1_tpu.runtime.rrlp import (decode_assistance_pdu,
                                             encode_assistance_pdu)
    from gnss_sdr_1_tpu.runtime.supl import SuplAssist
    from gnss_sdr_1_tpu.telemetry.lnav import GpsIono

    iono = GpsIono(alpha0=2 * 2.0 ** -30, alpha1=-3 * 2.0 ** -27,
                   alpha2=5 * 2.0 ** -24, alpha3=0.0,
                   beta0=7 * 2.0 ** 11, beta1=-8 * 2.0 ** 14,
                   beta2=1 * 2.0 ** 16, beta3=-1 * 2.0 ** 16, valid=True)
    a = SuplAssist(iono=iono)
    got = encode_assistance_pdu(a, reference_number=1)

    bits = ""
    bits += "001"            # referenceNumber = 1
    bits += "0" + "010"      # RRLP-Component: root, assistanceData
    bits += "0"              # AssistanceData not extended
    bits += "000100"         # only gps-AssistData present
    bits += "000010000"      # ControlHeader: ionosphericModel only
    for q in (2, -3, 5, 0, 7, -8, 1, -1):
        bits += format((q + 128) & 0xFF, "08b")   # cint(-128..127): v+128
    bits += "0" * (-len(bits) % 8)
    want = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert got == want, (got.hex(), want.hex())
    back = decode_assistance_pdu(got)
    assert back.iono.valid
    assert back.iono.alpha1 == pytest.approx(-3 * 2.0 ** -27)
    assert back.iono.beta1 == pytest.approx(-8 * 2.0 ** 14)


def test_rrlp_uper_reference_time_fixture():
    """GPSTime fixture: gpsTOW23b in 80 ms units (23 bits), gpsWeek
    (10 bits), ReferenceTime optional preamble 00."""
    from gnss_sdr_1_tpu.runtime.rrlp import (decode_assistance_pdu,
                                             encode_assistance_pdu)
    from gnss_sdr_1_tpu.runtime.supl import SuplAssist

    a = SuplAssist(ref_time_week=220, ref_time_tow_s=345601.6)
    got = encode_assistance_pdu(a, reference_number=3)
    bits = "011" + "0" + "010" + "0" + "000100"
    bits += "100000000"          # referenceTime only
    bits += "00"                 # gsmTime / gpsTowAssist absent
    bits += format(4320020, "023b")   # 345601.6 / 0.08
    bits += format(220, "010b")
    bits += "0" * (-len(bits) % 8)
    want = bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    assert got == want, (got.hex(), want.hex())
    back = decode_assistance_pdu(got)
    assert back.ref_time_week == 220
    assert back.ref_time_tow_s == pytest.approx(345601.6, abs=0.081)


def test_rrlp_navigation_model_roundtrip_full():
    """Full assistance bundle (nav model + iono + utc + ref time/location +
    acquisition assistance) survives the UPER wire at LNAV quantization."""
    from gnss_sdr_1_tpu.runtime.rrlp import (decode_assistance_pdu,
                                             encode_assistance_pdu)
    from gnss_sdr_1_tpu.runtime.supl import AcqAssist, SuplAssist
    from gnss_sdr_1_tpu.siggen.scenario import make_test_ephemeris
    from gnss_sdr_1_tpu.telemetry.lnav import GpsIono, GpsUtc

    ephs = {p: make_test_ephemeris(p, toe=345600.0) for p in (2, 17, 30)}
    a = SuplAssist(
        ref_time_week=220, ref_time_tow_s=345600.0,
        ref_lat_deg=41.275, ref_lon_deg=-1.988, ref_alt_m=80.0,
        has_ref_location=True,
        ephemerides=ephs,
        iono=GpsIono(alpha0=1e-8, alpha1=-1.5e-8, alpha2=6e-8, alpha3=6e-8,
                     beta0=80e3, beta1=-16e3, beta2=66e3, beta3=-66e3,
                     valid=True),
        utc=GpsUtc(a0=3e-9, a1=-1e-14, tot=405504.0, wn_t=220,
                   delta_t_ls=18, wn_lsf=137, dn=7, delta_t_lsf=18,
                   valid=True),
        acq_assist={5: AcqAssist(prn=5, doppler0_hz=-1250.0,
                                 doppler1_hz_s=-0.5,
                                 code_phase_chips=512.0,
                                 code_phase_int_ms=37,
                                 azimuth_deg=135.0, elevation_deg=45.0)})
    pdu = encode_assistance_pdu(a)
    b = decode_assistance_pdu(pdu)
    assert sorted(b.ephemerides) == [2, 17, 30]
    for p, e in ephs.items():
        d = b.ephemerides[p]
        assert d.iodc == e.iodc and d.week == 220
        assert d.sqrt_a == pytest.approx(e.sqrt_a, abs=2.0 ** -19)
        assert d.e == pytest.approx(e.e, abs=2.0 ** -33)
        assert d.m0 == pytest.approx(e.m0, abs=2.0 ** -31)
        assert d.af0 == pytest.approx(e.af0, abs=2.0 ** -31)
        assert d.omega_dot == pytest.approx(e.omega_dot, abs=2.0 ** -43)
        assert d.crs == pytest.approx(e.crs, abs=2.0 ** -5)
    assert b.has_ref_location
    assert b.ref_lat_deg == pytest.approx(41.275, abs=1e-5)
    assert b.ref_lon_deg == pytest.approx(-1.988, abs=1e-4)
    assert b.ref_alt_m == pytest.approx(80.0, abs=1.0)
    assert b.utc.delta_t_ls == 18 and b.utc.wn_lsf == 137
    q = b.acq_assist[5]
    assert q.doppler0_hz == pytest.approx(-1250.0, abs=2.5)
    assert q.doppler1_hz_s == pytest.approx(-0.5, abs=1 / 42)
    assert q.code_phase_chips == pytest.approx(512.0, abs=1.0)
    assert q.code_phase_int_ms == 37
    assert q.azimuth_deg == pytest.approx(135.0, abs=11.25)
    assert q.elevation_deg == pytest.approx(45.0, abs=11.25)


def test_supl_session_carries_rrlp_uper():
    """End-to-end SUPL session: the POS payload on the wire IS an RRLP
    assistanceData PDU (first bits decode as PDU/component UPER)."""
    from gnss_sdr_1_tpu.runtime.rrlp import decode_assistance_pdu
    from gnss_sdr_1_tpu.runtime.supl import (SuplAssist, SuplClient,
                                             SuplServer)
    from gnss_sdr_1_tpu.siggen.scenario import make_test_ephemeris

    ephs = {p: make_test_ephemeris(p, toe=345600.0) for p in (1, 9)}
    srv = SuplServer(SuplAssist(ref_time_week=220, ref_time_tow_s=345600.0,
                                ephemerides=ephs))
    try:
        cli = SuplClient("127.0.0.1", srv.port)
        assert cli.get_assistance() == 0
        assert sorted(cli.gps_ephemeris_map) == [1, 9]
        assert cli.gps_time == (220, pytest.approx(345600.0, abs=0.081))
        assert cli.gps_ephemeris_map[9].sqrt_a == pytest.approx(
            ephs[9].sqrt_a, abs=2.0 ** -19)
    finally:
        srv.close()
