"""SUPL A-GNSS client/server (runtime/supl.py): assistance payload
round-trip at broadcast quantization and the full loopback session flow
(reference gnss_sdr_supl_client.cc + supl.c session: START -> RESPONSE ->
POS INIT -> POS -> END)."""

import numpy as np

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
        assert cli.gps_time is not None and cli.gps_time[0] == 2314
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
