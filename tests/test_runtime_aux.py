"""Runtime auxiliary subsystem tests: config, assistance, telecommand,
monitor records, printers."""

import socket

import numpy as np
import pytest

from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.pvt.solver import PvtSolution
from gnss_sdr_1_tpu.runtime.assistance import (
    load_assistance,
    predict_visible,
    save_assistance,
)
from gnss_sdr_1_tpu.runtime.config import (
    FileConfiguration,
    InMemoryConfiguration,
    to_receiver_config,
)
from gnss_sdr_1_tpu.runtime.monitor import GnssSynchro, UdpSink
from gnss_sdr_1_tpu.runtime.telecommand import TelecommandServer
from gnss_sdr_1_tpu.siggen.scenario import make_test_ephemeris


def test_in_memory_configuration_typed_getters():
    c = InMemoryConfiguration()
    c.set_property("Tracking_1C.pll_bw_hz", "35.5")
    c.set_property("Tracking_1C.order", "3")
    c.set_property("Tracking_1C.dump", "true")
    assert c.property("Tracking_1C.pll_bw_hz", 0.0) == 35.5
    assert c.property("Tracking_1C.order", 0) == 3
    assert c.property("Tracking_1C.dump", False) is True
    assert c.property("missing", 7) == 7


def test_reference_conf_parses(tmp_path):
    p = tmp_path / "t.conf"
    p.write_text(
        "; comment\n"
        "GNSS-SDR.internal_fs_sps=2500000\n"
        "Channels_1C.count=5\n"
        "Acquisition_1C.implementation=GPS_L1_CA_PCPS_Acquisition\n"
        "Acquisition_1C.doppler_max=6000 ; inline comment\n"
        "Tracking_1C.pll_bw_hz=30.0\n")
    rc = to_receiver_config(FileConfiguration(str(p)))
    assert rc.fs_hz == 2.5e6
    assert rc.n_channels == 5
    assert rc.doppler_max_hz == 6000.0
    assert rc.pll_bw_hz == 30.0
    assert rc.signal_id == "1C"


def test_assistance_roundtrip_and_visibility(tmp_path):
    ephs = {p: make_test_ephemeris(p, toe=345600.0, plane_raan_deg=-40 + 30 * p,
                                   anomaly_deg=30 * p) for p in (1, 2, 3)}
    path = tmp_path / "agnss.json"
    save_assistance(str(path), ephs, ref_llh=(41.0, 2.0, 100.0),
                    ref_tow_s=345600.0)
    ephs2, ref, tow = load_assistance(str(path))
    assert set(ephs2) == {1, 2, 3}
    assert ephs2[1].sqrt_a == ephs[1].sqrt_a
    assert ref == (41.0, 2.0, 100.0) and tow == 345600.0
    rx = llh_to_ecef(np.radians(41.0), np.radians(2.0), 100.0)
    vis = predict_visible(ephs2, rx, 345600.0, min_elevation_deg=-90.0)
    assert set(vis) == {1, 2, 3}
    for v in vis.values():
        assert abs(v["doppler_hz"]) < 6000.0


def test_telecommand_dispatch():
    class Dummy:
        def __init__(self):
            self.calls = []

        def status(self):
            return "tracking 5 channels"

        def standby(self):
            self.calls.append("standby")

        def hot_start(self, lat, lon, h, when):
            self.calls.append(("hot", lat, lon, h))

    d = Dummy()
    srv = TelecommandServer(d)
    assert srv.serve_once("status") == "tracking 5 channels"
    assert srv.serve_once("standby") == "OK"
    assert srv.serve_once("hotstart 17/08/2026 12:00:00 41.27 1.98 80") == "OK"
    assert srv.serve_once("bogus") .startswith("ERROR")
    assert d.calls == ["standby", ("hot", 41.27, 1.98, 80.0)]


def test_telecommand_over_tcp():
    class Dummy:
        def status(self):
            return "OK-STATUS"

    srv = TelecommandServer(Dummy(), port=0)
    port = srv.start()
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        f = s.makefile("rw")
        f.write("status\n")
        f.flush()
        assert f.readline().strip() == "OK-STATUS"
    srv.stop()


def test_monitor_udp_sink():
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.settimeout(5.0)
    port = rx_sock.getsockname()[1]
    sink = UdpSink(port=port, decimation=1)
    rec = GnssSynchro(prn=9, cn0_db_hz=43.5, carrier_doppler_hz=-1234.0)
    sink.send_synchro([rec])
    data = rx_sock.recv(65536).decode()
    assert '"prn": 9' in data and '"cn0_db_hz": 43.5' in data
    sol = PvtSolution(True, np.array([1.0, 2.0, 3.0]), 1e-4,
                      np.zeros(3), 0.0, 345600.0, lat_deg=41.0, lon_deg=2.0,
                      height_m=80.0, dops={"pdop": 2.0}, n_sats=6)
    sink.send_pvt(sol)
    data = rx_sock.recv(65536).decode()
    assert '"n_sats": 6' in data
    sink.close()
    rx_sock.close()


def test_printers_produce_valid_output():
    from gnss_sdr_1_tpu.pvt import printers

    sol = PvtSolution(True, llh_to_ecef(np.radians(41.0), np.radians(2.0), 50.0),
                      1e-4, np.zeros(3), 0.0, 345600.0,
                      lat_deg=41.0, lon_deg=2.0, height_m=50.0,
                      dops={"pdop": 2.0, "hdop": 1.0}, n_sats=7)
    utc = printers.gps_time_to_utc(2240, 345600.0)
    gga = printers.nmea_gga(sol, utc)
    assert gga.startswith("$GPGGA") and "*" in gga
    # checksum verifies
    body, _, ck = gga[1:].partition("*")
    c = 0
    for ch in body:
        c ^= ord(ch)
    assert f"{c:02X}" == ck
    kml = printers.kml_document([sol])
    assert "2.000000000,41.000000000,50.000" in kml
    eph = make_test_ephemeris(3, toe=345600.0)
    rec = printers.rinex_nav_record(eph)
    assert rec.startswith("G03") and rec.count("\n") == 8
    hdr = printers.rinex_obs_header()
    assert "RINEX VERSION" in hdr and "END OF HEADER" in hdr


def test_tracking_dump_roundtrip(tmp_path):
    from gnss_sdr_1_tpu.runtime.dumps import TrackingDump, read_tracking_dump

    class O:  # minimal TrackOutputs stand-in
        pass

    t, c, k = 5, 2, 3
    o = O()
    o.valid = np.ones((t, c), bool)
    o.start = np.arange(t * c).reshape(t, c).astype(np.int32)
    o.cur_len = np.full((t, c), 4000, np.int32)
    o.correlators = np.random.default_rng(0).standard_normal((t, c, k, 2)).astype(np.float32)
    o.carrier_doppler_hz = np.zeros((t, c), np.float32)
    o.code_freq_delta = np.zeros((t, c), np.float32)
    o.rem_code_phase_samples = np.zeros((t, c), np.float32)
    o.cn0_dbhz = np.full((t, c), 43.0, np.float32)
    d = TrackingDump()
    d.push_outputs([7, None], o, block_offset=1000)
    files = d.write(str(tmp_path))
    assert any("prn07" in f for f in files)
    back = read_tracking_dump([f for f in files if f.endswith(".npz")][0])
    assert len(back["prompt_i"]) == t
    assert back["start_sample"][0] == 1000
    assert np.allclose(back["prompt_i"], o.correlators[:, 0, 1, 0])
