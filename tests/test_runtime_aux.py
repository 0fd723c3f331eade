"""Runtime auxiliary subsystem tests: config, assistance, telecommand,
monitor records, printers."""

import pathlib
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


# ---------------- receiver-integrated aux plane (round 3) ----------------

@pytest.fixture(scope="module")
def short_capture():
    """2.5 s of one strong GPS L1 satellite whose nav bits never frame-sync
    (all-ones stream): tracking locks, telemetry TOW stays None."""
    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.constants import GPS_L1_CA
    from gnss_sdr_1_tpu.siggen.generator import SatParams, generate_baseband

    fs = 2.046e6
    x = generate_baseband(
        GPS_L1_CA,
        [SatParams(prn=7, doppler_hz=1200.0, delay_chips=300.25,
                   cn0_dbhz=48.0)],
        {7: gps_l1ca_code(7)}, fs, 2.5, noise=True, seed=3)
    return fs, x


def test_receiver_monitor_tap_and_watchdog(short_capture):
    """enable_monitor streams Gnss_Synchro records over UDP during a run;
    the telemetry watchdog releases a channel that never frame-syncs
    (gnss_flowgraph.cc:680 monitor tap; telemetry timeout analogue)."""
    from gnss_sdr_1_tpu.runtime.receiver import Receiver, ReceiverConfig

    fs, x = short_capture
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    rx_sock.settimeout(5.0)
    port = rx_sock.getsockname()[1]
    cfg = ReceiverConfig(
        fs_hz=fs, signal_id="1C", n_channels=1, prn_search=(7,),
        enable_monitor=True, monitor_port=port, monitor_decimation=100,
        watchdog_symbols=1200)
    rx = Receiver(cfg)
    rx.process(x)
    # watchdog fired at least once: the channel was released despite
    # healthy tracking (it may be legitimately re-acquired afterwards)
    assert rx.watchdog_trips >= 1
    assert 7 in rx.sym_count    # tracked (sym_count resets on re-acquire)
    data = rx_sock.recv(65536).decode()
    rx_sock.close()
    assert '"prn": 7' in data
    rec = None
    import json as _json
    for line in data.splitlines():
        rec = _json.loads(line)
        break
    assert rec["signal"] == "1C" and rec["flag_valid_symbol_output"]
    assert rec["flag_valid_word"] is False   # no TOW ever decoded


def test_receiver_telecommand_target(short_capture):
    """The Receiver fulfils the TcpCmdInterface target contract: status
    reporting, standby gating the processing loop, cold_start clearing
    channel state (tcp_cmd_interface.cc:58-66)."""
    from gnss_sdr_1_tpu.runtime.receiver import Receiver, ReceiverConfig

    fs, x = short_capture
    cfg = ReceiverConfig(fs_hz=fs, signal_id="1C", n_channels=1,
                         prn_search=(7,), watchdog_symbols=0)
    rx = Receiver(cfg)
    srv = TelecommandServer(rx, port=0)
    port = srv.start()
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        f = s.makefile("rw")
        f.write("standby\n")
        f.flush()
        assert f.readline().strip() == "OK"
    rx.process(x)                       # standby: loop exits immediately
    assert rx.sym_count.get(7) is None
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        f = s.makefile("rw")
        f.write("reset\n")
        f.flush()
        f.readline()
        f.write("status\n")
        f.flush()
        assert "channels 0/1" in f.readline()
    rx.process(x)
    assert rx.sym_count.get(7, 0) > 1000
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        f = s.makefile("rw")
        f.write("coldstart\n")
        f.flush()
        assert f.readline().strip() == "OK"
    assert all(p is None for p in rx.channel_prn)
    assert not rx.decoders
    srv.stop()


def test_assisted_acquisition_gates_assignment(short_capture):
    """set_assistance: satellites predicted invisible are never assigned;
    ones inside the Doppler window are (control_thread.cc:566 assist_GNSS +
    pcps_assisted_acquisition window)."""
    from gnss_sdr_1_tpu.runtime.receiver import Receiver, ReceiverConfig

    fs, x = short_capture
    rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)

    # PRN 7 is in the capture; assistance predicts only PRN 3 visible
    cfg = ReceiverConfig(fs_hz=fs, signal_id="1C", n_channels=1,
                         prn_search=(7,), watchdog_symbols=0)
    rx = Receiver(cfg)
    rx._assist = {3: {"doppler_hz": 0.0}}
    rx._assist_window_hz = 600.0
    rx.process(x[: int(fs)])
    assert rx.channel_prn[0] is None            # 7 not predicted -> skipped

    # prediction for PRN 7 at the right Doppler -> assigned
    rx2 = Receiver(cfg)
    rx2._assist = {7: {"doppler_hz": 1100.0}}
    rx2._assist_window_hz = 600.0
    rx2.process(x[: int(fs)])
    assert rx2.channel_prn[0] == 7 or rx2.sym_count.get(7, 0) > 0

    # prediction far off -> rejected as sideband
    rx3 = Receiver(cfg)
    rx3._assist = {7: {"doppler_hz": -3000.0}}
    rx3._assist_window_hz = 600.0
    rx3.process(x[: int(fs)])
    assert rx3.channel_prn[0] is None


def test_assisted_acquisition_narrows_grid(short_capture):
    """Assistance narrows the SEARCH GRID itself (not a post-filter):
    pcps_assisted_acquisition_cc.cc:188 get_assistance sets
    d_doppler_min/max BEFORE searching.  The assisted program's Doppler
    bin count (and so its FFT count) drops ~grid/window, and the found
    satellite carries the full (predicted + residual) Doppler."""
    from gnss_sdr_1_tpu.runtime.receiver import Receiver, ReceiverConfig

    fs, x = short_capture
    cfg = ReceiverConfig(fs_hz=fs, signal_id="1C", n_channels=1,
                         prn_search=(7,), watchdog_symbols=0,
                         doppler_max_hz=5000.0, doppler_step_hz=250.0)
    rx = Receiver(cfg)
    # hand-built prediction 80 Hz off the true 1200 Hz (well inside the
    # 18 Hz PLL pull-in after the two-step refinement)
    rx._assist = {7: {"doppler_hz": 1280.0}}
    rx._assist_window_hz = 500.0
    rx._assist_prns = {7}
    import dataclasses as dc

    # bit_transition (two-period window): the predicted offset is a
    # non-integer number of cycles per window (see set_assistance)
    narrow = dc.replace(rx._acq_cfg, doppler_max_hz=500.0,
                        bit_transition_flag=True)
    from gnss_sdr_1_tpu.acquire import PcpsAcquisition

    rx._assist_acq = PcpsAcquisition(
        narrow, {7: rx._codes[7]}, fs_code_rate=rx._fs_code_rate,
        freq_offsets_by_prn={7: 1280.0})
    # >= 5x fewer Doppler bins -> >= 5x fewer acquisition FFTs
    assert rx.acq.cfg.num_doppler_bins >= 5 * narrow.num_doppler_bins
    rx.process(x[: int(fs)])
    assert rx.channel_prn[0] == 7
    # engine Doppler seeded near truth (residual + prediction)
    dop = float(np.asarray(rx.state.carrier_doppler_hz)[0])
    assert abs(dop - 1200.0) < 60.0, dop


def test_set_assistance_builds_narrow_program(short_capture):
    """set_assistance() with real ephemerides installs the narrowed
    program automatically and predicts visibility."""
    from gnss_sdr_1_tpu.runtime.receiver import Receiver, ReceiverConfig
    from gnss_sdr_1_tpu.siggen.scenario import build_scenario

    fs, _x = short_capture
    rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    scen = build_scenario(rx_ecef, [7], t0_tow=345601.25, duration_s=1.0,
                          cn0_dbhz=47.0)
    cfg = ReceiverConfig(fs_hz=fs, signal_id="1C", n_channels=1,
                         prn_search=(7,))
    rx = Receiver(cfg)
    n = rx.set_assistance(scen.ephemerides, rx_ecef, 345601.25,
                          window_hz=600.0)
    assert n == 1
    assert rx._assist_acq is not None
    assert rx._assist_acq.cfg.doppler_max_hz == 600.0
    assert rx._assist_acq.prns == [7]
    # predicted Doppler folded into the replica offset
    assert rx._assist_acq.freq_offsets[7] == pytest.approx(
        rx._assist[7]["doppler_hz"])


def test_rinex_multiconstellation_nav_roundtrip(tmp_path):
    """RINEX 3.02 nav printer/reader round-trip for all four systems
    (rinex_printer.cc:964,1186 <-> rinex2assist)."""
    from gnss_sdr_1_tpu.pvt import printers
    from gnss_sdr_1_tpu.pvt.rinex_reader import read_rinex_nav_mixed
    from gnss_sdr_1_tpu.siggen.scenario import (
        _gps_to_beidou, _gps_to_galileo)
    from gnss_sdr_1_tpu.telemetry.gnav import GlonassEphemeris
    from gnss_sdr_1_tpu.telemetry.lnav import GpsIono

    g = make_test_ephemeris(7, toe=345600.0, plane_raan_deg=40.0,
                            anomaly_deg=120.0, af0=1.5e-5)
    e = _gps_to_galileo(make_test_ephemeris(11, toe=345600.0,
                                            plane_raan_deg=-60.0))
    e.iod_nav = 37
    c = _gps_to_beidou(make_test_ephemeris(6, toe=345600.0,
                                           plane_raan_deg=100.0))
    r = GlonassEphemeris(
        slot=5, freq_channel=-3, tb_s=11700.0, tk_s=11730.0,
        x_km=11000.123, y_km=-12500.456, z_km=17999.789,
        vx_kms=2.5001, vy_kms=1.2002, vz_kms=-0.7003,
        ax_kms2=1.86e-9, gamma_n=1.8e-12, tau_n_s=-6.5e-6,
        nt_days=500)
    iono = GpsIono(alpha0=1.1e-8, alpha1=-7.45e-9, beta0=90112.0,
                   beta1=-16384.0, valid=True)
    txt = printers.rinex_nav_header(iono=iono)
    for eph in (g, e, c, r):
        txt += printers.rinex_nav_record(eph)
    assert "GPSA" in txt and "IONOSPHERIC CORR" in txt
    p = tmp_path / "mixed.rnx"
    p.write_text(txt)
    back = read_rinex_nav_mixed(str(p))
    bg, be, bc, br = back["G"][7], back["E"][11], back["C"][6], back["R"][5]
    for f in ("sqrt_a", "e", "m0", "omega0", "i0", "omega", "delta_n",
              "omega_dot", "idot", "af0", "af1", "toe"):
        assert getattr(bg, f) == pytest.approx(getattr(g, f), rel=1e-11), f
        assert getattr(be, f) == pytest.approx(getattr(e, f), rel=1e-11), f
        assert getattr(bc, f) == pytest.approx(getattr(c, f), rel=1e-11), f
    assert bg.week == g.week and bg.iodc == g.iodc and bg.tgd == g.tgd
    assert be.iod_nav == 37 and be.wn == e.wn
    assert bc.week == c.week and bc.sat_h1 == c.sat_h1
    for f in ("tb_s", "tk_s", "x_km", "vy_kms", "az_kms2", "tau_n_s",
              "gamma_n", "nt_days", "freq_channel"):
        assert getattr(br, f) == pytest.approx(getattr(r, f), rel=1e-9), f


def test_rinex_obs_multisystem_header_and_epoch():
    from gnss_sdr_1_tpu.pvt import printers

    hdr = printers.rinex_obs_header(
        signals=("1C", "1B", "B1", "1G"),
        glonass_slots={1: -2, 2: 3})
    assert "G  " in hdr and "E  " in hdr and "C  " in hdr and "R  " in hdr
    assert "C2I L2I D2I S2I" in hdr
    assert "GLONASS SLOT / FRQ #" in hdr and "R01 -2" in hdr
    ep = printers.rinex_obs_epoch(
        2240, 345601.0,
        {("1C", 7): {"pseudorange_m": 2.1e7},
         ("1B", 11): {"pseudorange_m": 2.4e7},
         ("1G", 5): {"pseudorange_m": 1.9e7}})
    assert "G07" in ep and "E11" in ep and "R05" in ep


def test_rinex_v2_obs_and_nav():
    """RINEX 2.11 writers (PVT.rinex_version=2; rinex_printer.cc d_version==2
    branches): shared # / TYPES OF OBSERV list, yy epoch line with the A1I2
    satellite roster, GPS-only N: GPS NAV DATA records."""
    from gnss_sdr_1_tpu.pvt import printers

    hdr = printers.rinex_obs_header(signals=("1C", "2S", "L5"), version=2)
    assert "2.11" in hdr and "M (MIXED)" in hdr
    assert "# / TYPES OF OBSERV" in hdr
    line = next(l for l in hdr.splitlines() if "TYPES OF OBSERV" in l)
    # one shared list: C1 L1 D1 S1 C2 L2 D2 S2 C5 is 9 codes -> count field 12
    assert line[:6] == f"{12:6d}"
    assert "SYS / # / OBS TYPES" not in hdr

    ep = printers.rinex_obs_epoch(
        2240, 345601.0,
        {("1C", 7): {"pseudorange_m": 2.1e7, "cn0_dbhz": 44.0},
         ("1C", 11): {"pseudorange_m": 2.4e7}}, version=2)
    lines = ep.splitlines()
    # 2-digit year, flag 0, 2 sats, roster on the epoch line
    assert lines[0].endswith("G07G11") and "  0  2" in lines[0]
    assert len(lines) == 3 and lines[1].startswith(f"{2.1e7:14.3f}")

    eph = make_test_ephemeris(3, toe=345600.0)
    rec = printers.rinex_nav_record(eph, version=2)
    lines = rec.splitlines()
    assert lines[0].startswith(" 3 ") and len(lines) == 8
    # continuation rows are 3X + 4 D19.12 fields (79 chars)
    assert all(l.startswith("   ") and len(l) == 79 for l in lines[1:])
    navh = printers.rinex_nav_header(version=2)
    assert "N: GPS NAV DATA" in navh and "2.11" in navh

    # GLONASS has its own 2.11 nav file type ('G: GLONASS NAV DATA',
    # rinex_printer.cc version-2 GLONASS branch); Galileo does not
    from gnss_sdr_1_tpu.telemetry.gnav import GlonassEphemeris
    glo = GlonassEphemeris(slot=5, freq_channel=-3, tb_s=11700.0)
    grec = printers.rinex_nav_record(glo, version=2)
    glines = grec.splitlines()
    assert glines[0].startswith(" 5 ") and len(glines) == 4
    assert all(l.startswith("   ") and len(l) == 79 for l in glines[1:])
    gh = printers.rinex_nav_header(version=2, system="R")
    assert "G: GLONASS NAV DATA" in gh and "2.11" in gh

    from gnss_sdr_1_tpu.telemetry.inav import GalileoEphemeris
    gal = GalileoEphemeris(prn=11)
    with pytest.raises(ValueError):
        printers.rinex_nav_record(gal, version=2)


def test_rinex_header_time_first_obs_interval_and_v2_slot_gate():
    """TIME OF FIRST OBS / INTERVAL records (rinex_printer.cc:4306,4325)
    and the version-3-only GLONASS SLOT / FRQ # gate (:4329)."""
    import datetime

    from gnss_sdr_1_tpu.pvt import printers

    t0 = datetime.datetime(2022, 12, 15, 0, 0, 1, 500000,
                           tzinfo=datetime.timezone.utc)
    for ver in (2, 3):
        hdr = printers.rinex_obs_header(
            signals=("1C",), version=ver, time_first_obs=t0, interval_s=0.02,
            glonass_slots={1: -2})
        tfo = next(l for l in hdr.splitlines() if "TIME OF FIRST OBS" in l)
        # 5I6 + F13.7 + 5X + A3 per the spec table
        assert tfo[:6] == f"{2022:6d}" and tfo[30:43] == f"{1.5:13.7f}"
        assert tfo[48:51] == "GPS"
        itv = next(l for l in hdr.splitlines() if l[60:].startswith("INTERVAL"))
        assert itv[:10] == f"{0.02:10.3f}"
        if ver == 2:
            assert "GLONASS SLOT / FRQ #" not in hdr
        else:
            assert "GLONASS SLOT / FRQ #" in hdr


def test_rinex_v2_multisignal_column_alignment():
    """2.11 multi-signal files: observation columns follow the declared
    # / TYPES OF OBSERV order, blank 16-char fields for observables a
    satellite lacks, 5 observations per line, SSI carries the quantized
    C/N0 digit (rinex_printer.cc v2 obs lines)."""
    from gnss_sdr_1_tpu.pvt import printers

    sigs = ("1C", "2S", "L5")
    declared = printers._v2_obs_types(sigs)     # 12 codes -> 3 lines/sat
    assert len(declared) == 12
    ep = printers.rinex_obs_epoch(
        2240, 345601.0,
        {("1C", 7): {"pseudorange_m": 2.1e7, "carrier_phase_cycles": 1e5,
                     "doppler_hz": 1000.0, "cn0_dbhz": 44.0},
         ("2S", 7): {"pseudorange_m": 2.1e7 + 3.0, "cn0_dbhz": 38.0}},
        version=2, signals=sigs)
    lines = ep.splitlines()
    # one satellite G07 (1C+2S merge), 12 declared fields -> 3 obs lines
    assert lines[0].endswith("G07") and len(lines) == 4
    # line 1: C1 L1 D1 S1 C2 -> positions 0-4; C1 SSI digit = floor(44/6)=7
    assert lines[1][:14] == f"{2.1e7:14.3f}" and lines[1][15] == "7"
    c2 = lines[1][64:78]
    assert c2 == f"{2.1e7 + 3.0:14.3f}"
    # line 2: L2(blank) D2(blank) S2 C5(blank) L5(blank): S2 at position 2
    assert lines[2][:32].strip() == ""
    assert lines[2][32:46] == f"{38.0:14.3f}"
    # line 3: D5(blank) S5(blank) -> fully blank, rstripped to empty
    assert lines[3].strip() == ""


def test_nmea_gsa_gsv():
    """GPGSA/GPGSV sentences (nmea_printer.cc:205-219)."""
    from gnss_sdr_1_tpu.pvt import printers

    sol = PvtSolution(
        valid=True, rx_ecef_m=np.zeros(3), rx_clock_bias_s=0.0,
        rx_vel_ecef_ms=np.zeros(3), rx_clock_drift_s_s=0.0,
        rx_time_tow_s=1.0, dops={"pdop": 1.8, "hdop": 1.0, "vdop": 1.5},
        n_sats=5)
    gsa = printers.nmea_gsa(sol, [3, 7, 11, 19, 28])
    assert gsa.startswith("$GPGSA,A,3,03,07,11,19,28,")
    assert ",1.8,1.0,1.5*" in gsa
    body = gsa[1:gsa.index("*")]
    assert gsa.endswith(printers._nmea_checksum(body))

    sats = [(3, 45.2, 120.0, 44.0), (7, 12.0, 300.0, 38.0),
            (11, 80.0, 10.0, 47.0), (19, 30.0, 200.0, 41.0),
            (28, 5.0, 90.0, 33.0)]
    gsv = printers.nmea_gsv(sats)
    assert len(gsv) == 2
    assert gsv[0].startswith("$GPGSV,2,1,05,03,45,120,44,")
    assert gsv[1].startswith("$GPGSV,2,2,05,28,05,090,33*")


def test_analyze_dumps_tool(tmp_path):
    """tools/analyze_dumps.py — the reference src/utils/matlab script role
    (dll_pll_veml_plot_sample.m / plot_acq_grid.m / pvt plot): reads this
    framework's dumps and reports sane statistics."""
    import json
    import subprocess
    import sys

    import numpy as np

    root = pathlib.Path(__file__).resolve().parent.parent
    rng = np.random.default_rng(3)
    n = 400
    bits = np.repeat(rng.choice([-1, 1], size=n // 20), 20)
    d = {
        "start_sample": np.arange(n) * 4092.0,
        "cur_len": np.full(n, 4092.0),
        "prompt_i": 800 * bits + rng.normal(0, 40, n),
        "prompt_q": rng.normal(0, 40, n),
        "early_i": 400 * bits, "early_q": np.zeros(n),
        "late_i": 400 * bits, "late_q": np.zeros(n),
        "carrier_doppler_hz": 500 + rng.normal(0, 1, n),
        "code_freq_delta": rng.normal(0, 0.01, n),
        "rem_code_phase_samples": rng.uniform(0, 1, n),
        "cn0_dbhz": 45 + rng.normal(0, 0.3, n),
    }
    f = tmp_path / "tracking_ch_prn01.npz"
    np.savez_compressed(f, **d)
    out = subprocess.run(
        [sys.executable, str(root / "tools" / "analyze_dumps.py"),
         "tracking", str(f)], capture_output=True, text=True, check=True)
    stats = json.loads(out.stdout)
    assert stats["epochs"] == n
    assert abs(stats["doppler_hz_mean"] - 500) < 2
    assert stats["iq_power_ratio_db"] > 15   # locked Costas: power in I

    g = rng.random((1, 5, 64))
    g[0, 2, 30] = 50.0
    fa = tmp_path / "acq.npz"
    np.savez_compressed(fa, grid=g, prns=[9],
                        doppler_bins_hz=np.linspace(-1e3, 1e3, 5),
                        fs_hz=4e6, test_stats=0)
    out = subprocess.run(
        [sys.executable, str(root / "tools" / "analyze_dumps.py"),
         "acquisition", str(fa)], capture_output=True, text=True, check=True)
    acq = json.loads(out.stdout)
    assert acq["channels"][0]["delay_bin"] == 30
    assert acq["channels"][0]["peak_ratio"] > 10
