"""TCP-connector tracking (track/tcp_connector.py): loop closure in an
external process over TCP — the reference's gps_l1_ca_tcp_connector_
tracking_cc + tcp_communication pair (loop filters in MATLAB/Simulink;
SURVEY §2.7), VERDICT r4's last 'no' component."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.codes import gps_l1ca_code
from gnss_sdr_1_tpu.constants import GPS_L1_CA
from gnss_sdr_1_tpu.siggen.generator import SatParams, generate_baseband
from gnss_sdr_1_tpu.track.tcp_connector import (LoopClosureServer,
                                                TcpConnectorTracking,
                                                TcpTrackConfig)


def test_tcp_connector_closes_the_loop_externally():
    fs = 2.046e6
    true_dop = 820.0
    x = generate_baseband(
        GPS_L1_CA,
        [SatParams(prn=3, doppler_hz=true_dop, delay_chips=257.3,
                   cn0_dbhz=50.0)],
        {3: gps_l1ca_code(3)}, fs, 1.2, noise=True, seed=2)
    srv = LoopClosureServer(pll_bw_hz=20.0, dll_bw_hz=2.0,
                            seed_doppler_hz=800.0)
    trk = TcpConnectorTracking(
        TcpTrackConfig(fs, 1023, 1.023e6, 1575.42e6),
        gps_l1ca_code(3), "127.0.0.1", srv.port)
    trk.seed(257.3 / 1.023e6 * fs, 800.0)
    try:
        rows = trk.track(x, 1000)
    finally:
        trk.close()
        srv.close()
    assert len(rows) >= 900
    tail = np.array([r["doppler_hz"] for r in rows[-100:]])
    # the EXTERNAL controller pulled the 20 Hz seed error in
    assert abs(tail.mean() - true_dop) < 3.0, tail.mean()
    # prompt power coherent at the end (code loop also closed)
    p_tail = np.array([abs(r["prompt"]) for r in rows[-100:]])
    p_head = np.array([abs(r["prompt"]) for r in rows[:50]])
    assert p_tail.mean() > 0.7 * p_head.mean()


def test_factory_routes_tcp_connector():
    from gnss_sdr_1_tpu.runtime.factory import resolve

    info = resolve("GPS_L1_CA_TCP_CONNECTOR_Tracking")
    assert info.status == "native"
    assert info.strategy == "tcp_connector"
