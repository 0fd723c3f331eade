"""Signal-source breadth tests: packed 2/4-bit formats, UDP ingest,
rtl_tcp client (custom_udp_signal_source.h:67, rtl_tcp_signal_source.cc,
unpack_byte_2bit_cpx_samples.cc)."""

import socket
import struct
import threading

import numpy as np

from gnss_sdr_1_tpu.io.file_source import FileSignalSource
from gnss_sdr_1_tpu.io.formats import FORMATS, convert_to_complex64
from gnss_sdr_1_tpu.io.network import (RTLTCP_SET_FREQUENCY,
                                       RtlTcpSignalSource, UdpSignalSource)


def test_2bit_cpx_unpack_semantics(tmp_path):
    """1 byte = 2 complex samples, MS nibble first, nibble = Q1 Q0 I1 I0,
    signed 2-bit fields (unpack_byte_2bit_cpx_samples.cc:75-95)."""
    # nibble 0b0111: Q=0b01=+1, I=0b11=-1 ; nibble 0b1000: Q=0b10=-2, I=0
    b = np.array([0b0111_1000, 0b0001_0010], dtype=np.uint8)
    x = convert_to_complex64(b, FORMATS["2bits_cpx"])
    np.testing.assert_array_equal(
        x, np.array([-1 + 1j, 0 - 2j, 1 + 0j, -2 + 0j], dtype=np.complex64))
    # through the file source, including odd offsets across byte boundaries
    p = tmp_path / "p.2bit"
    p.write_bytes(b.tobytes())
    src = FileSignalSource(str(p), item_type="2bits_cpx")
    assert src.n_samples == 4
    np.testing.assert_array_equal(src.read(0, 4), x)
    np.testing.assert_array_equal(src.read(1, 2), x[1:3])


def test_4bit_cpx_unpack_semantics():
    # byte 0xF1: Q=0xF=-1, I=0x1=+1 ; byte 0x78: Q=0x7=+7, I=0x8=-8
    b = np.array([0xF1, 0x78], dtype=np.uint8)
    x = convert_to_complex64(b, FORMATS["4bits_cpx"])
    np.testing.assert_array_equal(
        x, np.array([1 - 1j, -8 + 7j], dtype=np.complex64))


def test_udp_signal_source_roundtrip():
    src = UdpSignalSource(port=0, item_type="ishort", timeout_s=3.0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    want = (np.arange(600) - 300).astype(np.int16)
    # three datagrams, one with an odd split across a sample boundary
    payload = want.tobytes()
    for seg in (payload[:400], payload[400:402], payload[402:]):
        tx.sendto(seg, ("127.0.0.1", src.port))
    x = src.read(300)
    assert len(x) == 300
    np.testing.assert_array_equal(x.real.astype(np.int16), want[0::2])
    np.testing.assert_array_equal(x.imag.astype(np.int16), want[1::2])
    src.close()
    tx.close()


def test_rtl_tcp_client_protocol():
    """Mock rtl_tcp server: header handshake, command reception, stream
    conversion (uint8 centered on 127.5)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    got_cmds = []

    def serve():
        conn, _ = srv.accept()
        conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
        # read the 3 config commands (5 bytes each)
        for _ in range(3):
            got_cmds.append(struct.unpack(">BI", conn.recv(5)))
        iq = np.array([127, 127, 255, 0, 0, 255], dtype=np.uint8)
        conn.sendall(iq.tobytes())
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    cli = RtlTcpSignalSource(port=port, frequency_hz=1575.42e6,
                             sample_rate_hz=2.048e6)
    assert cli.tuner_type == 5 and cli.tuner_gain_count == 29
    x = cli.read(3)
    t.join(timeout=5)
    assert (RTLTCP_SET_FREQUENCY, 1575420000) in got_cmds
    np.testing.assert_allclose(
        x, [-0.5 - 0.5j, 127.5 - 127.5j, -127.5 + 127.5j])
    cli.close()
    srv.close()
