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


def test_nsr_2bit_real_unpack():
    """NSR: 4 real 2-bit samples per byte, LSB pair first
    (unpack_byte_2bit_samples.cc:66-82)."""
    # byte 0b11100100 -> pairs LSB-first: 00, 01, 10, 11 -> 0, 1, -2, -1
    raw = np.array([0b11100100], dtype=np.uint8)
    x = convert_to_complex64(raw, FORMATS["nsr"])
    assert np.allclose(x.real, [0.0, 1.0, -2.0, -1.0])
    assert np.allclose(x.imag, 0.0)


def test_spir_1bit_unpack():
    """SPIR int32: channel-1 I/Q from bits 0/1, +-32767
    (unpack_intspir_1bit_samples.cc:60-81)."""
    raw = np.array([0b00, 0b01, 0b10, 0b11], dtype=np.int32)
    x = convert_to_complex64(raw, FORMATS["spir"])
    assert np.allclose(x.real, [-32767.0, 32767.0, -32767.0, 32767.0])
    assert np.allclose(x.imag, [-32767.0, -32767.0, 32767.0, 32767.0])


def test_spir_gss6450_word_order_and_sign():
    """GSS6450: samples packed LSB-first but emitted in reversed order
    within each int32 (unpack_spir_gss6450_samples.cc decode_4bits_word
    out[7-i]/out[3-i]); 2-bit and 4-bit two's-complement components."""
    # 2-bit: word with first extracted pair I=01(+1) Q=11(-1), all other
    # pairs zero -> that pair lands at output index 7
    w = np.array([0b1101], dtype=np.uint32)
    x = convert_to_complex64(w, FORMATS["spir_gss6450_2bit"])
    assert len(x) == 8
    assert x[7] == np.complex64(1.0 - 1.0j)
    assert np.allclose(x[:7], 0.0)
    # 4-bit: first byte I=0x9 (-7) Q=0x3 (+3) -> output index 3
    w = np.array([0x39], dtype=np.uint32)
    x = convert_to_complex64(w, FORMATS["spir_gss6450_4bit"])
    assert len(x) == 4
    assert x[3] == np.complex64(-7.0 + 3.0j)


def _labsat_header(bits_per_sample=2, channel_selector=1):
    hdr = bytearray(1024)
    hdr[8:11] = b"LS3"
    hdr[11] = 1                               # sub version
    struct.pack_into("<i", hdr, 12, 1024)     # header bytes
    struct.pack_into("<H", hdr, 16, 2)        # section id 2
    struct.pack_into("<i", hdr, 18, 32)       # section length
    hdr[22] = 2                               # ref clock: external 10 MHz
    hdr[23] = bits_per_sample
    hdr[24] = channel_selector
    hdr[25] = 1                               # quantization
    hdr[26] = 0                               # channel A: GPS
    hdr[27] = 1                               # channel B: GLONASS
    return bytes(hdr)


def test_labsat3_2bit_source(tmp_path):
    """LabSat3 single-channel 2-bit decode: 8 samples per int16, I/Q from
    bit pairs MSB-first, 0/1 -> -1/+1 (labsat23_source.cc
    decode_samples_one_channel type 2), multi-file sequences chained."""
    from gnss_sdr_1_tpu.io.labsat import LabsatSource

    # word 0b1000000000000011: sample0 I=1 Q=0 -> (+1,-1);
    # sample7 I=1 Q=1 -> (+1,+1); samples 1-6 -> (-1,-1)
    word = 0b1000000000000011
    f0 = tmp_path / "cap_0000.LS3"
    f0.write_bytes(_labsat_header(2) + struct.pack("<H", word))
    f1 = tmp_path / "cap_0001.LS3"
    f1.write_bytes(struct.pack("<H", word))
    src = LabsatSource(str(tmp_path / "cap"))
    assert src.header["version"] == 3
    assert src.header["constellation_a"] == "GPS"
    assert src.n_samples == 16                # 8 per word, 2 files
    x = src.read(0, 16)
    assert x[0] == np.complex64(1.0 - 1.0j)
    assert x[7] == np.complex64(1.0 + 1.0j)
    assert np.allclose(x[1:7], -1.0 - 1.0j)
    assert np.allclose(x[:8], x[8:])          # second file = same word
    # offset read across the file boundary
    assert np.allclose(src.read(6, 4), [x[6], x[7], x[0], x[1]])


def test_labsat3_4bit_decode():
    """4-bit component mapping 00->0.5, 01->1.5, 10->-1.5, 11->-0.5
    (decode_samples_one_channel type 4 incl. the +0.5 offset)."""
    from gnss_sdr_1_tpu.io.labsat import decode_labsat_words

    # sample 0 bit layout [I_hi Q_hi I_lo Q_lo] = bits 15..12
    # (In-Phase from bs[15]/bs[13], Quadrature from bs[14]/bs[12]):
    # I=01 (1) -> 1.5, Q=00 (0) -> 0.5
    w = np.array([0b0010_0000_0000_0000], dtype=np.int64)
    x = decode_labsat_words(w, 4)
    assert x[0] == np.complex64(1.5 + 0.5j)
    # I=11 -> -1+0.5, Q=10 -> -2+0.5
    w = np.array([0b1110_0000_0000_0000], dtype=np.int64)
    x = decode_labsat_words(w, 4)
    assert x[0] == np.complex64(-0.5 - 1.5j)


def test_labsat_dual_channel_rejected(tmp_path):
    from gnss_sdr_1_tpu.io.labsat import LabsatHeaderError, LabsatSource

    f0 = tmp_path / "dual_0000.LS3"
    f0.write_bytes(_labsat_header(2, channel_selector=0))
    import pytest

    with pytest.raises(LabsatHeaderError):
        LabsatSource(str(tmp_path / "dual"))
