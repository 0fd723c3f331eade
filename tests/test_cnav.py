"""CNAV framing tests: encode a message stream (FEC + CRC), decode through
the CnavDecoder with noise, polarity inversion and symbol-phase offset."""

import numpy as np

from gnss_sdr_1_tpu.telemetry.cnav import (
    CNAV_PREAMBLE,
    CnavDecoder,
    crc_check,
)
from gnss_sdr_1_tpu.utils.native import G1_POLY, G2_POLY, crc24q


def _make_message(prn: int, msg_type: int, tow_next_s: float) -> np.ndarray:
    bits = np.zeros(300, dtype=np.int64)
    bits[:8] = CNAV_PREAMBLE

    def put(lo, hi, v):
        for k in range(hi - lo):
            bits[hi - 1 - k] = (v >> k) & 1

    put(8, 14, prn)
    put(14, 20, msg_type)
    put(20, 37, int(tow_next_s / 6.0))
    rng = np.random.default_rng(prn * 100 + msg_type)
    bits[38:276] = rng.integers(0, 2, 238)
    data = bits[:276]
    pad = (-len(data)) % 8
    by = np.packbits(np.concatenate([data, np.zeros(pad, np.int64)]).astype(np.uint8))
    crc = crc24q(by.tobytes())
    put(276, 300, crc)
    return bits


def _encode_fec(bits: np.ndarray) -> np.ndarray:
    reg = 0
    syms = []
    for b in bits:
        reg = (int(b) << 6) | (reg >> 1)
        syms.append(bin(reg & G1_POLY).count("1") & 1)
        syms.append(bin(reg & G2_POLY).count("1") & 1)
    return np.asarray(syms, dtype=np.int64)


def test_crc_roundtrip():
    m = _make_message(7, 10, 345612.0)
    assert crc_check(m)
    m[50] ^= 1
    assert not crc_check(m)


def test_decoder_end_to_end():
    msgs = [_make_message(7, t, 345600.0 + 12.0 * (k + 1))
            for k, t in enumerate((10, 11, 30))]
    bits = np.concatenate([np.zeros(40, dtype=np.int64)] + list(msgs))
    syms = _encode_fec(bits)
    # symbols -> prompt amplitudes with noise, inverted polarity, phase slip
    rng = np.random.default_rng(0)
    amp = (1.0 - 2.0 * syms) * -300.0
    amp = amp + rng.standard_normal(len(amp)) * 60.0
    amp = np.concatenate([[250.0], amp])     # one stray leading symbol
    dec = CnavDecoder(prn=7)
    for i in range(0, len(amp), 120):
        dec.push(amp[i : i + 120])
    assert dec.frame_sync
    types = [m.msg_type for m in dec.messages]
    assert 10 in types and 11 in types
    m0 = dec.messages[0]
    assert m0.prn == 7
    assert m0.tow_next_s in (345612.0, 345624.0, 345636.0)
    # TOW propagation: 20 ms per symbol
    t_a = dec.tow_at_symbol(1000)
    t_b = dec.tow_at_symbol(1250)
    assert abs((t_b - t_a) - 5.0) < 1e-9
