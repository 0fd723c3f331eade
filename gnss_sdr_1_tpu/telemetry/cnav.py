"""GPS CNAV (L2C / L5) message layer: FEC framing, CRC, TOW (IS-GPS-200/705).

Reference parity: gps_l2c_telemetry_decoder_gs.cc / gps_l5_telemetry_decoder
_gs.cc + libswiftcnav cnav_msg.c: symbols are rate-1/2 K=7 convolutionally
encoded; the decoder runs soft-decision Viterbi (utils.native), then hunts
for 300-bit messages [preamble(8) prn(6) type(6) tow(17) alert(1)
payload(238) crc24q(24)] in both polarities and both symbol phases.

Round-1 scope: framing + CRC + TOW + raw payload capture (message types
10/11/30-37 field extraction lands with the CNAV ephemeris model in a later
round); TOW alone already drives observables for L2C/L5 channels.
"""

from __future__ import annotations

import numpy as np

from ..utils.native import crc24q, viterbi27

CNAV_PREAMBLE = np.array([1, 0, 0, 0, 1, 0, 1, 1], dtype=np.int64)
CNAV_MSG_BITS = 300


def _bits_to_bytes(bits: np.ndarray) -> bytes:
    pad = (-len(bits)) % 8
    b = np.concatenate([bits, np.zeros(pad, dtype=bits.dtype)])
    return np.packbits(b.astype(np.uint8)).tobytes()


def crc_check(msg300: np.ndarray) -> bool:
    """CRC-24Q over the first 276 bits must equal the last 24."""
    data = msg300[:276]
    want = 0
    for b in msg300[276:]:
        want = (want << 1) | int(b)
    return crc24q(_bits_to_bytes(data)) == want


class CnavMessage:
    def __init__(self, bits300: np.ndarray):
        b = bits300

        def u(lo, hi):
            v = 0
            for x in b[lo:hi]:
                v = (v << 1) | int(x)
            return v

        self.prn = u(8, 14)
        self.msg_type = u(14, 20)
        self.tow_next_s = u(20, 37) * 6.0
        self.alert = u(37, 38)
        self.payload = np.array(b[38:276], dtype=np.int64)


class CnavDecoder:
    """Per-channel CNAV stream decoder.

    Feed one soft symbol per tracking epoch (L2CM: 20 ms epochs = 50 sps).
    The Viterbi runs over the accumulated stream; messages are hunted at
    every 300-bit offset by preamble + CRC.
    """

    def __init__(self, prn: int = 0):
        self.prn = prn
        self._soft: list[int] = []
        self.messages: list[CnavMessage] = []
        self.frame_sync = False
        self._sym_offset: int | None = None  # symbol index of first message
        self._tow_symbol: int | None = None
        self._tow_s: float | None = None
        self._decoded_until = 0

    def push(self, prompt_i: np.ndarray) -> None:
        """prompt_i: correlator outputs, one per symbol (sign = symbol)."""
        p = np.asarray(prompt_i, dtype=np.float64)
        scale = np.median(np.abs(p)) or 1.0
        soft = np.clip(128 + 127 * (p / (3 * scale)), 0, 255).astype(np.uint8)
        self._soft.extend(soft)
        self._process()

    def tow_at_symbol(self, symbol_idx: int) -> float | None:
        if self._tow_s is None:
            return None
        return self._tow_s + 0.02 * (symbol_idx - self._tow_symbol)

    def _process(self) -> None:
        n = len(self._soft)
        if n < 2 * CNAV_MSG_BITS + 64 or n - self._decoded_until < 600:
            return
        soft = np.asarray(self._soft, dtype=np.uint8)
        for phase in (0, 1):
            for pol in (1, -1):
                s = soft[phase:]
                s = s[: (len(s) // 2) * 2]
                if pol < 0:
                    s = 255 - s
                bits, _ = viterbi27(s)
                if self._hunt(bits, phase):
                    self._decoded_until = n
                    return
        self._decoded_until = n

    def _hunt(self, bits: np.ndarray, phase: int) -> bool:
        found = False
        i = 0
        while i + CNAV_MSG_BITS <= len(bits):
            w = bits[i : i + 8]
            if np.array_equal(w, CNAV_PREAMBLE) and crc_check(
                    bits[i : i + CNAV_MSG_BITS]):
                msg = CnavMessage(bits[i : i + CNAV_MSG_BITS])
                self.messages.append(msg)
                self.frame_sync = True
                # bit k decoded from symbols [phase + 2k, phase + 2k + 1];
                # next message starts at bit i + 300
                self._tow_symbol = phase + 2 * (i + CNAV_MSG_BITS)
                self._tow_s = msg.tow_next_s
                found = True
                i += CNAV_MSG_BITS
            else:
                i += 1
        return found
