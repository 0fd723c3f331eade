"""SBAS L1 message layer (RTCA DO-229, 250 bps).

Reference parity: sbas_l1_telemetry_decoder_gs.cc (symbol alignment,
K=7 r=1/2 Viterbi, 250-bit block sync on the three rotating preambles,
CRC-24Q).  Message type 9 (GEO navigation) is parsed into an ECEF
position/velocity/acceleration record; other types are captured raw.

The SBAS L1 signal reuses the GPS C/A structure (PRN 120-158); symbols are
2 ms (500 sps), blocks are 1 s / 250 bits:
  preamble(8, cycling 01010011 / 10011010 / 11000110) + MT(6) +
  payload(212) + CRC-24Q(24) over the first 226 bits.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.native import crc24q, viterbi27
from .inav import _get, _put

SBAS_BLOCK_BITS = 250
SBAS_PREAMBLES = (0b01010011, 0b10011010, 0b11000110)


def _bits_to_bytes(bits: np.ndarray) -> bytes:
    pad = (-len(bits)) % 8
    b = np.concatenate([bits, np.zeros(pad, dtype=bits.dtype)])
    return np.packbits(b.astype(np.uint8)).tobytes()


def crc_check(block250: np.ndarray) -> bool:
    return crc24q(_bits_to_bytes(block250[:226])) == _get(block250, 226, 24)


@dataclasses.dataclass
class SbasGeoNav:
    """MT9 GEO navigation message (DO-229 A.4.4.11)."""

    iodn: int = 0
    t0: float = 0.0            # s, LSB 16
    ura: int = 0
    pos_m: tuple = (0.0, 0.0, 0.0)
    vel_ms: tuple = (0.0, 0.0, 0.0)
    acc_ms2: tuple = (0.0, 0.0, 0.0)
    agf0: float = 0.0          # s, 2^-31
    agf1: float = 0.0          # s/s, 2^-40
    valid: bool = False

    def position_at(self, t: float) -> np.ndarray:
        """Quadratic GEO orbit extrapolation from t0 (DO-229 A.4.4.11)."""
        dt = t - self.t0
        p = np.asarray(self.pos_m)
        v = np.asarray(self.vel_ms)
        a = np.asarray(self.acc_ms2)
        return p + v * dt + 0.5 * a * dt * dt


# (offset-after-MT-field, width, signed, scale); payload starts at bit 14
_MT9_FIELDS = (
    ("iodn", 14, 8, False, 1.0),
    ("t0", 22, 13, False, 16.0),
    ("ura", 35, 4, False, 1.0),
    ("x", 39, 30, True, 0.08),
    ("y", 69, 30, True, 0.08),
    ("z", 99, 25, True, 0.4),
    ("xd", 124, 17, True, 0.000625),
    ("yd", 141, 17, True, 0.000625),
    ("zd", 158, 18, True, 0.004),
    ("xa", 176, 10, True, 0.0000125),
    ("ya", 186, 10, True, 0.0000125),
    ("za", 196, 10, True, 0.0000625),
    ("agf0", 206, 12, True, 2.0**-31),
    ("agf1", 218, 8, True, 2.0**-40),
)


def encode_mt9(nav: SbasGeoNav, preamble_idx: int = 0) -> np.ndarray:
    """Build one 250-bit MT9 block (test/siggen fixture)."""
    b = np.zeros(SBAS_BLOCK_BITS, dtype=np.int64)
    _put(b, 0, 8, SBAS_PREAMBLES[preamble_idx % 3])
    _put(b, 8, 6, 9)
    vals = {"iodn": nav.iodn, "t0": nav.t0, "ura": nav.ura,
            "x": nav.pos_m[0], "y": nav.pos_m[1], "z": nav.pos_m[2],
            "xd": nav.vel_ms[0], "yd": nav.vel_ms[1], "zd": nav.vel_ms[2],
            "xa": nav.acc_ms2[0], "ya": nav.acc_ms2[1], "za": nav.acc_ms2[2],
            "agf0": nav.agf0, "agf1": nav.agf1}
    for name, off, width, _sgn, scale in _MT9_FIELDS:
        _put(b, off, width, int(round(vals[name] / scale)))
    _put(b, 226, 24, crc24q(_bits_to_bytes(b[:226])))
    return b


def decode_mt9(block250: np.ndarray) -> SbasGeoNav:
    v = {}
    for name, off, width, signed, scale in _MT9_FIELDS:
        v[name] = _get(block250, off, width, signed=signed) * scale
    return SbasGeoNav(
        iodn=int(v["iodn"]), t0=v["t0"], ura=int(v["ura"]),
        pos_m=(v["x"], v["y"], v["z"]),
        vel_ms=(v["xd"], v["yd"], v["zd"]),
        acc_ms2=(v["xa"], v["ya"], v["za"]),
        agf0=v["agf0"], agf1=v["agf1"], valid=True)


@dataclasses.dataclass
class SbasMessage:
    msg_type: int
    bits: np.ndarray           # full 250-bit block


class SbasDecoder:
    """Per-channel SBAS L1 decoder over 500 sps soft symbols."""

    def __init__(self, prn: int = 0):
        self.prn = prn
        self._soft: list[int] = []
        self.messages: list[SbasMessage] = []
        self.geo_nav = SbasGeoNav()
        self.frame_sync = False
        self._decoded_until = 0

    def push(self, prompt_i) -> None:
        p = np.asarray(prompt_i, dtype=np.float64)
        scale = np.median(np.abs(p)) or 1.0
        soft = np.clip(128 + 127 * (p / (3 * scale)), 0, 255).astype(np.uint8)
        self._soft.extend(soft)
        self._process()

    def _process(self) -> None:
        n = len(self._soft)
        if n < 2 * SBAS_BLOCK_BITS + 64 or n - self._decoded_until < 500:
            return
        soft = np.asarray(self._soft, dtype=np.uint8)
        for phase in (0, 1):
            for pol in (1, -1):
                s = soft[phase:]
                s = s[: (len(s) // 2) * 2]
                if pol < 0:
                    s = 255 - s
                bits, _ = viterbi27(s)
                if self._hunt(bits):
                    self._decoded_until = n
                    return
        self._decoded_until = n

    def _hunt(self, bits: np.ndarray) -> bool:
        found = False
        i = 0
        while i + SBAS_BLOCK_BITS <= len(bits):
            pre = _get(bits, i, 8)
            if pre in SBAS_PREAMBLES and crc_check(
                    bits[i : i + SBAS_BLOCK_BITS]):
                block = bits[i : i + SBAS_BLOCK_BITS]
                mt = _get(block, 8, 6)
                self.messages.append(SbasMessage(mt, block.copy()))
                if mt == 9:
                    self.geo_nav = decode_mt9(block)
                self.frame_sync = True
                found = True
                i += SBAS_BLOCK_BITS
            else:
                i += 1
        return found
