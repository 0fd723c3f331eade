"""Galileo E1B I/NAV message layer (Galileo OS SIS ICD, sec 4.3.5).

Reference parity: galileo_telemetry_decoder_gs.cc (page sync, 8x30 block
deinterleaver, Viterbi with inverted G2 branch, CRC) +
galileo_navigation_message.cc (word types 1-5 -> ephemeris/clock/GST).

E1B nominal page = two 1-second parts (even then odd), each 250 symbols:
10-symbol sync pattern + 240 FEC symbols = 120 bits (K=7 r=1/2, G2 branch
inverted per the Galileo convention) after the 8-row x 30-column block
deinterleaver.  A page carries a 128-bit word (data_1[112] in the even part,
data_2[16] in the odd) + OSNMA/SAR/spare + CRC-24Q over 196 bits.

The encoder exists for the test fixtures (the reference leans on gnss-sim);
the decoder is the product path.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.native import G1_POLY, G2_POLY, crc24q, viterbi27

INAV_SYNC = np.array([0, 1, 0, 1, 1, 0, 0, 0, 0, 0], dtype=np.int64)
PART_SYMBOLS = 250
DATA_SYMBOLS = 240
PART_BITS = 120


@dataclasses.dataclass
class GalileoEphemeris:
    """Subset of Galileo_Ephemeris (galileo_ephemeris.h)."""

    prn: int = 0
    iod_nav: int = 0
    toe: float = 0.0          # [s], LSB 60
    toc: float = 0.0
    m0: float = 0.0           # semicircles
    e: float = 0.0
    sqrt_a: float = 0.0
    omega0: float = 0.0
    i0: float = 0.0
    omega: float = 0.0
    omega_dot: float = 0.0    # semicircles/s
    idot: float = 0.0
    delta_n: float = 0.0
    cuc: float = 0.0
    cus: float = 0.0
    crc: float = 0.0
    crs: float = 0.0
    cic: float = 0.0
    cis: float = 0.0
    af0: float = 0.0
    af1: float = 0.0
    af2: float = 0.0
    wn: int = 0               # GST week
    tow: float = 0.0          # GST TOW from word 5


def _put(bits, lo, width, value):
    v = int(value) & ((1 << width) - 1)
    for k in range(width):
        bits[lo + width - 1 - k] = (v >> k) & 1


def _get(bits, lo, width, signed=False):
    v = 0
    for b in bits[lo : lo + width]:
        v = (v << 1) | int(b)
    if signed and v & (1 << (width - 1)):
        v -= 1 << width
    return v


def _q(value, scale):
    return int(round(value / (2.0 ** scale)))


def encode_word(wtype: int, eph: GalileoEphemeris) -> np.ndarray:
    """128-bit I/NAV word (types 1-5)."""
    b = np.zeros(128, dtype=np.int64)
    _put(b, 0, 6, wtype)
    if wtype == 1:
        _put(b, 6, 10, eph.iod_nav)
        _put(b, 16, 14, int(eph.toe / 60.0))
        _put(b, 30, 32, _q(eph.m0, -31))
        _put(b, 62, 32, _q(eph.e, -33))
        _put(b, 94, 32, _q(eph.sqrt_a, -19))
    elif wtype == 2:
        _put(b, 6, 10, eph.iod_nav)
        _put(b, 16, 32, _q(eph.omega0, -31))
        _put(b, 48, 32, _q(eph.i0, -31))
        _put(b, 80, 32, _q(eph.omega, -31))
        _put(b, 112, 14, _q(eph.idot, -43))
    elif wtype == 3:
        _put(b, 6, 10, eph.iod_nav)
        _put(b, 16, 24, _q(eph.omega_dot, -43))
        _put(b, 40, 16, _q(eph.delta_n, -43))
        _put(b, 56, 16, _q(eph.cuc, -29))
        _put(b, 72, 16, _q(eph.cus, -29))
        _put(b, 88, 16, _q(eph.crc, -5))
        _put(b, 104, 16, _q(eph.crs, -5))
        _put(b, 120, 8, 107)          # SISA
    elif wtype == 4:
        _put(b, 6, 10, eph.iod_nav)
        _put(b, 16, 6, eph.prn)
        _put(b, 22, 16, _q(eph.cic, -29))
        _put(b, 38, 16, _q(eph.cis, -29))
        _put(b, 54, 14, int(eph.toc / 60.0))
        _put(b, 68, 31, _q(eph.af0, -34))
        _put(b, 99, 21, _q(eph.af1, -46))
        _put(b, 120, 6, _q(eph.af2, -59))
    elif wtype == 5:
        # iono + BGD + health (zeros) then GST
        _put(b, 73, 12, eph.wn)
        _put(b, 85, 20, int(eph.tow))
    return b


def decode_word(b: np.ndarray, eph: GalileoEphemeris) -> int:
    """Parse a 128-bit word into `eph`; returns the word type."""
    wtype = _get(b, 0, 6)
    sc = 2.0
    if wtype == 1:
        eph.iod_nav = _get(b, 6, 10)
        eph.toe = _get(b, 16, 14) * 60.0
        eph.m0 = _get(b, 30, 32, signed=True) * 2.0**-31
        eph.e = _get(b, 62, 32) * 2.0**-33
        eph.sqrt_a = _get(b, 94, 32) * 2.0**-19
    elif wtype == 2:
        eph.iod_nav = _get(b, 6, 10)
        eph.omega0 = _get(b, 16, 32, signed=True) * 2.0**-31
        eph.i0 = _get(b, 48, 32, signed=True) * 2.0**-31
        eph.omega = _get(b, 80, 32, signed=True) * 2.0**-31
        eph.idot = _get(b, 112, 14, signed=True) * 2.0**-43
    elif wtype == 3:
        eph.iod_nav = _get(b, 6, 10)
        eph.omega_dot = _get(b, 16, 24, signed=True) * 2.0**-43
        eph.delta_n = _get(b, 40, 16, signed=True) * 2.0**-43
        eph.cuc = _get(b, 56, 16, signed=True) * 2.0**-29
        eph.cus = _get(b, 72, 16, signed=True) * 2.0**-29
        eph.crc = _get(b, 88, 16, signed=True) * 2.0**-5
        eph.crs = _get(b, 104, 16, signed=True) * 2.0**-5
    elif wtype == 4:
        eph.iod_nav = _get(b, 6, 10)
        eph.prn = _get(b, 16, 6)
        eph.cic = _get(b, 22, 16, signed=True) * 2.0**-29
        eph.cis = _get(b, 38, 16, signed=True) * 2.0**-29
        eph.toc = _get(b, 54, 14) * 60.0
        eph.af0 = _get(b, 68, 31, signed=True) * 2.0**-34
        eph.af1 = _get(b, 99, 21, signed=True) * 2.0**-46
        eph.af2 = _get(b, 120, 6, signed=True) * 2.0**-59
    elif wtype == 5:
        eph.wn = _get(b, 73, 12)
        eph.tow = float(_get(b, 85, 20))
    return wtype


# ---------------- page <-> symbol layer ----------------

def _fec_encode(bits120: np.ndarray) -> np.ndarray:
    """K=7 r=1/2 with the Galileo inverted G2 branch."""
    reg = 0
    syms = np.empty(2 * len(bits120), dtype=np.int64)
    for i, bit in enumerate(bits120):
        reg = (int(bit) << 6) | (reg >> 1)
        syms[2 * i] = bin(reg & G1_POLY).count("1") & 1
        syms[2 * i + 1] = 1 - (bin(reg & G2_POLY).count("1") & 1)
    return syms


def _interleave(syms240: np.ndarray) -> np.ndarray:
    """Write row-wise into 8 rows x 30 cols, read column-wise (ICD block
    interleaver; the receiver reverses it)."""
    return syms240.reshape(8, 30).T.reshape(-1)


def _deinterleave(syms240: np.ndarray) -> np.ndarray:
    return syms240.reshape(30, 8).T.reshape(-1)


def encode_page(word128: np.ndarray, seq_crc_fill: int = 0) -> np.ndarray:
    """One nominal page -> 500 symbols (even part + odd part, incl. sync)."""
    even = np.zeros(PART_BITS, dtype=np.int64)
    odd = np.zeros(PART_BITS, dtype=np.int64)
    even[0] = 0                       # even/odd
    even[1] = 0                       # page type nominal
    even[2:114] = word128[:112]       # data_1
    # tail bits 114..119 zeros
    odd[0] = 1
    odd[1] = 0
    odd[2:18] = word128[112:128]      # data_2
    # osnma(40)+sar(22)+spare(2) = zeros at 18..82
    # CRC over even[0:114] + odd[0:82] = 196 bits
    crc_in = np.concatenate([even[:114], odd[:82]])
    pad = (-len(crc_in)) % 8
    by = np.packbits(np.concatenate(
        [crc_in, np.zeros(pad, np.int64)]).astype(np.uint8)).tobytes()
    crc = crc24q(by)
    _put(odd, 82, 24, crc)
    # ssp/reserved 106..113 zeros, tail 114..119 zeros
    parts = []
    for part in (even, odd):
        syms = _interleave(_fec_encode(part))
        parts.append(np.concatenate([INAV_SYNC, syms]))
    return np.concatenate(parts)


def check_page_crc(even: np.ndarray, odd: np.ndarray) -> bool:
    crc_in = np.concatenate([even[:114], odd[:82]])
    pad = (-len(crc_in)) % 8
    by = np.packbits(np.concatenate(
        [crc_in, np.zeros(pad, np.int64)]).astype(np.uint8)).tobytes()
    return crc24q(by) == _get(odd, 82, 24)


def decode_part(syms240: np.ndarray) -> np.ndarray:
    """240 soft symbols (uint8) -> 120 bits (deinterleave + Viterbi with the
    G2 branch un-inverted)."""
    s = np.asarray(_deinterleave(np.asarray(syms240)), dtype=np.int64)
    s = s.copy()
    s[1::2] = 255 - s[1::2]          # undo the inverted branch
    bits, _ = viterbi27(s.astype(np.uint8))
    return bits.astype(np.int64)


def to_keplerian(geph: GalileoEphemeris):
    """GalileoEphemeris -> the GPS-style Keplerian record used by
    pvt.ephemeris (Galileo broadcasts the same parameterization; GM/omega_e
    differences are at the 1e-9 relative level of the shared WGS/GTRF
    constants)."""
    from .lnav import GpsEphemeris

    return GpsEphemeris(
        prn=geph.prn, week=geph.wn,
        toc=geph.toc, toe=geph.toe,
        af0=geph.af0, af1=geph.af1, af2=geph.af2, tgd=0.0,
        iodc=geph.iod_nav, iode=geph.iod_nav,
        sqrt_a=geph.sqrt_a, e=geph.e, m0=geph.m0,
        delta_n=geph.delta_n, omega0=geph.omega0, i0=geph.i0,
        omega=geph.omega, omega_dot=geph.omega_dot, idot=geph.idot,
        cuc=geph.cuc, cus=geph.cus, crc=geph.crc, crs=geph.crs,
        cic=geph.cic, cis=geph.cis,
    )


class InavDecoder:
    """Per-channel E1B I/NAV decoder: one prompt per 4 ms epoch = 1 symbol."""

    def __init__(self, prn: int = 0):
        self.prn = prn
        self._soft: list[float] = []
        self.ephemeris = GalileoEphemeris(prn=prn)
        self.words: set[int] = set()
        self.page_sync = False
        self._sync_offset: int | None = None
        self._polarity = 1.0
        self._tow_symbol: int | None = None
        self._tow_s: float | None = None
        self._decoded_until = 0

    @property
    def ephemeris_complete(self) -> bool:
        return {1, 2, 3, 4}.issubset(self.words)

    def tow_at_symbol(self, symbol_idx: int) -> float | None:
        if self._tow_s is None:
            return None
        return self._tow_s + 0.004 * (symbol_idx - self._tow_symbol)

    def push(self, prompt_i) -> None:
        self._soft.extend(np.asarray(prompt_i, dtype=np.float64))
        if not self.page_sync:
            self._find_sync()
        if self.page_sync:
            self._decode_pages()

    def _find_sync(self) -> None:
        s = np.sign(np.asarray(self._soft))
        if len(s) < 2 * PART_SYMBOLS + 10:
            return
        pat = 1.0 - 2.0 * INAV_SYNC
        for pol in (1.0, -1.0):
            c = np.correlate(pol * s, pat, mode="valid")
            hits = np.nonzero(c == 10.0)[0]
            for h in hits:
                later = hits[(hits > h) & ((hits - h) % PART_SYMBOLS == 0)]
                if len(later) >= 2:
                    self.page_sync = True
                    self._sync_offset = int(h)
                    self._polarity = pol
                    self._decoded_until = int(h)
                    return

    def _decode_pages(self) -> None:
        soft = np.asarray(self._soft)
        while len(soft) >= self._decoded_until + 2 * PART_SYMBOLS:
            i = self._decoded_until
            parts = []
            ok = True
            for k in range(2):
                seg = soft[i + k * PART_SYMBOLS : i + (k + 1) * PART_SYMBOLS]
                observed = ((self._polarity * seg[:10]) < 0).astype(np.int64)
                if not np.array_equal(observed, INAV_SYNC):
                    ok = False
                    break
                scale = np.median(np.abs(seg)) or 1.0
                s = np.clip(128 - 127 * (self._polarity * seg[10:]) / (3 * scale),
                            0, 255)
                parts.append(decode_part(s.astype(np.uint8)))
            if not ok:
                # lost page lock: re-search
                self.page_sync = False
                self._find_sync()
                if not self.page_sync:
                    return
                continue
            even, odd = parts
            if even[0] == 1 and odd[0] == 0:
                even, odd = odd, even
            if check_page_crc(even, odd):
                word = np.concatenate([even[2:114], odd[2:18]])
                wtype = decode_word(word, self.ephemeris)
                self.words.add(wtype)
                if wtype == 5 and self.ephemeris.tow > 0:
                    # GST TOW corresponds to the START of this page's even
                    # part (our encoder convention; anchors the symbol clock)
                    self._tow_symbol = i
                    self._tow_s = self.ephemeris.tow
            self._decoded_until += 2 * PART_SYMBOLS
