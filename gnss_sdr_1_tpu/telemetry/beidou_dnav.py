"""BeiDou B1I/B3I D1 NAV message layer (BeiDou ICD v3.0, sec 5.2).

Reference parity: beidou_b1i_telemetry_decoder_gs.cc +
beidou_dnav_navigation_message.cc: D1 NAV at 50 bps (NH20-wiped by
tracking), 300-bit subframes of ten 30-bit words protected by BCH(15,11,1)
pairs, bit-interleaved within each word (except the first 15 bits of word
1, which carry the preamble raw).

Round-1 scope: BCH codec with single-error correction, word interleaving,
frame sync, SOW/FraID extraction and raw word capture (full ephemeris field
extraction joins the BeiDou Keplerian model in a later round).
"""

from __future__ import annotations

import numpy as np

D1_PREAMBLE = np.array([1, 1, 1, 0, 0, 0, 1, 0, 0, 1, 0], dtype=np.int64)
SUBFRAME_BITS = 300

# BCH(15,11) generator x^4 + x + 1
_BCH_GEN = 0b10011


def bch1511_encode(data11: np.ndarray) -> np.ndarray:
    """11 data bits -> 15-bit systematic BCH codeword (data + 4 parity)."""
    reg = 0
    for b in data11:
        reg = (reg << 1) | int(b)
    reg <<= 4
    rem = reg
    for shift in range(14, 3, -1):
        if rem & (1 << shift):
            rem ^= _BCH_GEN << (shift - 4)
    cw = reg | rem
    return np.array([(cw >> (14 - k)) & 1 for k in range(15)], dtype=np.int64)


_SYNDROME_TO_POS: dict[int, int] | None = None


def _syndrome_table() -> dict[int, int]:
    global _SYNDROME_TO_POS
    if _SYNDROME_TO_POS is None:
        tab = {}
        for pos in range(15):
            cw = np.zeros(15, dtype=np.int64)
            cw[pos] = 1
            s = _syndrome(cw)
            tab[s] = pos
        _SYNDROME_TO_POS = tab
    return _SYNDROME_TO_POS


def _syndrome(cw15: np.ndarray) -> int:
    reg = 0
    for b in cw15:
        reg = (reg << 1) | int(b)
    rem = reg
    for shift in range(14, 3, -1):
        if rem & (1 << shift):
            rem ^= _BCH_GEN << (shift - 4)
    return rem & 0xF


def bch1511_decode(cw15: np.ndarray) -> tuple[np.ndarray, bool]:
    """Returns (data11, ok); corrects single-bit errors."""
    cw = np.asarray(cw15, dtype=np.int64).copy()
    s = _syndrome(cw)
    if s != 0:
        pos = _syndrome_table().get(s)
        if pos is None:
            return cw[:11], False
        cw[pos] ^= 1
        if _syndrome(cw) != 0:
            return cw[:11], False
    return cw[:11], True


def interleave_word(cw_a: np.ndarray, cw_b: np.ndarray) -> np.ndarray:
    """Two BCH codewords -> 30-bit interleaved word (a1 b1 a2 b2 ...)."""
    out = np.empty(30, dtype=np.int64)
    out[0::2] = cw_a
    out[1::2] = cw_b
    return out


def deinterleave_word(word30: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return word30[0::2], word30[1::2]


def encode_word(data22: np.ndarray, first_word: bool = False) -> np.ndarray:
    """22 data bits -> 30-bit D1 word.

    Normal words: two BCH(15,11) codewords interleaved.  Word 1: first 15
    bits raw (11 data incl. preamble + 4 parity placed uninterleaved),
    second 15 BCH-coded."""
    a = bch1511_encode(data22[:11])
    b = bch1511_encode(data22[11:22])
    if first_word:
        return np.concatenate([a, b])
    return interleave_word(a, b)


def decode_word(word30: np.ndarray, first_word: bool = False
                ) -> tuple[np.ndarray, bool]:
    """30-bit word -> (22 data bits, ok)."""
    if first_word:
        a, ok_a = bch1511_decode(word30[:15])
        b, ok_b = bch1511_decode(word30[15:])
    else:
        wa, wb = deinterleave_word(word30)
        a, ok_a = bch1511_decode(wa)
        b, ok_b = bch1511_decode(wb)
    return np.concatenate([a, b]), ok_a and ok_b


def encode_subframe(fra_id: int, sow_s: float,
                    payload_bits: np.ndarray | None = None) -> np.ndarray:
    """One 300-bit D1 subframe: word 1 carries preamble + FraID + SOW MSBs,
    word 2 SOW LSBs; remaining payload fills words 2-10."""
    rng_fill = np.zeros(9 * 22, dtype=np.int64)
    if payload_bits is not None:
        rng_fill[: len(payload_bits)] = payload_bits
    sow = int(sow_s)
    w1 = np.zeros(22, dtype=np.int64)
    # word-1 data layout (22 bits): preamble(11) FraID(3) SOW[19:12](8)
    w1[:11] = D1_PREAMBLE
    w1[11:14] = [(fra_id >> 2) & 1, (fra_id >> 1) & 1, fra_id & 1]
    sow_hi = (sow >> 12) & 0xFF
    for k in range(8):
        w1[14 + k] = (sow_hi >> (7 - k)) & 1
    words = [encode_word(w1, first_word=True)]
    w2 = np.zeros(22, dtype=np.int64)
    sow_lo = sow & 0xFFF
    for k in range(12):
        w2[k] = (sow_lo >> (11 - k)) & 1
    w2[12:22] = rng_fill[:10]
    words.append(encode_word(w2))
    for w in range(8):
        words.append(encode_word(rng_fill[10 + w * 22 : 10 + (w + 1) * 22]))
    return np.concatenate(words)


def decode_subframe(bits300: np.ndarray) -> dict | None:
    """Returns {fra_id, sow_s, words: [10][22]} or None on preamble/BCH
    failure."""
    w1, ok = decode_word(bits300[:30], first_word=True)
    if not ok or not np.array_equal(w1[:11], D1_PREAMBLE):
        return None
    data = [w1]
    for w in range(1, 10):
        d, ok = decode_word(bits300[w * 30 : (w + 1) * 30])
        if not ok:
            return None
        data.append(d)
    fra_id = (int(w1[11]) << 2) | (int(w1[12]) << 1) | int(w1[13])
    sow_hi = 0
    for k in range(8):
        sow_hi = (sow_hi << 1) | int(w1[14 + k])
    sow_lo = 0
    for k in range(12):
        sow_lo = (sow_lo << 1) | int(data[1][k])
    return {"fra_id": fra_id, "sow_s": float((sow_hi << 12) | sow_lo),
            "words": np.stack(data)}


class DnavDecoder:
    """Per-channel D1 NAV decoder: one prompt per 20 ms bit (NH20 already
    wiped by tracking's secondary-code handling)."""

    def __init__(self, prn: int = 0):
        self.prn = prn
        self._soft: list[float] = []
        self.subframes: dict[int, dict] = {}
        self.frame_sync = False
        self._polarity = 1.0
        self._decoded_until = 0
        self._tow_symbol: int | None = None
        self._sow_s: float | None = None

    def push(self, prompt_i) -> None:
        self._soft.extend(np.asarray(prompt_i, dtype=np.float64))
        self._process()

    def sow_at_symbol(self, symbol_idx: int) -> float | None:
        if self._sow_s is None:
            return None
        return self._sow_s + 0.02 * (symbol_idx - self._tow_symbol)

    def _process(self) -> None:
        s = np.asarray(self._soft)
        if len(s) < SUBFRAME_BITS + 11:
            return
        i = self._decoded_until
        while len(s) >= i + SUBFRAME_BITS:
            decoded = False
            for pol in (1.0, -1.0):
                bits = ((pol * s[i : i + SUBFRAME_BITS]) < 0).astype(np.int64)
                r = decode_subframe(bits)
                if r is not None:
                    self.subframes[r["fra_id"]] = r
                    self.frame_sync = True
                    self._polarity = pol
                    # SOW = transmit time of the START of this subframe
                    self._tow_symbol = i
                    self._sow_s = r["sow_s"]
                    i += SUBFRAME_BITS
                    decoded = True
                    break
            if not decoded:
                i += 1 if not self.frame_sync else SUBFRAME_BITS
        self._decoded_until = i
