"""BeiDou D1 NAV tests: BCH(15,11) codec with error correction, word
interleaving, subframe roundtrip, stream decoder."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.telemetry.beidou_dnav import (
    DnavDecoder,
    bch1511_decode,
    bch1511_encode,
    decode_subframe,
    decode_word,
    encode_subframe,
    encode_word,
)


def test_bch_roundtrip_and_single_error_correction():
    rng = np.random.default_rng(0)
    for _ in range(20):
        data = rng.integers(0, 2, 11)
        cw = bch1511_encode(data)
        out, ok = bch1511_decode(cw)
        assert ok and np.array_equal(out, data)
        # flip any single bit -> corrected
        pos = int(rng.integers(0, 15))
        cw2 = cw.copy()
        cw2[pos] ^= 1
        out2, ok2 = bch1511_decode(cw2)
        assert ok2 and np.array_equal(out2, data)


def test_word_interleave_roundtrip():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 2, 22)
    w = encode_word(data)
    out, ok = decode_word(w)
    assert ok and np.array_equal(out, data)


def test_subframe_roundtrip():
    rng = np.random.default_rng(2)
    payload = rng.integers(0, 2, 9 * 22 - 12)
    sf = encode_subframe(3, 234567.0, payload)
    assert sf.shape == (300,)
    r = decode_subframe(sf)
    assert r is not None
    assert r["fra_id"] == 3
    assert r["sow_s"] == 234567.0


def test_stream_decoder_with_noise():
    sfs = [encode_subframe(k, 345600.0 + 6.0 * k) for k in (1, 2, 3)]
    bits = np.concatenate([np.zeros(17, dtype=np.int64)] + sfs)
    amp = (1.0 - 2.0 * bits) * 300.0
    rng = np.random.default_rng(3)
    amp += rng.standard_normal(len(amp)) * 40.0
    dec = DnavDecoder(prn=6)
    for i in range(0, len(amp), 111):
        dec.push(amp[i : i + 111])
    assert dec.frame_sync
    assert set(dec.subframes) >= {1, 2}
    assert dec.subframes[2]["sow_s"] == 345612.0
    t1, t2 = dec.sow_at_symbol(100), dec.sow_at_symbol(150)
    assert t2 - t1 == pytest.approx(1.0, abs=1e-12)
