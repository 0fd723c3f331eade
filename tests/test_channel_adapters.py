"""Channel-adapter tests: NH20 sync/wipe for BeiDou, meander aggregation for
GLONASS, through the uniform decoder interface."""

import numpy as np
import pytest

from gnss_sdr_1_tpu.telemetry.beidou_dnav import encode_subframe_bits
from gnss_sdr_1_tpu.telemetry.channel_adapters import (
    BeidouChannelDecoder,
    GlonassChannelDecoder,
)
from gnss_sdr_1_tpu.telemetry.gnav import (
    GlonassEphemeris,
    encode_string,
    string_to_symbols,
)


def test_beidou_adapter_nh_sync_and_sow():
    sfs = [encode_subframe_bits(k, 124800.0 + 6.0 * k) for k in (1, 2, 3)]
    bits = np.concatenate(sfs)
    amp_bits = 1.0 - 2.0 * bits
    nh = 1.0 - 2.0 * np.array([0, 0, 0, 0, 0, 1, 0, 0, 1, 1, 0, 1, 0, 1, 0,
                               0, 1, 1, 1, 0])
    # prompt per 1 ms: bit value x NH chip, with an initial partial offset
    prompts = (amp_bits[:, None] * nh[None, :]).reshape(-1) * 180.0
    prompts = np.concatenate([prompts[7:], prompts[:7]])[: len(prompts) - 40]
    rng = np.random.default_rng(0)
    prompts = prompts + rng.standard_normal(len(prompts)) * 25.0
    dec = BeidouChannelDecoder(prn=8)
    for i in range(0, len(prompts), 133):
        dec.push(prompts[i : i + 133])
    assert dec.raw.frame_sync
    assert 2 in dec.raw.subframes
    t1 = dec.tow_at_symbol(4000)
    t2 = dec.tow_at_symbol(4500)
    assert t1 is not None and t2 - t1 == pytest.approx(0.5, abs=1e-9)


def test_glonass_adapter_meander_aggregation():
    eph = GlonassEphemeris(slot=3, tb_s=11700.0, tk_s=11730.0,
                           x_km=11000.0, y_km=-12500.0, z_km=18000.0,
                           vx_kms=2.5, vy_kms=1.2, vz_kms=-0.7)
    # the time mark TRAILS each string's data, so the first string before
    # any detected mark can't decode — repeat it at the end
    stream10 = np.concatenate(
        [string_to_symbols(encode_string(sid, eph))
         for sid in (1, 2, 3, 4, 1)])
    amp10 = (1.0 - 2.0 * stream10) * 150.0
    # each 10 ms symbol -> 10 x 1 ms prompts, with a 4-epoch phase offset
    prompts = np.repeat(amp10, 10)
    prompts = np.concatenate([prompts[6:], prompts[:6]])
    rng = np.random.default_rng(1)
    prompts = prompts + rng.standard_normal(len(prompts)) * 20.0
    dec = GlonassChannelDecoder(slot=3)
    for i in range(0, len(prompts), 333):
        dec.push(prompts[i : i + 333])
    assert dec.raw.string_sync
    assert dec.ephemeris_complete
    assert dec.ephemeris.x_km == pytest.approx(11000.0, abs=2**-11)
