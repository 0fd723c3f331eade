"""Multi-device tests on the 8-virtual-device CPU mesh (conftest).

The reference has no distributed tests (SURVEY §4.8); the strategy here is
bit-equivalence: channel-sharded device programs must produce exactly the
single-device results, and the overlap-save halo exchange must make
time-sharded convolution exact at seams.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gnss_sdr_1_tpu.codes import gps_l1ca_code
from gnss_sdr_1_tpu.constants import GPS_L1_CA
from gnss_sdr_1_tpu.parallel import (
    channel_mesh,
    halo_exchange_blocks,
    replicate,
    shard_channel_tree,
    time_mesh,
)
from gnss_sdr_1_tpu.siggen import SatParams, generate_baseband
from gnss_sdr_1_tpu.track import TrackConfig, TrackingEngine
from gnss_sdr_1_tpu.utils.planar import to_planar

FS = 2.046e6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_channel_sharded_tracking_matches_single_device():
    n_ch = 8
    prns = list(range(1, n_ch + 1))
    rng = np.random.default_rng(0)
    sats = [SatParams(prn=p, doppler_hz=float(rng.uniform(-3000, 3000)),
                      delay_chips=float(rng.uniform(0, 1023)), cn0_dbhz=45)
            for p in prns]
    codes = {p: gps_l1ca_code(p) for p in prns}
    x = generate_baseband(GPS_L1_CA, sats, codes, FS, 0.3, noise=True)
    cfg = TrackConfig(fs_hz=FS, code_length_chips=1023,
                      chip_rate_chips_s=1.023e6, carrier_freq_hz=1575.42e6,
                      n_channels=n_ch)
    eng = TrackingEngine(cfg, np.stack([codes[p] for p in prns]))
    st = eng.init_state()
    for ch, p in enumerate(prns):
        st = eng.activate_channel(
            st, ch, ch, sats[ch].delay_chips / 1.023e6 * FS,
            sats[ch].doppler_hz, 0, 0)
    span = len(x) - cfg.epoch_samples_max
    xp = jnp.asarray(to_planar(x))

    st1, out1 = eng.track_capture(xp, st, span)

    mesh = channel_mesh(8)
    st_sh = shard_channel_tree(st, mesh)
    xp_sh = replicate(np.asarray(to_planar(x)), mesh)
    st2, out2 = eng.track_capture(xp_sh, st_sh, span)

    assert np.array_equal(np.asarray(out1.valid), np.asarray(out2.valid))
    # prompts travel as f16 in the packed capture outputs: shard-order
    # f32 rounding can land on adjacent f16 bins, so the equivalence bound
    # is one f16 ULP (2^-10 relative)
    np.testing.assert_allclose(
        np.asarray(out1.correlators), np.asarray(out2.correlators),
        rtol=1.1e-3, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(st1.carrier_doppler_hz), np.asarray(st2.carrier_doppler_hz),
        rtol=1e-5, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_halo_exchange_makes_time_sharded_fir_exact():
    """Overlap-save across a ('time',) mesh: per-device 'valid' convolution
    with the neighbor's halo equals the global convolution."""
    from jax.experimental.shard_map import shard_map

    n_dev = 8
    taps = np.hanning(17).astype(np.float32)
    taps /= taps.sum()
    halo = len(taps) - 1
    n_per = 1024
    rng = np.random.default_rng(1)
    x = rng.standard_normal(n_dev * n_per).astype(np.float32)

    mesh = time_mesh(n_dev)

    def per_device(blk, taps):
        ext = halo_exchange_blocks(blk, halo, "time")
        # valid convolution over [n_per + halo] -> n_per outputs
        idx = jnp.arange(n_per)[:, None] + jnp.arange(halo + 1)[None, :]
        return jnp.sum(ext[idx] * taps[::-1][None, :], axis=1)

    f = jax.jit(shard_map(
        lambda b, t: per_device(b, t),
        mesh=mesh, in_specs=(P("time"), P()), out_specs=P("time"),
        check_rep=False))
    xd = jax.device_put(x, NamedSharding(mesh, P("time")))
    y = np.asarray(f(xd, jnp.asarray(taps)))

    ref = np.convolve(x, taps, mode="full")[halo : halo + len(x)]
    # every device's outputs except the global tail (wrapped halo) are exact
    np.testing.assert_allclose(y[: len(x) - halo], ref[: len(x) - halo],
                               rtol=1e-5, atol=1e-6)
