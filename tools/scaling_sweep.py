#!/usr/bin/env python3
"""Throughput-vs-device-count sweep for the channel-sharded tracking loop.

Measures channel-samples/s at 1, 2, 4, ... devices with a FIXED per-device
load (weak scaling: channels = chans_per_dev * n_devices) and reports the
efficiency vs the single-device rate — the >= 80% BASELINE.md target.

On a virtual CPU mesh (default: XLA_FLAGS=--xla_force_host_platform_device_
count=8) the numbers validate the sharding/collective structure, not real
ICI bandwidth; on a real TPU pod slice run it unchanged (JAX_PLATFORMS
unset) and, multi-host, after gnss_sdr_1_tpu.parallel.init_distributed().

Usage: python tools/scaling_sweep.py [--devices 1,2,4,8] [--chans_per_dev 4]
       [--seconds 0.5] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--chans_per_dev", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=0.5)
    ap.add_argument("--fs", type=float, default=4.092e6)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count="
            + args.devices.split(",")[-1])
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.constants import GPS_L1_CA
    from gnss_sdr_1_tpu.parallel import (channel_mesh, replicate,
                                         shard_channel_tree)
    from gnss_sdr_1_tpu.siggen.generator import SatParams, generate_baseband
    from gnss_sdr_1_tpu.track import TrackConfig, TrackingEngine
    from gnss_sdr_1_tpu.utils import enable_persistent_compilation_cache
    from gnss_sdr_1_tpu.utils.planar import to_planar

    enable_persistent_compilation_cache()
    avail = len(jax.devices())
    counts = [int(d) for d in args.devices.split(",") if int(d) <= avail]
    dev0 = jax.devices()[0].platform
    rng = np.random.default_rng(1)
    prns = list(range(1, 33))
    x = generate_baseband(
        GPS_L1_CA,
        [SatParams(prn=p, doppler_hz=float(rng.uniform(-4e3, 4e3)),
                   delay_chips=float(rng.uniform(0, 1023)), cn0_dbhz=45.0)
         for p in prns],
        {p: gps_l1ca_code(p) for p in prns}, args.fs, args.seconds + 0.01,
        noise=True)
    results = []
    base_rate = None
    for nd in counts:
        C = args.chans_per_dev * nd
        cfg = TrackConfig(
            fs_hz=args.fs, code_length_chips=1023,
            chip_rate_chips_s=1.023e6, carrier_freq_hz=1575.42e6,
            n_channels=C,
            correlator="mxu" if dev0 == "tpu" else "fft")
        codes = np.stack([gps_l1ca_code(1 + (i % 32)) for i in range(C)])
        eng = TrackingEngine(cfg, codes)
        st = eng.init_state()
        for ch in range(C):
            st = eng.activate_channel(st, ch, ch, 100.0 + 7 * ch,
                                      1000.0 - 50.0 * ch, 0, 0)
        mesh = channel_mesh(nd)
        st = shard_channel_tree(st, mesh)
        span = int(args.seconds * args.fs)
        samples = replicate(to_planar(x[: span + cfg.epoch_samples_max]),
                            mesh)
        _, outs = eng.track_capture(samples, st, span)   # compile + warm
        jax.block_until_ready(outs.valid)
        t0 = time.time()
        _, outs = eng.track_capture(samples, st, span)
        jax.block_until_ready(outs.valid)
        wall = time.time() - t0
        rate = span / args.fs * args.fs * C / wall      # channel-samples/s
        if base_rate is None:
            base_rate = rate / nd / args.chans_per_dev
        per_dev = rate / nd
        eff = per_dev / (base_rate * args.chans_per_dev)
        results.append({"devices": nd, "channels": C,
                        "channel_samples_per_s": round(rate),
                        "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)
    ok = all(r["scaling_efficiency"] >= 0.8 for r in results[1:])
    print(json.dumps({"platform": dev0, "weak_scaling_ok": ok,
                      "target": 0.8}))


if __name__ == "__main__":
    main()
