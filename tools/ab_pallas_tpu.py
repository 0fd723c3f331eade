#!/usr/bin/env python3
"""On-hardware numerics A/B: fused Pallas chain vs MXU/unrolled path.

Tracks the SAME 1 s 12-channel GPS L1 capture on the real TPU with
correlator='mxu' and correlator='pallas' and compares the tracked outputs
(Doppler trajectory, prompt correlators, code-phase starts, CN0) — the
value check the interpret-mode parity tests (tests/test_pallas_chain.py)
cannot provide for the real Mosaic lowering (Cephes atan, 128-lane
padding, row-packed state).

Writes a JSON verdict line; exit 0 = within tolerances.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/gnss_jax_cache")

import numpy as np


def run(correlator: str, x, sats, codes, fs):
    import jax.numpy as jnp

    from gnss_sdr_1_tpu.track import TrackConfig, TrackingEngine
    from gnss_sdr_1_tpu.utils.planar import to_planar

    cfg = TrackConfig(
        fs_hz=fs, code_length_chips=1023, chip_rate_chips_s=1.023e6,
        carrier_freq_hz=1575.42e6, n_channels=12, correlator=correlator,
        chunk_epochs=16)
    eng = TrackingEngine(cfg, np.stack([codes[p] for p in range(1, 13)]))
    st = eng.init_state()
    for ch in range(12):
        s = sats[ch]
        st = eng.activate_channel(st, ch, ch, s.delay_chips / 1.023e6 * fs,
                                  s.doppler_hz + 25.0, 0, 0)
    nmax = cfg.epoch_samples_max
    span = len(x) - nmax
    sd = jnp.asarray(to_planar(x))
    sd.block_until_ready()
    t0 = time.time()
    st2, outs = eng.track_capture(sd, st, span)
    wall = time.time() - t0
    return outs, wall


def main() -> int:
    import jax

    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.constants import GPS_L1_CA
    from gnss_sdr_1_tpu.siggen import SatParams, generate_baseband
    from gnss_sdr_1_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    fs = 4.092e6
    rng = np.random.default_rng(42)
    sats = [SatParams(prn=p, doppler_hz=float(rng.uniform(-4000, 4000)),
                      delay_chips=float(rng.uniform(0, 1023)),
                      cn0_dbhz=44.0,
                      nav_bits=rng.choice([-1.0, 1.0], size=60))
            for p in range(1, 13)]
    codes = {p: gps_l1ca_code(p) for p in range(1, 13)}
    x = generate_baseband(GPS_L1_CA, sats, codes, fs, 1.0, noise=True)

    outs_m, wall_m = run("mxu", x, sats, codes, fs)
    outs_p, wall_p = run("pallas", x, sats, codes, fs)

    vm = outs_m.valid & outs_p.valid
    n = int(vm.sum())
    dop_d = np.abs(outs_m.carrier_doppler_hz[vm] -
                   outs_p.carrier_doppler_hz[vm])
    start_d = np.abs(outs_m.start[vm].astype(np.int64)
                     - outs_p.start[vm].astype(np.int64))
    pm = outs_m.correlators[:, :, 1, 0] + 1j * outs_m.correlators[:, :, 1, 1]
    pp = outs_p.correlators[:, :, 1, 0] + 1j * outs_p.correlators[:, :, 1, 1]
    rel_p = (np.abs(pm[vm] - pp[vm])
             / np.maximum(np.abs(pm[vm]), 1.0))
    cn0_sel = (outs_m.cn0_dbhz[vm] > 0) & (outs_p.cn0_dbhz[vm] > 0)
    cn0_d = np.abs(outs_m.cn0_dbhz[vm][cn0_sel]
                   - outs_p.cn0_dbhz[vm][cn0_sel])
    # converged-tail Doppler agreement per channel
    tail = slice(-200, None)
    dt_m = np.where(outs_m.valid, outs_m.carrier_doppler_hz, np.nan)
    dt_p = np.where(outs_p.valid, outs_p.carrier_doppler_hz, np.nan)
    tail_d = np.abs(np.nanmean(dt_m[tail], axis=0)
                    - np.nanmean(dt_p[tail], axis=0))
    verdict = {
        "platform": jax.default_backend(),
        "n_common_epochs": n,
        "wall_mxu_s": round(wall_m, 3), "wall_pallas_s": round(wall_p, 3),
        "doppler_mean_abs_hz": float(np.mean(dop_d)),
        "doppler_p99_hz": float(np.percentile(dop_d, 99)),
        "doppler_tail_max_hz": float(np.nanmax(tail_d)),
        "start_mismatch_max_samples": int(start_d.max()),
        "prompt_rel_p99": float(np.percentile(rel_p, 99)),
        "cn0_mean_abs_db": float(np.mean(cn0_d)) if len(cn0_d) else 0.0,
    }
    # tolerances: transient chaos allows brief excursions; converged
    # agreement and code alignment must be tight (the same bars the CPU
    # parity tests hold interpret mode to)
    ok = (verdict["doppler_tail_max_hz"] < 1.0
          and verdict["start_mismatch_max_samples"] <= 2
          and verdict["cn0_mean_abs_db"] < 0.7
          and n > 10000)
    verdict["ok"] = bool(ok)
    print(json.dumps(verdict))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
