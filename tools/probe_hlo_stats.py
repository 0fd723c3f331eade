#!/usr/bin/env python3
"""Probe: compile (cache-hit) the capture tracking program and report HLO
instruction counts for the while-loop body — the per-iteration kernel count
is the dispatch-overhead proxy for the device loop (PERF.md round-3 work).

Usage: python tools/probe_hlo_stats.py [cpu|tpu]
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    if len(sys.argv) > 1:
        jax.config.update("jax_platforms", sys.argv[1])

    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.track import TrackConfig, TrackingEngine
    from gnss_sdr_1_tpu.utils import enable_persistent_compilation_cache
    from gnss_sdr_1_tpu.utils.planar import to_planar
    import jax.numpy as jnp

    enable_persistent_compilation_cache()
    FS = 4.092e6
    N_CH = int(os.environ.get("GNSS_BENCH_CHANNELS", "12"))
    prns = list(range(1, N_CH + 1))
    codes = np.stack([gps_l1ca_code(p) for p in prns])
    cfg = TrackConfig(
        fs_hz=FS, code_length_chips=1023, chip_rate_chips_s=1.023e6,
        carrier_freq_hz=1575.42e6, n_channels=N_CH,
        correlator=os.environ.get("GNSS_BENCH_CORRELATOR", "fft"),
        chunk_epochs=int(os.environ.get("GNSS_BENCH_CHUNK", "16")))
    eng = TrackingEngine(cfg, codes)
    st = eng.init_state()

    dur = float(os.environ.get("PROBE_DURATION_S", "5.0"))
    n = int(FS * dur) + cfg.epoch_samples_max
    samples = jnp.zeros((n, 2), jnp.float32)
    span = n - cfg.epoch_samples_max
    n_epochs = span // (eng._t0_int - 2) + 2

    fn = eng._capture_fn
    t0 = time.time()
    lowered = fn.lower(samples, st, jnp.int32(span), jnp.int32(n_epochs),
                       n_epochs_cap=n_epochs)
    compiled = lowered.compile()
    print(f"compile (or cache hit): {time.time() - t0:.1f} s")
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt.splitlines())} lines")
    # per-computation instruction counts
    comps = re.findall(r"^(%?[\w\.\-]+) \([^)]*\) -> ", txt, re.M)
    counts = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^(ENTRY )?%?([\w\.\-]+) \(", line)
        if m and ("{" in line):
            cur = m.group(2)
            counts[cur] = 0
        elif cur and re.match(r"^\s+\S+ = ", line):
            counts[cur] += 1
    big = sorted(counts.items(), key=lambda kv: -kv[1])[:12]
    for name, c in big:
        print(f"{c:6d}  {name}")
    # fusion count in the while body
    body = [k for k in counts if "body" in k]
    print("while-body computations:", body)
    nfus = 0
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^(ENTRY )?%?([\w\.\-]+) \(", line)
        if m and ("{" in line):
            cur = m.group(2)
        if cur in body and " fusion(" in line:
            nfus += 1
    print(f"fusions in while bodies: {nfus}")


if __name__ == "__main__":
    main()
