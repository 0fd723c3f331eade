"""Profile the capture tracking program on the TPU backend.

Runs the 12-channel bench's track_capture under jax.profiler.trace and
prints the per-kernel time breakdown from the trace (if the backend
supports profiling), plus a wall-clock split: warm call time vs
epochs.  Usage: python tools/profile_track_tpu.py [outdir]
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.siggen import SatParams, generate_baseband
    from gnss_sdr_1_tpu.constants import GPS_L1_CA
    from gnss_sdr_1_tpu.track import TrackConfig, TrackingEngine
    from gnss_sdr_1_tpu.utils import enable_persistent_compilation_cache
    from gnss_sdr_1_tpu.utils.planar import to_planar

    enable_persistent_compilation_cache()
    FS = 4.092e6
    DUR = float(os.environ.get("PROFILE_DURATION_S", "5.0"))
    N_CH = 12
    rng = np.random.default_rng(42)
    prns = list(range(1, N_CH + 1))
    sats = [SatParams(prn=p, doppler_hz=float(rng.uniform(-4000, 4000)),
                      delay_chips=float(rng.uniform(0, 1023)),
                      cn0_dbhz=44.0,
                      nav_bits=rng.choice([-1.0, 1.0], size=int(DUR * 50) + 8))
            for p in prns]
    codes = {p: gps_l1ca_code(p) for p in prns}
    x = generate_baseband(GPS_L1_CA, sats, codes, FS, DUR, noise=True)
    cfg = TrackConfig(
        fs_hz=FS, code_length_chips=1023, chip_rate_chips_s=1.023e6,
        carrier_freq_hz=1575.42e6, n_channels=N_CH,
        correlator=os.environ.get("GNSS_BENCH_CORRELATOR", "pallas"),
        chunk_epochs=int(os.environ.get("GNSS_BENCH_CHUNK", "16")))
    eng = TrackingEngine(cfg, np.stack([codes[p] for p in prns]))
    st = eng.init_state()
    for ch in range(N_CH):
        s = sats[ch]
        st = eng.activate_channel(st, ch, ch, s.delay_chips / 1.023e6 * FS,
                                  s.doppler_hz, 0, 0)
    nmax = cfg.epoch_samples_max
    span = len(x) - nmax
    samples_dev = jnp.asarray(to_planar(x))
    samples_dev.block_until_ready()

    _, outs = eng.track_capture(samples_dev, st, span)     # compile+warm
    np.asarray(outs.valid)
    t0 = time.time()
    _, outs = eng.track_capture(samples_dev, st, span)
    np.asarray(outs.correlators)
    wall = time.time() - t0
    n_epochs = span // (eng._t0_int - 2) + 2
    print(f"warm: {wall*1e3:.1f} ms for {n_epochs} epochs "
          f"({wall/n_epochs*1e6:.1f} us/epoch), RTF {span/FS/wall:.1f}")

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    try:
        with jax.profiler.trace(outdir):
            _, outs = eng.track_capture(samples_dev, st, span)
            np.asarray(outs.correlators)
        print("trace written to", outdir)
    except Exception as e:  # noqa: BLE001
        print("profiler trace failed:", repr(e))
        return 1

    # summarize the trace: per-kernel total durations
    files = sorted(glob.glob(outdir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace.json.gz found under", outdir)
        return 1
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    tot: dict[str, float] = {}
    cnt: dict[str, int] = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
        tot[name] = tot.get(name, 0.0) + dur
        cnt[name] = cnt.get(name, 0) + 1
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    print(f"{'total_ms':>10} {'count':>8}  name")
    for name, us in top:
        print(f"{us/1e3:10.2f} {cnt[name]:8d}  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
