"""Compile-probe the fused Pallas chain kernel on the real TPU backend.

Builds the same ChainSpec the 12-channel GPS L1 bench uses and compiles
ONE chain-kernel call with zero inputs — fast iteration on Mosaic
lowering/layout errors without paying the full bench (acquisition +
capture loop) compile.  Exit 0 = compiled and ran.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/.cache/gnss_jax_cache")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.track.config import TrackConfig
    from gnss_sdr_1_tpu.track.engine import TrackingEngine
    from gnss_sdr_1_tpu.ops import pallas_chain as pc

    cfg = TrackConfig(
        fs_hz=4.092e6, code_length_chips=1023, chip_rate_chips_s=1.023e6,
        carrier_freq_hz=1575.42e6, n_channels=12, correlator="pallas",
        chunk_epochs=int(os.environ.get("GNSS_BENCH_CHUNK", "16")),
    )
    codes = np.stack([gps_l1ca_code(p) for p in range(1, 13)])
    eng = TrackingEngine(cfg, codes)
    spec = eng._chain_spec
    print("spec:", spec, flush=True)
    call = pc.make_chain_call(spec, interpret=False)

    E, LW, K, C = spec.E, spec.LW, spec.K, spec.C
    SF = pc.n_frows(K)
    zr = jnp.zeros((E, LW, C), jnp.float32)
    zi = jnp.zeros((E, LW, C), jnp.float32)
    s_pred = jnp.zeros((E, C), jnp.int32)
    step0 = jnp.full((1, C), 0.01, jnp.float32)
    sec = jnp.ones((max(spec.sec_len, 1), C), jnp.float32)
    fst = jnp.zeros((SF, C), jnp.float32)
    ist = jnp.zeros((pc.N_IROWS, C), jnp.int32)
    ist = ist.at[pc.I_CURLEN].set(4092)

    t0 = time.time()
    f = jax.jit(call)
    outs = f(zr, zi, s_pred, step0, sec, fst, ist)
    jax.tree.map(lambda a: a.block_until_ready(), outs)
    t1 = time.time()
    print(f"compile+run OK in {t1 - t0:.1f}s on {jax.default_backend()}")

    # warm timing: per-call cost of one chunk launch
    for _ in range(3):
        outs = f(zr, zi, s_pred, step0, sec, fst, ist)
        jax.tree.map(lambda a: a.block_until_ready(), outs)
    n = 20
    t2 = time.time()
    for _ in range(n):
        outs = f(zr, zi, s_pred, step0, sec, fst, ist)
    jax.tree.map(lambda a: a.block_until_ready(), outs)
    dt = (time.time() - t2) / n
    print(f"warm chunk call: {dt * 1e3:.3f} ms "
          f"({dt / spec.E * 1e6:.1f} us/epoch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
