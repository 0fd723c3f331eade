"""Interference mitigation: notch filtering and pulse blanking.

Reference parity: Notch_Filter / Notch_Filter_Lite (notch adaptive IIR on
CW interference, src/algorithms/input_filter/adapters/notch_filter.cc) and
Pulse_Blanking_Filter (pulse_blanking_filter.cc — zeroes samples above a
noise-floor multiple).  TPU form: spectral excision per FFT block for CW
(simpler and stronger than the reference's adaptive IIR at block scale) and
vectorized amplitude blanking for pulses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.planar import pack_complex, to_planar, unpack_complex


@functools.partial(jax.jit, static_argnames=("n_sigma",))
def _pulse_blank(x_p: jax.Array, n_sigma: float = 4.0):
    """Zero samples whose magnitude exceeds n_sigma * RMS (pulse blanking)."""
    x = unpack_complex(x_p)
    p = x.real**2 + x.imag**2
    rms2 = jnp.mean(p)
    mask = p <= (n_sigma * n_sigma) * rms2
    return pack_complex(jnp.where(mask, x, 0.0 + 0.0j)), jnp.mean(~mask)


def pulse_blanking(x: np.ndarray, n_sigma: float = 4.0) -> tuple[np.ndarray, float]:
    """Host wrapper: returns (cleaned complex64, blanked fraction)."""
    y_p, frac = _pulse_blank(jnp.asarray(to_planar(x)), n_sigma)
    y = np.asarray(y_p)
    return (y[..., 0] + 1j * y[..., 1]).astype(np.complex64), float(frac)


@functools.partial(jax.jit, static_argnames=("excise_bw_bins", "pfa_factor"))
def _notch_block(x_p: jax.Array, excise_bw_bins: int, pfa_factor: float):
    """Spectral excision: null FFT bins whose power exceeds pfa_factor x the
    median bin power (CW interference lines), +- excise_bw_bins around each."""
    x = unpack_complex(x_p)
    X = jnp.fft.fft(x)
    p = X.real**2 + X.imag**2
    med = jnp.median(p)
    hot = p > pfa_factor * med
    # widen the excision around detected lines
    widen = hot
    for k in range(1, excise_bw_bins + 1):
        widen = widen | jnp.roll(hot, k) | jnp.roll(hot, -k)
    Xc = jnp.where(widen, 0.0 + 0.0j, X)
    y = jnp.fft.ifft(Xc)
    return pack_complex(y.astype(jnp.complex64)), jnp.mean(widen)


def notch_filter(x: np.ndarray, excise_bw_bins: int = 2,
                 pfa_factor: float = 30.0,
                 block: int = 1 << 15) -> tuple[np.ndarray, float]:
    """Host wrapper: blockwise spectral excision of CW lines.
    Returns (cleaned complex64, mean excised bin fraction)."""
    x = np.asarray(x, dtype=np.complex64)
    outs, fracs = [], []
    for pos in range(0, len(x) - block + 1, block):
        y_p, frac = _notch_block(
            jnp.asarray(to_planar(x[pos : pos + block])),
            excise_bw_bins, pfa_factor)
        y = np.asarray(y_p)
        outs.append((y[..., 0] + 1j * y[..., 1]).astype(np.complex64))
        fracs.append(float(frac))
    tail = len(x) % block
    if tail:
        outs.append(x[len(x) - tail:])
    return (np.concatenate(outs) if outs else x,
            float(np.mean(fracs)) if fracs else 0.0)
