"""Tracking discriminators (pure JAX functions, device- or host-side).

Reference parity: src/algorithms/tracking/libs/tracking_discriminators.{h,cc}
(tracking_discriminators.h:53-100).  Exact formulas per SURVEY.md A.3; all
angles in radians, outputs normalized as in the reference (the /2pi to Hz
conversion happens in the caller, as in dll_pll_veml_tracking.cc:921-928).
"""

from __future__ import annotations

import jax.numpy as jnp


def pll_cloop_two_quadrant_atan(prompt):
    """Costas-loop two-quadrant arctan: atan(Q/I), 0 when I == 0.
    Ref: pll_cloop_two_quadrant_atan (tracking_discriminators.cc)."""
    i = prompt.real
    q = prompt.imag
    return jnp.where(i != 0.0, jnp.arctan2(q * jnp.sign(i), jnp.abs(i)), 0.0)


def pll_four_quadrant_atan(prompt):
    """Four-quadrant arctan atan2(Q, I) — used once the secondary code /
    pilot is locked (data-free channel)."""
    return jnp.arctan2(prompt.imag, prompt.real)


def fll_four_quadrant_atan(p1, p2, t1, t2):
    """FLL cross/dot discriminator over consecutive prompts:
    atan2(cross, dot) / (t2 - t1) [rad/s].
    dot = I1*I2 + Q1*Q2, cross = I1*Q2 - I2*Q1."""
    dot = p1.real * p2.real + p1.imag * p2.imag
    cross = p1.real * p2.imag - p2.real * p1.imag
    return jnp.arctan2(cross, dot) / (t2 - t1)


def dll_nc_e_minus_l_normalized(early, late):
    """Normalized non-coherent Early-minus-Late envelope:
    0.5 * (|E| - |L|) / (|E| + |L|)  (magnitudes, not powers)."""
    e = jnp.abs(early)
    l = jnp.abs(late)
    s = e + l
    return jnp.where(s > 0.0, 0.5 * (e - l) / s, 0.0)


def dll_nc_vemlp_normalized(very_early, early, late, very_late):
    """VEML power discriminator:
    (sqrt(|VE|^2+|E|^2) - sqrt(|VL|^2+|L|^2)) / (sum of both)."""
    p_early = jnp.sqrt(jnp.abs(very_early) ** 2 + jnp.abs(early) ** 2)
    p_late = jnp.sqrt(jnp.abs(very_late) ** 2 + jnp.abs(late) ** 2)
    s = p_early + p_late
    return jnp.where(s > 0.0, (p_early - p_late) / s, 0.0)
