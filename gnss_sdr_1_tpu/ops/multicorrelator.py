"""Multicorrelator: carrier wipe-off + code resampling + K-tap dot products.

Reference parity: this is THE tracking hot kernel —
volk_gnsssdr_32fc_32f_rotator_dot_prod_32fc_xn.h (rotator + multi-dot
product, SURVEY.md A.1) fused with volk_gnsssdr_32f_xn_resampler_32f_xn.h
(floor code resampler, A.2), as driven by
cpu_multicorrelator_real_codes.cc:129-169 and cuda_multicorrelator.cu:43.

Numerical contracts honoured:
  * code index: idx = floor(code_phase_step*n + shift_k - rem_code_phase)
    mod L  (nearest-previous-sample, no interpolation)
  * carrier: out[k] = sum_n in[n] * exp(-j(phi + dphi*n + 0.5*ddphi*n^2))
    * code_k[n].  The reference's incremental phasor with 256-sample
    renormalization is replaced by direct sin/cos evaluation, which is MORE
    accurate than the phasor recursion and maps to the TPU VPU; equivalence
    is asserted in tests to the renormalized-recursion tolerance.
  * masking: sample n participates iff n < n_valid (variable integration
    block length, d_current_prn_length_samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _code_indices(n, code_phase_step, shifts, rem_code_phase, code_len):
    """[K, N] int32 gather indices into the 1-sample/chip code table."""
    chips = code_phase_step * n[None, :] + shifts[:, None] - rem_code_phase
    idx = jnp.floor(chips).astype(jnp.int32)
    return jnp.mod(idx, code_len)


def multicorrelate(
    samples,            # [N] complex64 input segment
    code,               # [L] float32 +-1 chips (1 sample/chip)
    shifts_chips,       # [K] float32 correlator tap offsets (e.g. -E, 0, +L)
    code_phase_step,    # chips/sample (code_freq / fs)
    rem_code_phase,     # chips into the code at sample 0
    carr_phase_rad,     # carrier phase at sample 0
    carr_step_rad,      # rad/sample (2*pi*(IF+doppler)/fs)
    carr_rate_rad=0.0,  # rad/sample^2 (high-dynamics phase acceleration)
    n_valid=None,       # samples actually integrated (<= N); None = all
):
    """Returns complex64[K] correlator outputs."""
    N = samples.shape[-1]
    n = jnp.arange(N, dtype=jnp.float32)
    phase = carr_phase_rad + carr_step_rad * n + 0.5 * carr_rate_rad * n * n
    wiped = samples * jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))
    if n_valid is not None:
        wiped = jnp.where(n < n_valid, wiped, 0.0 + 0.0j)
    idx = _code_indices(n, code_phase_step, shifts_chips, rem_code_phase,
                        code.shape[-1])
    codes = code[idx]                           # [K, N]
    # K small (3-6): dot products on the VPU via matvec
    re = codes @ wiped.real
    im = codes @ wiped.imag
    return jax.lax.complex(re, im)


@functools.partial(
    jax.vmap,
    in_axes=(0, 0, None, 0, 0, 0, 0, 0, 0),
)
def multicorrelate_batch(
    samples, code, shifts_chips, code_phase_step, rem_code_phase,
    carr_phase_rad, carr_step_rad, carr_rate_rad, n_valid,
):
    """Channel-batched multicorrelator: leading axis C on samples, code and
    all scalar loop parameters; shared tap shifts."""
    return multicorrelate(
        samples, code, shifts_chips, code_phase_step, rem_code_phase,
        carr_phase_rad, carr_step_rad, carr_rate_rad, n_valid,
    )
