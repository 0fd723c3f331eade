"""Front-end conditioning kernels.

Reference parity: Freq_Xlating_Fir_Filter (freq_xlating_fir_filter.cc — gr
firdes low-pass + complex mix + decimation), Direct_Resampler
(direct_resampler_conditioner.cc — nearest-sample), Fir_Filter.  The TPU
form: one jitted overlap-save FFT convolution per block, planar boundaries
(utils.planar), halo samples carried between blocks by the caller (or
exchanged between devices via parallel.halo_exchange_blocks when
time-sharded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.planar import to_planar, unpack_complex, pack_complex


def design_lowpass_fir(num_taps: int, cutoff_hz: float, fs_hz: float) -> np.ndarray:
    """Hamming-windowed sinc low-pass (gr::filter::firdes::low_pass analogue)."""
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    fc = cutoff_hz / fs_hz
    h = 2.0 * fc * np.sinc(2.0 * fc * n)
    h *= np.hamming(num_taps)
    return (h / h.sum()).astype(np.float32)


def direct_resample(x: np.ndarray, fs_in: float, fs_out: float) -> np.ndarray:
    """Nearest-previous-sample rate conversion (direct_resampler_conditioner.cc)."""
    n_out = int(np.floor(len(x) * fs_out / fs_in))
    idx = np.floor(np.arange(n_out) * (fs_in / fs_out)).astype(np.int64)
    return x[idx]


def fractional_resample(x: np.ndarray, fs_in: float, fs_out: float) -> np.ndarray:
    """Fractional (interpolating) rate conversion — the Mmse_Resampler /
    Fractional_Resampler role (mmse_resampler_conditioner.cc).  The
    reference uses the GNU Radio 8-tap MMSE interpolator bank; linear
    interpolation gives the same sub-sample timing continuity (the receiver
    only needs phase-continuous resampling; droop at band edge is absorbed
    by the correlators) with a TPU/NumPy-trivial kernel."""
    n_out = int(np.floor((len(x) - 1) * fs_out / fs_in))
    pos = np.arange(n_out, dtype=np.float64) * (fs_in / fs_out)
    i0 = np.floor(pos).astype(np.int64)
    frac = (pos - i0).astype(np.float32)
    return (x[i0] * (1.0 - frac) + x[i0 + 1] * frac).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("decim", "n_taps"))
def _freq_xlating_block(
    x_p: jax.Array,        # [N + n_taps - 1, 2] planar input incl. history head
    h_fft_p: jax.Array,    # [F, 2] planar FFT of taps, F = next_pow2 block
    phase0: jax.Array,     # scalar f32: mixer phase at first sample
    phase_step: jax.Array,  # scalar f32: -2*pi*if_freq/fs
    decim: int,
    n_taps: int,
):
    """Overlap-save: mix to baseband, filter, decimate one block.

    Input carries (n_taps-1) history samples at the head; output length is
    (len - n_taps + 1) / decim."""
    x = unpack_complex(x_p)
    n_total = x.shape[0]
    idx = jnp.arange(n_total, dtype=jnp.float32)
    ph = phase0 + phase_step * idx
    x = x * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))
    F = h_fft_p.shape[0]
    h_fft = unpack_complex(h_fft_p)
    xf = jnp.fft.fft(x, n=F)
    y = jnp.fft.ifft(xf * h_fft)[: n_total]
    valid = y[n_taps - 1 :]
    out = valid[::decim]
    return pack_complex(out.astype(jnp.complex64))


def freq_xlating_fir(
    x: np.ndarray,
    taps: np.ndarray,
    fs_hz: float,
    if_freq_hz: float = 0.0,
    decim: int = 1,
) -> np.ndarray:
    """One-shot frequency-translating FIR + decimation (host convenience)."""
    cond = Conditioner(taps, fs_hz, if_freq_hz, decim)
    return cond.process(x, flush=True)


class Conditioner:
    """Streaming conditioner: mix IF -> baseband, FIR low-pass, decimate.

    Maintains the (n_taps-1)-sample overlap-save history and the mixer phase
    across blocks, so arbitrarily long streams process block-by-block with
    bit-exact seams (SURVEY.md §7 hard part 5).
    """

    def __init__(self, taps: np.ndarray, fs_hz: float,
                 if_freq_hz: float = 0.0, decim: int = 1,
                 block_size: int = 1 << 17):
        self.taps = np.asarray(taps, dtype=np.float32)
        self.n_taps = len(self.taps)
        self.fs_hz = fs_hz
        self.if_freq_hz = if_freq_hz
        self.decim = int(decim)
        # block_size chosen so block + taps - 1 <= next pow2 F
        self.block = int(block_size)
        total = self.block + self.n_taps - 1
        F = 1 << int(np.ceil(np.log2(total)))
        self._fft_size = F
        h = np.zeros(F, dtype=np.complex64)
        h[: self.n_taps] = self.taps
        self._h_fft = jnp.asarray(to_planar(np.fft.fft(h).astype(np.complex64)))
        self._hist = np.zeros(self.n_taps - 1, dtype=np.complex64)
        self._step = -2.0 * np.pi * if_freq_hz / fs_hz
        # _phase tracks the mixer phase at the first HISTORY sample of the
        # next block; initialized so the stream's first real sample (which
        # sits after the zero history) is mixed with phase 0.
        self._phase = -self._step * (self.n_taps - 1)

    def process(self, x: np.ndarray, flush: bool = False) -> np.ndarray:
        """Feed samples; returns conditioned output at fs/decim."""
        x = np.asarray(x, dtype=np.complex64)
        outs = []
        pos = 0
        while pos < len(x):
            chunk = x[pos : pos + self.block]
            if len(chunk) < self.block and not flush:
                break
            buf = np.concatenate([self._hist, chunk])
            if len(chunk) < self.block:
                pad = self.block - len(chunk)
                buf = np.concatenate([buf, np.zeros(pad, np.complex64)])
            else:
                pad = 0
            y_p = _freq_xlating_block(
                jnp.asarray(to_planar(buf)), self._h_fft,
                jnp.float32(self._phase), jnp.float32(self._step),
                self.decim, self.n_taps,
            )
            y = np.asarray(y_p)
            y = y[..., 0] + 1j * y[..., 1]
            if pad:
                keep = int(np.ceil(len(chunk) / self.decim))
                y = y[:keep]
            outs.append(y.astype(np.complex64))
            self._hist = buf[len(buf) - pad - (self.n_taps - 1) : len(buf) - pad]
            self._phase = float(
                (self._phase + self._step * len(chunk)) % (2.0 * np.pi)
            )
            pos += len(chunk)
        if outs:
            return np.concatenate(outs)
        return np.empty(0, dtype=np.complex64)


# ------------------------------------------------------------- beamformer --

def steering_weights(n_antennas: int, spacing_wavelengths: float = 0.5,
                     steer_deg: float = 0.0) -> np.ndarray:
    """Uniform-linear-array phase weights pointing a beam at `steer_deg`
    from boresight.  With steer_deg=0 this reduces to the reference's
    all-ones weight vector (beamformer.cc:57, weight_vector[i] = (1,0))."""
    k = np.arange(n_antennas)
    phase = -2.0 * np.pi * spacing_wavelengths * k * np.sin(
        np.radians(steer_deg))
    return np.exp(1j * phase).astype(np.complex64)


class Beamformer:
    """Fixed-weight array combiner (Beamformer_Filter adapter,
    beamformer_filter.cc + beamformer.cc work()): y[n] = sum_i w[i]*x_i[n]
    over GNSS_SDR_BEAMFORMER_CHANNELS=8 antenna inputs.  The TPU form is a
    planar [N, A, 2] x [A, 2] complex contraction in one jitted matmul —
    MXU-friendly for large A, bandwidth-bound (one pass) for A=8.

    Input: [N, A] complex (columns = antenna channels) or a list of A
    equal-length streams.  Weights default to the reference's all-ones
    vector; pass `steering_weights(...)` for a steered beam.
    """

    N_CHANNELS = 8   # GNSS_SDR_BEAMFORMER_CHANNELS

    def __init__(self, weights: np.ndarray | None = None,
                 n_antennas: int | None = None):
        if weights is None:
            weights = np.ones(n_antennas or self.N_CHANNELS, np.complex64)
        self.weights = np.asarray(weights, dtype=np.complex64)

    def process(self, x) -> np.ndarray:
        if isinstance(x, (list, tuple)):
            x = np.stack([np.asarray(c) for c in x], axis=1)
        x = np.asarray(x, dtype=np.complex64)
        if x.ndim != 2 or x.shape[1] != len(self.weights):
            raise ValueError(
                f"expected [N, {len(self.weights)}] array input, "
                f"got {x.shape}")
        y_p = _beamform_block(jnp.asarray(to_planar(x)),
                              jnp.asarray(to_planar(self.weights)))
        y = np.asarray(y_p)
        return (y[..., 0] + 1j * y[..., 1]).astype(np.complex64)


@jax.jit
def _beamform_block(x_p: jax.Array, w_p: jax.Array) -> jax.Array:
    """[N, A, 2] planar x [A, 2] planar -> [N, 2] complex contraction."""
    xr, xi = x_p[..., 0], x_p[..., 1]
    wr, wi = w_p[..., 0], w_p[..., 1]
    yr = xr @ wr - xi @ wi
    yi = xr @ wi + xi @ wr
    return jnp.stack([yr, yi], axis=-1)
