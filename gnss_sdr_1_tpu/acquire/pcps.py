"""Batched PCPS acquisition (JAX, TPU-first).

Reference parity: pcps_acquisition.cc (src/algorithms/acquisition/
gnuradio_blocks/).  The reference iterates a per-Doppler-bin loop of
{carrier wipe-off, FFT, multiply by conj(code FFT), IFFT, |.|^2}
(acquisition_core :712-745); here the whole Doppler grid for every channel is
one batched tensor op — (C, D, F) — jitted once.  Numerical contracts:

* CFAR statistic (max_to_input_power_statistic :565-596):
  stat = max|corr|^2 / (F^2 * mean|x|^2)   [in numpy-normalized FFT terms]
* Peak ratio (first_vs_second_peak_statistic :599-666): first/second peak with
  a +-1 chip circular exclusion zone, second peak searched in the same
  Doppler bin.
* Threshold from Pfa (gps_l1_ca_pcps_acquisition.cc:262-280):
  thr = Quantile[Exp(rate=F)]((1-pfa)^(1/ncells)), ncells = F * n_bins.
* Doppler grid (init :310-357): bins at -doppler_max + k*doppler_step,
  k in [0, ceil(2*doppler_max/step)); wipe-off = exp(-j*2*pi*f*n/fs).
* bit_transition_flag doubles the correlation window to straddle nav-bit
  edges (set_local_code :239-273): correlate 2 code periods of data against
  one zero-padded code period, keep the first `samples_per_code` lags.
* Two-step refinement (:745+, acq_conf.h:46-48): second narrow grid around
  the coarse Doppler with doppler_step2.
* Non-coherent dwell accumulation (max_dwells): |corr|^2 grids summed.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AcqConfig:
    """Mirror of Acq_Conf (src/algorithms/acquisition/libs/acq_conf.h:39-68)."""

    fs_hz: float
    samples_per_code: int          # samples in one PRN period at fs
    samples_per_chip: int = 4
    doppler_max_hz: float = 5000.0
    doppler_step_hz: float = 250.0
    sampled_ms: int = 1            # coherent integration in code periods worth
    max_dwells: int = 1            # non-coherent accumulations
    bit_transition_flag: bool = False
    use_cfar: bool = True
    threshold: float = 0.0         # 0 -> derive from pfa
    pfa: float = 0.0
    # two-step fine search
    make_two_steps: bool = False
    doppler_step2_hz: float = 125.0
    num_doppler_bins_step2: int = 4
    # FDMA (GLONASS): constant carrier bias added to the whole grid
    freq_offset_hz: float = 0.0

    @property
    def coherent_samples(self) -> int:
        return self.samples_per_code * self.sampled_ms

    @property
    def fft_size(self) -> int:
        n = self.coherent_samples
        return 2 * n if self.bit_transition_flag else n

    @property
    def num_doppler_bins(self) -> int:
        return int(math.ceil(2.0 * self.doppler_max_hz / self.doppler_step_hz))

    @property
    def effective_size(self) -> int:
        """Number of correlation lags kept (one code period span)."""
        return self.coherent_samples

    def doppler_bins_hz(self) -> np.ndarray:
        k = np.arange(self.num_doppler_bins)
        return (-self.doppler_max_hz + k * self.doppler_step_hz
                + self.freq_offset_hz)

    def derived_threshold(self) -> float:
        """Threshold from Pfa via the exponential-quantile rule (CFAR mode)."""
        if self.pfa <= 0.0:
            return self.threshold
        ncells = self.fft_size * self.num_doppler_bins
        val = (1.0 - self.pfa) ** (1.0 / ncells)
        return float(-math.log1p(-val) / self.fft_size)


@dataclasses.dataclass
class AcqResult:
    """Per-channel acquisition outcome -> Gnss_Synchro.Acq_* fields
    (gnss_synchro.h:44-81)."""

    positive: np.ndarray        # bool[C]
    delay_samples: np.ndarray   # float[C]
    doppler_hz: np.ndarray      # float[C]
    test_stat: np.ndarray       # float[C]
    samplestamp: int = 0


def _doppler_wipeoffs(cfg: AcqConfig) -> np.ndarray:
    n = np.arange(cfg.fft_size, dtype=np.float64)
    f = cfg.doppler_bins_hz()[:, None]
    return np.exp(-2j * np.pi * f * n[None, :] / cfg.fs_hz).astype(np.complex64)


def _flat_argmax(flat):
    """Per-row (max, argmax) using only plain min/max reductions.

    NOTE: jnp.argmax (variadic reduce) and jnp.take_along_axis hit
    UNIMPLEMENTED paths in the TPU backend when fused into FFT programs;
    equality-select + iota-min is the portable formulation.
    """
    peak = jnp.max(flat, axis=-1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 1)
    arg = jnp.min(jnp.where(flat >= peak, iota, jnp.int32(flat.shape[-1])),
                  axis=-1)
    return peak[:, 0], arg


@functools.partial(jax.jit, static_argnames=("eff", "spc", "samples_per_chip"))
def _pcps_core(
    x_p: jax.Array,            # [F, 2] float32 planar input block (padded)
    code_fft_conj_p: jax.Array,  # [C, F, 2] float32 planar conj(FFT(code))
    wipeoffs_p: jax.Array,     # [D, F, 2] float32 planar Doppler wipe-offs
    prev_grid: jax.Array,      # [C, D, eff] float32 accumulated dwells
    eff: int,
    spc: int,                  # samples per code
    samples_per_chip: int,
):
    """One non-coherent dwell over the full (channel, Doppler) grid.

    Boundary data is planar float32 (utils.planar — the TPU backend has no
    complex transfers); all complex math stays inside the program.  Returns
    (grid, stats) where grid accumulates |corr|^2 and stats holds the
    per-channel CFAR + peak-ratio statistics and peak locations.
    """
    from ..utils.planar import unpack_complex

    x = unpack_complex(x_p)
    code_fft_conj = unpack_complex(code_fft_conj_p)
    wipeoffs = unpack_complex(wipeoffs_p)
    f32 = jnp.float32
    C = code_fft_conj.shape[0]
    D = wipeoffs.shape[0]
    F = x.shape[-1]
    # carrier wipe-off for every Doppler bin: [D, F]
    xw = x[None, :] * wipeoffs
    X = jnp.fft.fft(xw, axis=-1)                      # [D, F]
    # channel-batched circular correlation: [C, D, F]
    Z = X[None, :, :] * code_fft_conj[:, None, :]
    z = jnp.fft.ifft(Z, axis=-1)
    grid = prev_grid + (z.real[..., :eff] ** 2 + z.imag[..., :eff] ** 2)

    # global peak per channel over (D, eff)
    peak, arg = _flat_argmax(grid.reshape(C, -1))
    d_idx = arg // eff
    t_idx = arg % eff

    # CFAR statistic
    input_power = jnp.mean(x.real**2 + x.imag**2).astype(f32)
    stat_cfar = peak / (f32(F) * f32(F) * input_power)

    # peak ratio: zero a +-1 chip circular window in the peak's Doppler row
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (C, D), 1)
              == d_idx[:, None]).astype(f32)
    row = jnp.einsum("cd,cde->ce", onehot, grid)      # [C, eff]
    lag = jax.lax.broadcasted_iota(jnp.int32, (C, eff), 1)
    dist = jnp.abs(lag - t_idx[:, None])
    dist = jnp.minimum(dist, eff - dist)              # circular distance
    excl = dist <= samples_per_chip
    second = jnp.max(jnp.where(excl, f32(0), row), axis=-1)
    stat_ratio = peak / jnp.maximum(second, jnp.finfo(f32).tiny)

    delay = jnp.mod(t_idx, spc).astype(f32)
    return grid, (stat_cfar, stat_ratio, delay, d_idx, input_power)


@functools.partial(jax.jit, static_argnames=("eff", "spc", "n_bins2"))
def _pcps_step2(
    x_p: jax.Array,            # [F, 2] planar
    code_fft_conj_p: jax.Array,  # [C, F, 2] planar
    doppler_center: jax.Array,  # [C] coarse Doppler per channel
    prev_grid: jax.Array,      # [C, D2, eff] accumulated fine dwells
    step2_hz: float,
    eff: int,
    spc: int,
    n_bins2: int,
    fs_hz: float,
):
    """Fine-Doppler second pass on a narrow per-channel grid (d_step_two).

    Accumulates non-coherently over dwells like the coarse pass — one dwell
    window can carry a secondary-code / nav-bit sign flip (BeiDou NH20 flips
    every code period) that splits or shifts the Doppler peak; summing
    |corr|^2 over dwells with different flip positions restores it."""
    from ..utils.planar import unpack_complex

    x = unpack_complex(x_p)
    code_fft_conj = unpack_complex(code_fft_conj_p)
    F = x.shape[-1]
    n = jnp.arange(F, dtype=jnp.float32)
    k = jnp.arange(n_bins2, dtype=jnp.float32) - jnp.floor(n_bins2 / 2.0)
    # per-channel grid of fine Doppler bins: [C, D2]
    freqs = doppler_center[:, None] + k[None, :] * step2_hz
    phase = -2.0 * jnp.pi * freqs[..., None] * n[None, None, :] / fs_hz
    wipe = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    X = jnp.fft.fft(x[None, None, :] * wipe, axis=-1)          # [C, D2, F]
    z = jnp.fft.ifft(X * code_fft_conj[:, None, :], axis=-1)
    grid = prev_grid + z.real[..., :eff] ** 2 + z.imag[..., :eff] ** 2
    C = grid.shape[0]
    _, arg = _flat_argmax(grid.reshape(C, -1))
    d_idx = arg // eff
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (C, n_bins2), 1)
              == d_idx[:, None]).astype(jnp.float32)
    fine_doppler = jnp.sum(onehot * freqs, axis=-1)
    delay = jnp.mod(arg % eff, spc).astype(jnp.float32)
    return grid, (delay, fine_doppler)


@jax.jit
def _pack_stats(stats):
    """[4, C] f32: cfar, ratio, delay, doppler-bin index (one transfer)."""
    stat_cfar, stat_ratio, delay, d_idx, _ = stats
    return jnp.stack([stat_cfar, stat_ratio, delay,
                      d_idx.astype(jnp.float32)])


@jax.jit
def _pack_fine(fine):
    """[2, C] f32: fine delay + Doppler (one transfer)."""
    return jnp.stack([fine[0].astype(jnp.float32),
                      fine[1].astype(jnp.float32)])


class PcpsAcquisition:
    """Multi-channel PCPS engine: one instance per (signal, fs) pair.

    Precomputes conj(FFT(code)) for the requested PRNs and the Doppler
    wipe-off grid; `acquire()` runs every channel x Doppler bin in one jitted
    call, replacing the reference's per-channel worker threads
    (pcps_acquisition.cc:941, thread launch :1045).
    """

    def __init__(self, cfg: AcqConfig, codes_by_prn: dict[int, np.ndarray],
                 fs_code_rate: tuple[float, int] | None = None,
                 freq_offsets_by_prn: dict[int, float] | None = None):
        """`codes_by_prn`: PRN -> +-1 chip array (1 sample/chip).
        `fs_code_rate`: (code_rate_chips_s, code_length_chips) used to
        resample chips to fs; if None, codes are assumed pre-sampled at fs
        with exactly cfg.samples_per_code samples.
        `freq_offsets_by_prn`: per-channel constant carrier offset
        (GLONASS FDMA k*DFRQ, pcps_acquisition.cc:277-283 is_fdma()) —
        folded into the stored replica as exp(+j*2*pi*f0*n/fs), so one
        batched grid searches every slot's own band at zero extra cost;
        reported Doppler stays the residual vs the slot carrier."""
        from ..codes.sampling import resample_code

        self.cfg = cfg
        self.prns = sorted(codes_by_prn)
        self.freq_offsets = {
            p: float((freq_offsets_by_prn or {}).get(p, 0.0))
            for p in self.prns}
        F = cfg.fft_size
        sampled = []
        periods = []
        for prn in self.prns:
            chips = codes_by_prn[prn]
            if fs_code_rate is not None:
                rate, _ = fs_code_rate
                one_period = resample_code(chips, cfg.fs_hz, rate,
                                           cfg.samples_per_code)
            else:
                one_period = np.asarray(chips)
                if len(one_period) != cfg.samples_per_code:
                    raise ValueError("pre-sampled code length mismatch")
            # coherent window = sampled_ms periods, zero-padded to fft_size
            rep = np.tile(one_period, cfg.sampled_ms).astype(np.complex128)
            f0 = self.freq_offsets[prn]
            if f0:
                n = np.arange(len(rep), dtype=np.float64)
                rep = rep * np.exp(2j * np.pi * f0 * n / cfg.fs_hz)
            buf = np.zeros(F, dtype=np.complex64)
            buf[: len(rep)] = rep
            sampled.append(np.conj(np.fft.fft(buf)).astype(np.complex64))
            periods.append(np.asarray(one_period, dtype=np.complex64))
        from ..utils.planar import to_planar

        # one-period time-domain replica bank (variants.FineDopplerAcquisition
        # reuses it for the code wipe-off)
        self._codes_time_planar = jnp.asarray(to_planar(np.stack(periods)))
        self._code_fft_conj = jnp.asarray(to_planar(np.stack(sampled)))
        self._wipeoffs = jnp.asarray(to_planar(_doppler_wipeoffs(cfg)))
        self._threshold = cfg.derived_threshold() if cfg.use_cfar else cfg.threshold
        self._doppler_bins = cfg.doppler_bins_hz()

    def acquire(self, samples: np.ndarray, samplestamp: int = 0) -> AcqResult:
        """Acquire all channels from `samples` (>= max_dwells * coherent
        window, complex64 at fs)."""
        from ..utils.planar import to_planar

        cfg = self.cfg
        F = cfg.fft_size
        need = cfg.coherent_samples
        grid = jnp.zeros(
            (len(self.prns), cfg.num_doppler_bins, cfg.effective_size),
            dtype=jnp.float32,
        )
        stats = None
        for dwell in range(cfg.max_dwells):
            start = dwell * need
            blk = np.zeros(F, dtype=np.complex64)
            chunk = samples[start : start + F]
            blk[: len(chunk)] = chunk
            grid, stats = _pcps_core(
                jnp.asarray(to_planar(blk)), self._code_fft_conj,
                self._wipeoffs, grid,
                cfg.effective_size, cfg.samples_per_code, cfg.samples_per_chip,
            )
        # single packed d2h: the dev tunnel charges ~27 ms latency PER
        # transfer, so the four [C] result rows ride one [4, C] array
        # (input_power stays on device — unused here)
        packed = _pack_stats(stats)
        stat_cfar, stat_ratio, delay, didx_f = np.asarray(packed)
        d_idx = didx_f.astype(np.int64)
        doppler = self._doppler_bins[d_idx]
        test_stat = stat_cfar if cfg.use_cfar else stat_ratio

        if cfg.make_two_steps:
            grid2 = jnp.zeros(
                (len(self.prns), cfg.num_doppler_bins_step2,
                 cfg.effective_size), dtype=jnp.float32)
            doppler_c = jnp.asarray(doppler, dtype=jnp.float32)
            fine = None
            for dwell in range(cfg.max_dwells):
                start = dwell * need
                blk = np.zeros(F, dtype=np.complex64)
                chunk = samples[start : start + F]
                blk[: len(chunk)] = chunk
                grid2, fine = _pcps_step2(
                    jnp.asarray(to_planar(blk)), self._code_fft_conj,
                    doppler_c, grid2,
                    cfg.doppler_step2_hz, cfg.effective_size,
                    cfg.samples_per_code, cfg.num_doppler_bins_step2,
                    cfg.fs_hz,
                )
            delay, doppler = np.asarray(_pack_fine(fine))

        return AcqResult(
            positive=np.asarray(test_stat) > self._threshold,
            delay_samples=np.asarray(delay, dtype=np.float64),
            doppler_hz=np.asarray(doppler, dtype=np.float64),
            test_stat=np.asarray(test_stat, dtype=np.float64),
            samplestamp=samplestamp,
        )

    def acquire_tong(self, samples: np.ndarray, tong_init: int = 2,
                     tong_max: int = 10, max_dwells: int = 30,
                     samplestamp: int = 0) -> AcqResult:
        """Tong sequential detector (pcps_tong_acquisition_cc analogue).

        Per-channel counter starts at `tong_init`; each single-dwell
        statistic above threshold increments it, below decrements; reaching
        `tong_max` declares the satellite present, reaching 0 absent.
        Sequential detection reaches a decision in far fewer dwells than a
        fixed-dwell test at the same Pfa (Tong 1973).
        """
        cfg = self.cfg
        F = cfg.fft_size
        need = cfg.coherent_samples
        C = len(self.prns)
        from ..utils.planar import to_planar

        counters = np.full(C, tong_init, dtype=np.int64)
        decided = np.zeros(C, dtype=bool)
        positive = np.zeros(C, dtype=bool)
        best = {
            "delay": np.zeros(C), "doppler": np.zeros(C), "stat": np.zeros(C)
        }
        zero_grid = jnp.zeros(
            (C, cfg.num_doppler_bins, cfg.effective_size), dtype=jnp.float32)
        for dwell in range(max_dwells):
            start = dwell * need
            if start + 1 > len(samples):
                break
            blk = np.zeros(F, dtype=np.complex64)
            chunk = samples[start : start + F]
            blk[: len(chunk)] = chunk
            _, stats = _pcps_core(
                jnp.asarray(to_planar(blk)), self._code_fft_conj,
                self._wipeoffs, zero_grid, cfg.effective_size,
                cfg.samples_per_code, cfg.samples_per_chip)
            stat_cfar, stat_ratio, delay, didx_f = np.asarray(
                _pack_stats(stats))
            d_idx = didx_f.astype(np.int64)
            stat = stat_cfar if cfg.use_cfar else stat_ratio
            hit = stat > self._threshold
            upd = ~decided
            counters[upd & hit] += 1
            counters[upd & ~hit] -= 1
            better = upd & (stat > best["stat"])
            best["stat"][better] = stat[better]
            best["delay"][better] = delay[better]
            best["doppler"][better] = self._doppler_bins[d_idx][better]
            newly_pos = upd & (counters >= tong_max)
            newly_neg = upd & (counters <= 0)
            positive[newly_pos] = True
            decided |= newly_pos | newly_neg
            if decided.all():
                break
        return AcqResult(
            positive=positive,
            delay_samples=best["delay"],
            doppler_hz=best["doppler"],
            test_stat=best["stat"],
            samplestamp=samplestamp,
        )

    @property
    def threshold(self) -> float:
        return self._threshold
