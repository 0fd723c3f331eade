"""Acquisition strategy variants: QuickSync folding and CCCWSR.

Reference parity:
* QuickSync — pcps_quicksync_acquisition_cc.cc (src/algorithms/acquisition/
  gnuradio_blocks/): the signal and replica are FOLDED by summing
  `folding_factor` consecutive sub-segments (:187-200), the circular
  correlation runs at fft_size = samples_per_code / folding_factor (:95),
  and the true code phase is disambiguated among the folding_factor
  candidate delays by direct correlation against the unfolded replica
  (d_possible_delay / d_corr_output_f, :101-102).  An O(N log N / f) FFT at
  the cost of 10*log10(f) dB of folding loss.
* CCCWSR — pcps_cccwsr_acquisition_cc.cc: coherent combining of the E1B
  (data) and E1C (pilot) correlations with sign recovery — both relative
  signs of the unknown data/pilot phasing are formed, plus = data + j*pilot,
  minus = data - j*pilot (:344-352), and the larger magnitude wins.

Both run as single batched XLA programs over the full (channel, Doppler)
grid like acquire.pcps — the reference's per-bin loops collapse into one
tensor op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.planar import to_planar, unpack_complex
from .pcps import AcqConfig, AcqResult, _doppler_wipeoffs, _flat_argmax


@functools.partial(jax.jit, static_argnames=("fold", "spc"))
def _quicksync_core(x_p, codes_p, wipeoffs_p, fold: int, spc: int):
    """Folded PCPS: wipe off each Doppler bin over one code period, fold
    signal and replica by `fold`, correlate at spc/fold lags, then
    disambiguate the true delay among the `fold` candidates by direct
    correlation against the unfolded replica."""
    x = unpack_complex(x_p)                 # [spc]
    codes = unpack_complex(codes_p)         # [C, spc] +-1 replicas
    wipeoffs = unpack_complex(wipeoffs_p)   # [D, spc]
    f32 = jnp.float32
    C = codes.shape[0]
    D = wipeoffs.shape[0]
    Ff = spc // fold

    xw = x[None, :] * wipeoffs                        # [D, spc]
    xf = jnp.sum(xw.reshape(D, fold, Ff), axis=1)     # folded signal [D, Ff]
    cf = jnp.sum(codes.reshape(C, fold, Ff), axis=1)  # folded code [C, Ff]
    X = jnp.fft.fft(xf, axis=-1)
    Cf = jnp.conj(jnp.fft.fft(cf, axis=-1))
    z = jnp.fft.ifft(X[None, :, :] * Cf[:, None, :], axis=-1)   # [C, D, Ff]
    grid = z.real**2 + z.imag**2

    peak, arg = _flat_argmax(grid.reshape(C, -1))
    d_idx = arg // Ff
    t_fold = arg % Ff                                  # delay mod Ff

    # CFAR statistic: a noise cell is |Sum_n xf*cf|^2 with per-sample
    # variance fold*sigma^2 and E|cf|^2 = fold, so cell/(fold*spc*sigma^2)
    # ~ Exp(1); the folding loss (post-correlation SNR / fold) shows up in
    # the signal peak, exactly as in the reference's quicksync
    input_power = jnp.mean(x.real**2 + x.imag**2).astype(f32)
    stat = peak / (f32(fold) * f32(spc) * input_power)

    # disambiguation: candidate true delays t_fold + k*Ff, correlate the
    # unfolded wiped signal against the unfolded replica at each candidate
    onehot_d = (jax.lax.broadcasted_iota(jnp.int32, (C, D), 1)
                == d_idx[:, None]).astype(xw.dtype)
    xw_c = jnp.einsum("cd,dn->cn", onehot_d, xw)       # [C, spc] winning bin
    n = jnp.arange(spc, dtype=jnp.int32)
    k = jnp.arange(fold, dtype=jnp.int32)
    # rolled replica index for candidate k: (n - (t_fold + k*Ff)) mod spc
    idx = jnp.mod(n[None, None, :] - (t_fold[:, None, None]
                                      + k[None, :, None] * Ff), spc)
    cand_codes = jnp.take_along_axis(
        codes[:, None, :].repeat(fold, axis=1), idx, axis=-1)  # [C, fold, spc]
    cc = jnp.einsum("cn,ckn->ck", xw_c, cand_codes.astype(xw.dtype))
    cmag = cc.real**2 + cc.imag**2
    _, kbest = _flat_argmax(cmag)
    delay = (t_fold + kbest * Ff).astype(f32)
    return stat, delay, d_idx


class QuickSyncAcquisition:
    """GPS_L1_CA_PCPS_QuickSync_Acquisition /
    Galileo_E1_PCPS_QuickSync_Ambiguous_Acquisition analogue."""

    def __init__(self, cfg: AcqConfig, codes_by_prn: dict[int, np.ndarray],
                 folding_factor: int = 2,
                 fs_code_rate: tuple[float, int] | None = None):
        from ..codes.sampling import resample_code

        if cfg.samples_per_code % folding_factor:
            raise ValueError("samples_per_code must divide by folding_factor")
        self.cfg = cfg
        self.fold = int(folding_factor)
        self.prns = sorted(codes_by_prn)
        rows = []
        for prn in self.prns:
            chips = codes_by_prn[prn]
            if fs_code_rate is not None:
                rate, _ = fs_code_rate
                rows.append(resample_code(chips, cfg.fs_hz, rate,
                                          cfg.samples_per_code))
            else:
                rows.append(np.asarray(chips, dtype=np.float32))
        self._codes = jnp.asarray(to_planar(
            np.stack(rows).astype(np.complex64)))
        wip = _doppler_wipeoffs(cfg)[:, : cfg.samples_per_code]
        self._wipeoffs = jnp.asarray(to_planar(np.ascontiguousarray(wip)))
        self._doppler_bins = cfg.doppler_bins_hz()
        if cfg.use_cfar and cfg.pfa > 0.0:
            # Exp(1)-normalized cells: threshold is the (1-pfa)^(1/ncells)
            # quantile of the unit exponential over the FOLDED grid
            import math
            ncells = (cfg.samples_per_code // self.fold) * cfg.num_doppler_bins
            val = (1.0 - cfg.pfa) ** (1.0 / ncells)
            self._threshold = float(-math.log1p(-val))
        else:
            self._threshold = cfg.threshold

    def acquire(self, samples: np.ndarray, samplestamp: int = 0) -> AcqResult:
        spc = self.cfg.samples_per_code
        blk = np.zeros(spc, dtype=np.complex64)
        chunk = samples[:spc]
        blk[: len(chunk)] = chunk
        stat, delay, d_idx = jax.device_get(_quicksync_core(
            jnp.asarray(to_planar(blk)), self._codes, self._wipeoffs,
            self.fold, spc))
        return AcqResult(
            positive=np.asarray(stat) > self._threshold,
            delay_samples=np.asarray(delay, dtype=np.float64),
            doppler_hz=self._doppler_bins[np.asarray(d_idx)],
            test_stat=np.asarray(stat, dtype=np.float64),
            samplestamp=samplestamp,
        )


@functools.partial(jax.jit, static_argnames=("eff", "spc"))
def _cccwsr_core(x_p, data_fft_p, pilot_fft_p, wipeoffs_p, eff: int, spc: int):
    """Coherent data+pilot combining with sign recovery (:297-360)."""
    x = unpack_complex(x_p)
    data_fft = unpack_complex(data_fft_p)     # [C, F] conj(FFT(E1B code))
    pilot_fft = unpack_complex(pilot_fft_p)   # [C, F] conj(FFT(E1C code))
    wipeoffs = unpack_complex(wipeoffs_p)     # [D, F]
    f32 = jnp.float32
    C = data_fft.shape[0]
    F = x.shape[-1]

    X = jnp.fft.fft(x[None, :] * wipeoffs, axis=-1)        # [D, F]
    zd = jnp.fft.ifft(X[None] * data_fft[:, None], axis=-1)   # [C, D, F]
    zp = jnp.fft.ifft(X[None] * pilot_fft[:, None], axis=-1)
    # plus = data + j*pilot, minus = data - j*pilot (:344-352)
    plus = zd + 1j * zp
    minus = zd - 1j * zp
    mag = jnp.maximum(plus.real**2 + plus.imag**2,
                      minus.real**2 + minus.imag**2)[..., :eff]

    peak, arg = _flat_argmax(mag.reshape(C, -1))
    d_idx = arg // eff
    t_idx = arg % eff
    input_power = jnp.mean(x.real**2 + x.imag**2).astype(f32)
    stat = peak / (f32(F) * f32(F) * input_power)
    delay = jnp.mod(t_idx, spc).astype(f32)
    return stat, delay, d_idx


class CccwsrAcquisition:
    """Galileo_E1_PCPS_CCCWSR_Ambiguous_Acquisition analogue: coherently
    combines the E1B (data) and E1C (pilot) components with sign recovery."""

    def __init__(self, cfg: AcqConfig,
                 data_codes_by_prn: dict[int, np.ndarray],
                 pilot_codes_by_prn: dict[int, np.ndarray]):
        """Codes pre-sampled at fs (cfg.samples_per_code samples/period)."""
        self.cfg = cfg
        self.prns = sorted(data_codes_by_prn)
        F = cfg.fft_size

        def bank(codes):
            rows = []
            for prn in self.prns:
                rep = np.tile(np.asarray(codes[prn], dtype=np.complex128),
                              cfg.sampled_ms)
                buf = np.zeros(F, dtype=np.complex64)
                buf[: len(rep)] = rep
                rows.append(np.conj(np.fft.fft(buf)).astype(np.complex64))
            return jnp.asarray(to_planar(np.stack(rows)))

        self._data_fft = bank(data_codes_by_prn)
        self._pilot_fft = bank(pilot_codes_by_prn)
        self._wipeoffs = jnp.asarray(to_planar(_doppler_wipeoffs(cfg)))
        self._doppler_bins = cfg.doppler_bins_hz()
        self._threshold = (cfg.derived_threshold() if cfg.use_cfar
                           else cfg.threshold)

    def acquire(self, samples: np.ndarray, samplestamp: int = 0) -> AcqResult:
        cfg = self.cfg
        F = cfg.fft_size
        blk = np.zeros(F, dtype=np.complex64)
        chunk = samples[:F]
        blk[: len(chunk)] = chunk
        stat, delay, d_idx = jax.device_get(_cccwsr_core(
            jnp.asarray(to_planar(blk)), self._data_fft, self._pilot_fft,
            self._wipeoffs, cfg.effective_size, cfg.samples_per_code))
        return AcqResult(
            positive=np.asarray(stat) > self._threshold,
            delay_samples=np.asarray(delay, dtype=np.float64),
            doppler_hz=self._doppler_bins[np.asarray(d_idx)],
            test_stat=np.asarray(stat, dtype=np.float64),
            samplestamp=samplestamp,
        )
