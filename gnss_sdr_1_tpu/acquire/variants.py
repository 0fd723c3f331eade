"""Acquisition strategy variants: QuickSync, CCCWSR, fine-Doppler, 8 ms,
and E5a noncoherent-IQ CAF.

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
* Fine-Doppler — pcps_acquisition_fine_doppler_cc.cc:estimate_Doppler():
  after the coarse grid detection, wipe the code replica (rotated to the
  detected delay, tiled over prn_replicas=10 periods) off the signal and
  take a zero_padding_factor=8 zero-padded FFT; the magnitude peak is the
  fine Doppler, accepted when within 1 kHz of the coarse bin.
* 8 ms — galileo_pcps_8ms_acquisition_cc.cc: coherent integration over TWO
  E1 code periods with two replica banks, A = [code, code] and
  B = [code, -code] (a nav-symbol sign flip at the period boundary), the
  larger peak of the two wins.
* CAF — galileo_e5a_noncoherent_iq_acquisition_caf_cc.cc: noncoherent
  combining of the E5a-I (data) and E5a-Q (pilot) correlation magnitudes,
  then an optional CAF filter — a triangular-weighted moving average of the
  per-Doppler peak magnitudes over CAF_window_hz (:676-760) — smooths the
  Doppler axis to resolve the secondary-code ambiguity sidebands before the
  Doppler decision.

All run as single batched XLA programs over the full (channel, Doppler)
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


@jax.jit
def _pack3(t):
    """Stack a (stat, delay, d_idx) triple into one [3, C] f32 transfer."""
    return jnp.stack([t[0].astype(jnp.float32), t[1].astype(jnp.float32),
                      t[2].astype(jnp.float32)])


def _get3(t):
    stat, delay, didx = np.asarray(_pack3(t))
    return stat, delay, didx.astype(np.int64)



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
        stat, delay, d_idx = _get3(_quicksync_core(
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
        stat, delay, d_idx = _get3(_cccwsr_core(
            jnp.asarray(to_planar(blk)), self._data_fft, self._pilot_fft,
            self._wipeoffs, cfg.effective_size, cfg.samples_per_code))
        return AcqResult(
            positive=np.asarray(stat) > self._threshold,
            delay_samples=np.asarray(delay, dtype=np.float64),
            doppler_hz=self._doppler_bins[np.asarray(d_idx)],
            test_stat=np.asarray(stat, dtype=np.float64),
            samplestamp=samplestamp,
        )


@functools.partial(jax.jit, static_argnames=("n_rep", "pad"))
def _fine_doppler_core(x_p, codes_p, delays, fs, n_rep: int, pad: int):
    """Zero-padded FFT of the code-wiped signal (estimate_Doppler):
    x [n_rep*spc] complex, codes [C, spc] +-1, delays [C] int32.  Returns
    the peak frequency in Hz per channel."""
    x = unpack_complex(x_p)                          # [n_rep*spc]
    codes = unpack_complex(codes_p)                  # [C, spc]
    spc = codes.shape[-1]
    n = jnp.arange(spc, dtype=jnp.int32)
    # replica rotated so chip 0 lands at the detected delay, tiled n_rep x
    idx = jnp.mod(n[None, :] - delays[:, None], spc)
    rep = jnp.take_along_axis(codes, idx, axis=-1)   # [C, spc]
    rep_t = jnp.tile(rep, (1, n_rep))                # [C, n_rep*spc]
    wiped = x[None, :] * jnp.conj(rep_t)
    F = n_rep * spc * pad
    spec = jnp.fft.fft(wiped, n=F, axis=-1)
    mag = spec.real**2 + spec.imag**2
    k = jnp.argmax(mag, axis=-1)
    # fftfreq: bins [0, F/2) positive, [F/2, F) negative
    freq = jnp.where(k < F // 2, k, k - F) * (fs / F)
    return freq.astype(jnp.float32)


class FineDopplerAcquisition:
    """GPS_L1_CA_PCPS_Acquisition_Fine_Doppler analogue: coarse PCPS grid
    plus the iterative fine-Doppler FFT refinement.  Needs
    `prn_replicas` code periods of samples (10 in the reference)."""

    def __init__(self, pcps, prn_replicas: int = 10,
                 zero_padding_factor: int = 8,
                 accept_window_hz: float = 1000.0):
        """`pcps` is a configured acquire.pcps.PcpsAcquisition; its
        baseband code replicas are reused for the wipe-off."""
        self.pcps = pcps
        self.cfg = pcps.cfg
        self.prns = pcps.prns
        self.n_rep = int(prn_replicas)
        self.pad = int(zero_padding_factor)
        self.accept_hz = float(accept_window_hz)

    def acquire(self, samples: np.ndarray, samplestamp: int = 0) -> AcqResult:
        res = self.pcps.acquire(samples, samplestamp=samplestamp)
        spc = self.cfg.samples_per_code
        need = self.n_rep * spc
        blk = np.zeros(need, dtype=np.complex64)
        chunk = samples[:need]
        blk[: len(chunk)] = chunk
        # wipe off the residual coarse Doppler so the fine FFT peak lands
        # at (true - coarse); the fine estimate is coarse + peak
        t = np.arange(need) / self.cfg.fs_hz
        coarse = np.asarray(res.doppler_hz, dtype=np.float64)
        delays = np.mod(np.round(res.delay_samples), spc).astype(np.int32)
        freqs = np.empty(len(self.prns), dtype=np.float64)
        wiped = blk[None, :] * np.exp(-2j * np.pi * coarse[:, None]
                                      * t[None, :]).astype(np.complex64)
        resid = np.asarray(jax.device_get(_fine_doppler_core(
            jnp.asarray(to_planar(wiped.astype(np.complex64))),
            self.pcps._codes_time_planar, jnp.asarray(delays),
            self.cfg.fs_hz, self.n_rep, self.pad)), dtype=np.float64)
        fine = coarse + resid
        # accept only refinements within the window (estimate_Doppler's
        # 1 kHz sanity gate)
        freqs = np.where(np.abs(fine - coarse) < self.accept_hz, fine, coarse)
        return AcqResult(
            positive=res.positive,
            delay_samples=res.delay_samples,
            doppler_hz=np.where(res.positive, freqs, res.doppler_hz),
            test_stat=res.test_stat,
            samplestamp=res.samplestamp,
        )


@functools.partial(jax.jit, static_argnames=("eff", "spc"))
def _pcps_8ms_core(x_p, fft_a_p, fft_b_p, wipeoffs_p, eff: int, spc: int):
    """Two-replica 8 ms coherent PCPS (galileo_pcps_8ms_acquisition_cc):
    bank A = [code, code], bank B = [code, -code]; larger peak wins."""
    x = unpack_complex(x_p)                    # [F]
    fa = unpack_complex(fft_a_p)               # [C, F]
    fb = unpack_complex(fft_b_p)
    wip = unpack_complex(wipeoffs_p)           # [D, F]
    f32 = jnp.float32
    C = fa.shape[0]
    F = x.shape[-1]

    X = jnp.fft.fft(x[None, :] * wip, axis=-1)          # [D, F]
    za = jnp.fft.ifft(X[None] * fa[:, None], axis=-1)   # [C, D, F]
    zb = jnp.fft.ifft(X[None] * fb[:, None], axis=-1)
    mag = jnp.maximum(za.real**2 + za.imag**2,
                      zb.real**2 + zb.imag**2)[..., :eff]
    peak, arg = _flat_argmax(mag.reshape(C, -1))
    d_idx = arg // eff
    t_idx = arg % eff
    input_power = jnp.mean(x.real**2 + x.imag**2).astype(f32)
    stat = peak / (f32(F) * f32(F) * input_power)
    return stat, jnp.mod(t_idx, spc).astype(f32), d_idx


class Pcps8msAcquisition:
    """Galileo_E1_PCPS_8ms_Ambiguous_Acquisition analogue: coherent
    integration over two 4 ms E1 code periods with a sign-flip replica."""

    def __init__(self, cfg: AcqConfig, codes_by_prn: dict[int, np.ndarray]):
        """Codes pre-sampled at fs (cfg.samples_per_code per period);
        cfg.sampled_ms must be 2 code periods (8 ms for E1)."""
        self.cfg = cfg
        self.prns = sorted(codes_by_prn)
        F = cfg.fft_size
        spc = cfg.samples_per_code

        rows_a, rows_b = [], []
        for prn in self.prns:
            code = np.asarray(codes_by_prn[prn], dtype=np.complex128)[:spc]
            for rows, sign in ((rows_a, 1.0), (rows_b, -1.0)):
                buf = np.zeros(F, dtype=np.complex64)
                rep = np.concatenate([code, sign * code])
                buf[: len(rep)] = rep
                rows.append(np.conj(np.fft.fft(buf)).astype(np.complex64))
        self._fft_a = jnp.asarray(to_planar(np.stack(rows_a)))
        self._fft_b = jnp.asarray(to_planar(np.stack(rows_b)))
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
        stat, delay, d_idx = _get3(_pcps_8ms_core(
            jnp.asarray(to_planar(blk)), self._fft_a, self._fft_b,
            self._wipeoffs, 2 * cfg.samples_per_code, cfg.samples_per_code))
        return AcqResult(
            positive=np.asarray(stat) > self._threshold,
            delay_samples=np.asarray(delay, dtype=np.float64),
            doppler_hz=self._doppler_bins[np.asarray(d_idx)],
            test_stat=np.asarray(stat, dtype=np.float64),
            samplestamp=samplestamp,
        )


@functools.partial(jax.jit, static_argnames=("eff",))
def _caf_iq_core(x_p, fft_i_p, fft_q_p, wipeoffs_p, caf_half: jnp.ndarray,
                 eff: int):
    """Noncoherent I/Q grid + CAF Doppler smoothing
    (galileo_e5a_noncoherent_iq_acquisition_caf_cc acquisition_core)."""
    x = unpack_complex(x_p)
    fi = unpack_complex(fft_i_p)               # [C, F] conj FFT of E5a-I
    fq = unpack_complex(fft_q_p)               # [C, F] conj FFT of E5a-Q
    wip = unpack_complex(wipeoffs_p)           # [D, F]
    f32 = jnp.float32
    C = fi.shape[0]
    D = wip.shape[0]
    F = x.shape[-1]

    X = jnp.fft.fft(x[None, :] * wip, axis=-1)
    zi = jnp.fft.ifft(X[None] * fi[:, None], axis=-1)
    zq = jnp.fft.ifft(X[None] * fq[:, None], axis=-1)
    grid = (zi.real**2 + zi.imag**2 + zq.real**2 + zq.imag**2)[..., :eff]

    # per-Doppler peak magnitude + its delay: the CAF vectors (:538)
    caf = jnp.max(grid, axis=-1)               # [C, D]
    t_at = jnp.argmax(grid, axis=-1)           # [C, D]

    # triangular-weighted moving average over the Doppler axis (:676-760):
    # weight(1 - wf*|d-i|) over |d-i| <= caf_half, normalized by the sum of
    # in-range weights (edge-truncated), applied when caf_half > 0
    d = jnp.arange(D)
    dist = jnp.abs(d[:, None] - d[None, :]).astype(f32)   # [D, D]
    wf = 0.5 / jnp.maximum(caf_half.astype(f32), f32(1.0))
    w = jnp.where(dist <= caf_half.astype(f32), 1.0 - wf * dist, 0.0)
    smoothed = (caf @ w.T) / jnp.maximum(jnp.sum(w, axis=-1)[None, :], 1e-20)
    use_caf = caf_half > 0
    sel = jnp.where(use_caf, smoothed, caf)
    d_idx = jnp.argmax(sel, axis=-1)           # [C]
    # delay and peak read from the WINNING bin of the raw grid
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (C, D), 1)
              == d_idx[:, None])
    peak = jnp.sum(jnp.where(onehot, caf, 0.0), axis=-1)
    t_idx = jnp.sum(jnp.where(onehot, t_at, 0), axis=-1)
    input_power = jnp.mean(x.real**2 + x.imag**2).astype(f32)
    stat = peak / (f32(F) * f32(F) * input_power)
    return stat, t_idx.astype(f32), d_idx


class CafAcquisition:
    """Galileo_E5a_Noncoherent_IQ_Acquisition_CAF analogue."""

    def __init__(self, cfg: AcqConfig,
                 data_codes_by_prn: dict[int, np.ndarray],
                 pilot_codes_by_prn: dict[int, np.ndarray],
                 caf_window_hz: float = 0.0):
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

        self._fft_i = bank(data_codes_by_prn)
        self._fft_q = bank(pilot_codes_by_prn)
        self._wipeoffs = jnp.asarray(to_planar(_doppler_wipeoffs(cfg)))
        self._doppler_bins = cfg.doppler_bins_hz()
        self._caf_half = int(caf_window_hz / (2.0 * cfg.doppler_step_hz))
        self._threshold = (cfg.derived_threshold() if cfg.use_cfar
                           else cfg.threshold)

    def acquire(self, samples: np.ndarray, samplestamp: int = 0) -> AcqResult:
        cfg = self.cfg
        F = cfg.fft_size
        blk = np.zeros(F, dtype=np.complex64)
        chunk = samples[:F]
        blk[: len(chunk)] = chunk
        stat, delay, d_idx = _get3(_caf_iq_core(
            jnp.asarray(to_planar(blk)), self._fft_i, self._fft_q,
            self._wipeoffs, jnp.int32(self._caf_half), cfg.effective_size))
        return AcqResult(
            positive=np.asarray(stat) > self._threshold,
            delay_samples=np.mod(np.asarray(delay, dtype=np.float64),
                                 cfg.samples_per_code),
            doppler_hz=self._doppler_bins[np.asarray(d_idx)],
            test_stat=np.asarray(stat, dtype=np.float64),
            samplestamp=samplestamp,
        )
