"""Channel-batched scan-carried tracking engine.

Reference parity: dll_pll_veml_tracking.cc (src/algorithms/tracking/
gnuradio_blocks/).  The reference runs one GNU Radio thread per channel with a
state machine in general_work (:1544-1900); here every channel advances in
lock-step through integration epochs inside one jitted call per sample
block, with the multicorrelator vmapped across channels (SURVEY.md §2.7 TPU
mapping).  The channel lifecycle FSM (acquisition -> pull-in -> track ->
drop) lives on HOST between blocks; the device carries only branch-light
per-channel loop state.

Tracking states (reference general_work :1544-1900):
  state 1 pull-in       -> activate_channel (host)
  state 2 wide          -> mode 0: per-epoch loop closure, wide bandwidths,
                           optional FLL transitory
  state 3/4 narrow ext. -> mode 1 via enable_extended (host, after bit /
                           secondary sync): coherent accumulation over
                           extend_correlation_symbols epochs aligned to the
                           channel's bit grid, loop closed once per window
                           with the NARROW bandwidths (:1774-1900), optional
                           in-loop secondary wipe-off + four-quadrant PLL
                           (start_tracking pilot setup :549-660).

Numerical contracts implemented exactly (SURVEY.md Appendix A):
  A.2 floor code resampler      A.3 discriminators
  A.4 carrier-aided code NCO    A.5 loop filters (FLL-assisted PLL + IIR DLL)
  A.6 NCO stepping & variable block length (floor/remainder recursion,
      computed in split precision so float32 device math stays < 1e-6
      samples/epoch of the reference's double recursion)
  A.7 CN0 SNV estimator + carrier lock detector + max_lock_fail counter

Variable block length: the reference consumes d_current_prn_length_samples
(varies +-1-2 samples with code Doppler) per GR work call; here each epoch
slices a fixed `epoch_samples_max` window at the channel's `start` index and
masks samples beyond `cur_len` (SURVEY.md §7 hard part 1).

Chunked correlation (correlator='fft', the TPU fast path): per-epoch
dispatch dominates wall time on TPU (PERF.md), so `chunk_epochs` epochs are
correlated in ONE batched FFT pass per device-loop iteration using the
chunk-entry NCO rates (the frozen/predicted frame), then an exact unrolled
per-epoch scalar chain reproduces the sequential loop closures, reading each
epoch's taps from the batched lag window and rotating them into the
channel's true-NCO frame (the known frozen-vs-true phase difference).  NCO
corrections computed inside a chunk steer the correlation of the NEXT chunk
— within-chunk rate drift is measured and corrected, only its wipe-off
amplitude effect is neglected (< 0.01 dB for the < 50 Hz of drift a loop
update can introduce over one chunk).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.multicorrelator import multicorrelate
from ..utils.planar import pack_complex, to_planar, unpack_complex
from .config import TrackConfig
from .discriminators import (
    dll_nc_e_minus_l_normalized,
    dll_nc_vemlp_normalized,
    fll_four_quadrant_atan,
    pll_cloop_two_quadrant_atan,
    pll_four_quadrant_atan,
)
from .loop_filter import (
    FllPllCoeffs,
    FllPllState,
    IirState,
    fll_pll_apply,
    fll_pll_coefficients,
    iir_apply,
    iir_coefficients,
)

_TWO_PI = 2.0 * np.pi


class TrackState(NamedTuple):
    """Per-channel loop state carried across epochs and blocks ([C] each).
    Complex quantities are planar float32 [..., 2] (utils.planar) so the
    state crosses the host<->device boundary without complex transfers."""

    active: jnp.ndarray            # bool — channel is tracking
    prn_slot: jnp.ndarray          # int32 index into the code table
    start: jnp.ndarray             # int32 next epoch start (block-relative)
    cur_len: jnp.ndarray           # int32 current integration length
    rem_code_phase_samples: jnp.ndarray  # f32
    code_freq_delta: jnp.ndarray   # f32 code_freq - chip_rate [chips/s]
    carrier_doppler_hz: jnp.ndarray  # f32
    rem_carr_phase_rad: jnp.ndarray  # f32
    carr_filter: FllPllState       # (w, x) each [C]
    code_filter: IirState          # (inputs[C,3], outputs[C,3])
    prev_prompt: jnp.ndarray       # f32 [C, 2] — previous Prompt (FLL)
    # CN0/lock window accumulators over the current non-overlapping
    # cn0_samples window (the reference evaluates the detectors on
    # non-overlapping prompt buffers, cn0_and_tracking_lock_status :839;
    # running sums replace the sliding buffer — the SNV estimator and the
    # carrier lock detector are functions of (sum|I|, sum I^2, sum Q^2))
    s_absi: jnp.ndarray            # f32 sum |Re P| this window
    s_i2: jnp.ndarray              # f32 sum Re^2 this window
    s_q2: jnp.ndarray              # f32 sum Im^2 this window
    cn0_last: jnp.ndarray          # f32 latest completed-window CN0 [dB-Hz]
    push_count: jnp.ndarray        # int32 total loop-closure prompts pushed
    lock_fail: jnp.ndarray         # int32 consecutive lock failures
    epochs_in_track: jnp.ndarray   # int32 epochs since pull-in
    fll_on: jnp.ndarray            # bool — FLL pull-in transitory active
    mode: jnp.ndarray              # int32 0=wide (state 2), 1=narrow/extended
    ext_cnt: jnp.ndarray           # int32 epochs in the current ext. window
    acc_corr: jnp.ndarray          # f32 [C, K, 2] coherent tap accumulator
    acc_half: jnp.ndarray          # f32 [C, 2] prompt acc at mid-window (FLL)
    sec_on: jnp.ndarray            # bool — in-loop secondary wipe active
    sec_idx: jnp.ndarray           # int32 secondary-code chip index
    # f32 — constant per-channel carrier bias added to the NCO phase step
    # but excluded from carrier aiding and the reported Doppler: GLONASS
    # FDMA slot offset k*DFRQ (pcps_acquisition.cc:277-283 is_fdma(),
    # glonass_l1_ca_dll_pll_tracking)
    carr_offset_hz: jnp.ndarray


class TrackOutputs(NamedTuple):
    """Per-epoch streamed outputs ([E, C, ...] after scan) — the
    Gnss_Synchro tracking fields (gnss_synchro.h:44-81)."""

    valid: jnp.ndarray             # bool — epoch processed
    start: jnp.ndarray             # int32 epoch start sample (block-relative)
    cur_len: jnp.ndarray           # int32 samples integrated
    correlators: jnp.ndarray       # f32 [E, C, K, 2] planar complex
    carrier_doppler_hz: jnp.ndarray
    code_freq_delta: jnp.ndarray   # chips/s above nominal
    rem_code_phase_samples: jnp.ndarray  # code phase at NEXT epoch start
    rem_carr_phase_rad: jnp.ndarray      # carrier phase at NEXT epoch start
    cn0_dbhz: jnp.ndarray
    active: jnp.ndarray            # still tracking after this epoch


class SymbolOutputs(NamedTuple):
    """Symbol-grid compact capture outputs ([S, C] each; S symbol slots of
    `sym_n` epochs).  The device reduces per-epoch outputs onto the known
    bit/secondary grid before readback — one Gnss_Synchro-rate record per
    integration period instead of per code period, the reference's output
    cadence (gnss_synchro.h:44-81 — one record per integration, not per ms).
    Slot 0 is the partial head finishing the previous segment's symbol;
    slots with vcount == sym_n are complete symbols."""

    start: jnp.ndarray        # i32 start sample of the slot's first epoch
    mean_i: jnp.ndarray       # f32 mean prompt I over the slot's epochs
    mean_q: jnp.ndarray       # f32 mean prompt Q
    frac: jnp.ndarray         # f32 pre-wrap rem_code fraction entering slot
    rem_carr_phase_rad: jnp.ndarray  # f32 NCO ledger entering the slot
    carrier_doppler_hz: jnp.ndarray
    cn0_dbhz: jnp.ndarray
    code_freq_delta: jnp.ndarray
    vcount: jnp.ndarray       # i32 valid epochs in the slot (<= sym_n)
    n_valid: jnp.ndarray      # i32 [C] total valid epochs this segment
    active: jnp.ndarray       # bool [C] channel still tracking at the end


def _where_tree(mask, new, old):
    """Select pytree leaves per-channel: mask [C] broadcast against leading
    channel axis of every leaf."""
    def sel(n, o):
        m = mask
        while m.ndim < n.ndim:
            m = m[..., None]
        return jnp.where(m, n, o)
    return jax.tree.map(sel, new, old)


class TrackingEngine:
    """One engine per (signal type, sampling rate).

    `codes` is a [n_slots, code_len * code_samples_per_chip] float32 table of
    +-1 replicas (one row per trackable PRN); channels reference rows via
    `prn_slot`, so host-side satellite reassignment is an int update —
    the analogue of flowgraph satellite recycling (gnss_flowgraph.cc:1076).

    `sec_codes` (optional [n_slots, sec_len] +-1) are the per-slot secondary
    codes for in-loop wipe-off once the host reports secondary lock via
    `enable_extended` (reference start_tracking pilot setup,
    dll_pll_veml_tracking.cc:549-660 and acquire_secondary :800).
    """

    def __init__(self, cfg: TrackConfig, codes: np.ndarray,
                 sec_codes: np.ndarray | None = None):
        self.cfg = cfg
        if codes.ndim != 2:
            raise ValueError("codes must be [n_slots, code_samples]")
        self._codes = jnp.asarray(codes, dtype=jnp.float32)
        self._shifts = jnp.asarray(
            np.asarray(cfg.tap_shifts_chips(), dtype=np.float32)
            * cfg.code_samples_per_chip
        )
        if sec_codes is None:
            sec_codes = np.ones((codes.shape[0], 1), dtype=np.float32)
        if sec_codes.ndim != 2 or sec_codes.shape[0] != codes.shape[0]:
            raise ValueError("sec_codes must be [n_slots, sec_len]")
        self._sec = jnp.asarray(sec_codes, dtype=jnp.float32)
        self._sec_len = int(sec_codes.shape[1])
        # loop filter constants — wide (state 2) and narrow (states 3/4,
        # Dll_Pll_Conf *_bw_narrow_hz, dll_pll_conf.h:40-80)
        self._fllpll = fll_pll_coefficients(
            cfg.fll_bw_hz, cfg.pll_bw_hz, cfg.pll_filter_order
        )
        self._fllpll_n = fll_pll_coefficients(
            cfg.fll_bw_narrow_hz, cfg.pll_bw_narrow_hz, cfg.pll_filter_order
        )
        b_in, b_out = iir_coefficients(
            cfg.dll_bw_hz, cfg.code_period_s, cfg.dll_filter_order, False
        )
        self._dll_b_in = jnp.asarray(b_in)
        self._dll_b_out = jnp.asarray(b_out)
        t_ext = cfg.code_period_s * cfg.extend_correlation_symbols
        b_in_n, b_out_n = iir_coefficients(
            cfg.dll_bw_narrow_hz, t_ext, cfg.dll_filter_order, False
        )
        self._dll_b_in_n = jnp.asarray(b_in_n)
        self._dll_b_out_n = jnp.asarray(b_out_n)
        # split-precision code period constants (A.6)
        t0 = float(cfg.samples_per_code)
        self._t0_int = int(np.floor(t0))
        self._t0_frac = float(t0 - self._t0_int)
        # epoch window: covers the per-channel start spread (< one code
        # period) plus one max-length epoch
        self._win = cfg.epoch_samples_max + self._t0_int + 66
        # FFT-lag correlator setup (cfg.correlator == 'fft'): replica
        # template advanced by _lag_margin samples, correlation by batched
        # FFT, taps read at interpolated integer lags — no per-sample
        # gathers (which serialize on the TPU backend)
        self._lag_margin = 16
        if cfg.correlator in ("fft", "mxu", "pallas"):
            self._chunk_epochs = cfg.chunk_epochs
            E = self._chunk_epochs
            # regular-grid chunk windows: each chunk slices ONE segment per
            # channel at the frozen epoch grid (start - 2 + k*t0_int) and
            # the per-epoch drift d' = s_pred - s_reg (a few samples over a
            # chunk) is folded into the LAG axis — per-(channel,epoch)
            # dynamic slices unrolled into ~2*C*E tiny kernels per chunk
            # and dominated the device profile (PERF.md round 4)
            # s_reg = start - grid_pad: the pad covers the largest NEGATIVE
            # drift of the true epoch grid vs the regular t0_int stride
            # (high code freq shortens epochs by up to ~1 sample each, so
            # s_pred can run up to ~E samples ahead of start + k*t0_int)
            self._grid_pad = E + 4
            drift = 2 * E + 10                   # max d' = s_pred - s_reg
            self._corr_win = cfg.epoch_samples_max + drift   # NW
            F = 1
            while F < self._corr_win + 2 * self._lag_margin:
                F <<= 1
            self._fft_size = F
            a0 = cfg.chip_rate_chips_s * cfg.code_samples_per_chip / cfg.fs_hz
            lv = codes.shape[1]
            # static lag read window: pos = margin + d'(<drift) + rem(<2)
            # + |shift|*s/chip
            spc_samples = cfg.fs_hz / cfg.chip_rate_chips_s
            max_shift = max(abs(s) for s in cfg.tap_shifts_chips())
            self._lag_window = int(
                np.ceil(self._lag_margin + drift + 4
                        + max_shift * spc_samples)) + 4
            n = np.arange(F, dtype=np.float64)
            idx = np.mod(np.floor(a0 * (n + self._lag_margin)).astype(np.int64), lv)
            reps = codes[:, idx].astype(np.float32)         # [slots, F]
            # the wiped input is zero beyond NW, so circular lags l < LW
            # only ever read repF on [0, NW) and the wrap tail [F-LW, F);
            # overwrite the tail with the code at NEGATIVE phases so the
            # wrap contribution uses the correctly-phased previous code
            # period (F mod period != 0 would otherwise shift it)
            neg = np.arange(-self._lag_window, 0, dtype=np.float64)
            reps[:, F - self._lag_window:] = codes[:, np.mod(
                np.floor(a0 * (neg + self._lag_margin)).astype(np.int64),
                lv)].astype(np.float32)
            if cfg.correlator in ("mxu", "pallas"):
                # direct MXU correlation: only lag_window lags of the
                # circular correlation are ever read, so the FFT/IFFT pair
                # (VPU-bound, F = next pow2 ≥ NW) is replaced by ONE
                # batched matmul against a precomputed shifted-replica
                # matrix R[s, l, n] = code((n - l + margin)·a0 mod L) — the
                # TRUE lv-periodic code at every (lag, sample) pair, so
                # window samples below the lag index correlate against the
                # correctly-phased previous code period (the FFT pair wraps
                # mod F instead, F mod period != 0 — a small wrong-code
                # contribution over the first `pos` samples of each epoch)
                LW = self._lag_window
                ngrid = np.arange(self._corr_win)[None, :] \
                    - np.arange(LW)[:, None]
                chip_idx = np.floor(
                    a0 * (ngrid + self._lag_margin)).astype(np.int64)
                self._rep_rows = jnp.asarray(
                    codes[:, np.mod(chip_idx, lv)].astype(
                        np.float32))                        # [slots, LW, NW]
            else:
                rep_fft_conj = np.conj(
                    np.fft.fft(reps, axis=1)).astype(np.complex64)
                self._rep_fft_conj_planar = jnp.asarray(
                    np.stack([rep_fft_conj.real, rep_fft_conj.imag], axis=-1))
        else:
            # per-epoch gather path: small inline factor amortizes loop
            # dispatch without blowing up the compiled body
            self._chunk_epochs = 4
        self._fll_epochs = int(round(cfg.pull_in_time_s / cfg.code_period_s))
        if cfg.correlator == "pallas":
            from ..ops import pallas_chain as pc

            w, n = self._fllpll, self._fllpll_n
            # Mosaic wants native 128-lane vectors: sub-width bool vectors
            # (e.g. vector<12xi1>) hit unsupported truncations, so the
            # kernel's channel axis is padded to the lane width; dead lanes
            # carry active=0 and never merge into live ones
            self._c_pad = max(128, -(-cfg.n_channels // 128) * 128)
            self._chain_spec = pc.ChainSpec(
                E=self._chunk_epochs, LW=self._lag_window, K=cfg.n_taps,
                C=self._c_pad, sec_len=self._sec_len,
                prompt_index=cfg.prompt_index, veml=cfg.veml,
                sec_data=cfg.sec_data,
                lag_margin=float(self._lag_margin),
                spc_samples=float(cfg.fs_hz / cfg.chip_rate_chips_s),
                shifts_chips=tuple(float(s) for s in cfg.tap_shifts_chips()),
                fs=float(cfg.fs_hz), chip_rate=float(cfg.chip_rate_chips_s),
                carrier_freq=float(cfg.carrier_freq_hz),
                t0_int=self._t0_int, t0_frac=self._t0_frac,
                code_period_s=float(cfg.code_period_s),
                ext_n=int(cfg.extend_correlation_symbols),
                cn0_samples=int(cfg.cn0_samples),
                cn0_min_dbhz=float(cfg.cn0_min_dbhz),
                carrier_lock_th=float(cfg.carrier_lock_th),
                max_lock_fail=int(cfg.max_lock_fail),
                fll_narrow_windows=int(cfg.fll_narrow_windows),
                fll_epochs=self._fll_epochs, order=int(w.order),
                wide=(w.w0p, w.w0p2, w.w0p3, w.w0f, w.w0f2, w.a2, w.a3, w.b3),
                narrow=(n.w0p, n.w0p2, n.w0p3, n.w0f, n.w0f2, n.a2, n.a3,
                        n.b3),
                dll_b_in=tuple(float(v) for v in np.asarray(self._dll_b_in)),
                dll_b_in_n=tuple(
                    float(v) for v in np.asarray(self._dll_b_in_n)),
                dll_b_out=tuple(
                    float(v) for v in np.asarray(self._dll_b_out)),
                dll_b_out_n=tuple(
                    float(v) for v in np.asarray(self._dll_b_out_n)),
            )
            self._chain_call = pc.make_chain_call(
                self._chain_spec, interpret=jax.default_backend() != "tpu")
        self._block_fn = jax.jit(
            self._track_block_impl, static_argnames=("base", "n_epochs")
        )
        self._capture_fn = jax.jit(
            self._track_capture_impl,
            static_argnames=("n_epochs_cap", "sym_n"),
        )

    # ---------------- state management (host) ----------------

    def init_state(self) -> TrackState:
        C = self.cfg.n_channels
        K = self.cfg.n_taps
        f32 = jnp.float32
        zf = jnp.zeros(C, f32)
        zi = jnp.zeros(C, jnp.int32)
        return TrackState(
            active=jnp.zeros(C, bool),
            prn_slot=zi,
            start=zi,
            cur_len=jnp.full(C, self._t0_int, jnp.int32),
            rem_code_phase_samples=zf,
            code_freq_delta=zf,
            carrier_doppler_hz=zf,
            rem_carr_phase_rad=zf,
            carr_filter=FllPllState(w=zf, x=zf),
            code_filter=IirState(
                inputs=jnp.zeros((C, 3), f32), outputs=jnp.zeros((C, 3), f32)
            ),
            prev_prompt=jnp.zeros((C, 2), f32),
            s_absi=zf, s_i2=zf, s_q2=zf, cn0_last=zf,
            push_count=zi,
            lock_fail=zi,
            epochs_in_track=zi,
            fll_on=jnp.zeros(C, bool),
            mode=zi,
            ext_cnt=zi,
            acc_corr=jnp.zeros((C, K, 2), f32),
            acc_half=jnp.zeros((C, 2), f32),
            sec_on=jnp.zeros(C, bool),
            sec_idx=zi,
            carr_offset_hz=zf,
        )

    def activate_channel(
        self,
        state: TrackState,
        ch: int,
        prn_slot: int,
        acq_delay_samples: float,
        acq_doppler_hz: float,
        acq_samplestamp: int,
        block_start_abs: int,
        carr_offset_hz: float = 0.0,
    ) -> TrackState:
        """Host-side pull-in (reference state 1, dll_pll_veml_tracking.cc
        :1568-1591): align the channel's first epoch to the next code-period
        boundary implied by the acquisition result, seed NCOs and filters
        from Acq_delay/Acq_doppler."""
        cfg = self.cfg
        code_freq = (1.0 + acq_doppler_hz / cfg.carrier_freq_hz) * cfg.chip_rate_chips_s
        t_prn = cfg.fs_hz * cfg.code_length_chips / code_freq
        boundary_abs = float(acq_samplestamp) + float(acq_delay_samples)
        k = max(0.0, np.ceil((block_start_abs - boundary_abs) / t_prn))
        start_abs = boundary_abs + k * t_prn
        start_rel = start_abs - block_start_abs
        start_i = int(np.floor(start_rel))
        rem = float(start_rel - start_i)
        cur_len = int(np.floor(t_prn + rem))

        def set_at(arr, value):
            return arr.at[ch].set(value)

        c = self._fllpll
        if c.order == 3:
            w0, x0 = 0.0, 2.0 * acq_doppler_hz
        else:
            w0, x0 = acq_doppler_hz, 0.0
        return state._replace(
            active=set_at(state.active, True),
            prn_slot=set_at(state.prn_slot, prn_slot),
            start=set_at(state.start, start_i),
            cur_len=set_at(state.cur_len, cur_len),
            rem_code_phase_samples=set_at(state.rem_code_phase_samples, rem),
            code_freq_delta=set_at(
                state.code_freq_delta, code_freq - cfg.chip_rate_chips_s
            ),
            carrier_doppler_hz=set_at(state.carrier_doppler_hz, acq_doppler_hz),
            rem_carr_phase_rad=set_at(state.rem_carr_phase_rad, 0.0),
            carr_filter=FllPllState(
                w=set_at(state.carr_filter.w, w0), x=set_at(state.carr_filter.x, x0)
            ),
            code_filter=IirState(
                inputs=state.code_filter.inputs.at[ch].set(0.0),
                outputs=state.code_filter.outputs.at[ch].set(0.0),
            ),
            prev_prompt=state.prev_prompt.at[ch].set(0.0),
            s_absi=set_at(state.s_absi, 0.0),
            s_i2=set_at(state.s_i2, 0.0),
            s_q2=set_at(state.s_q2, 0.0),
            cn0_last=set_at(state.cn0_last, 0.0),
            push_count=set_at(state.push_count, 0),
            lock_fail=set_at(state.lock_fail, 0),
            epochs_in_track=set_at(state.epochs_in_track, 0),
            fll_on=set_at(state.fll_on, bool(self.cfg.enable_fll_pull_in)),
            mode=set_at(state.mode, 0),
            ext_cnt=set_at(state.ext_cnt, 0),
            acc_corr=state.acc_corr.at[ch].set(0.0),
            acc_half=state.acc_half.at[ch].set(0.0),
            sec_on=set_at(state.sec_on, False),
            sec_idx=set_at(state.sec_idx, 0),
            carr_offset_hz=set_at(
                state.carr_offset_hz, float(carr_offset_hz)),
        )

    def enable_extended(
        self,
        state: TrackState,
        ch: int,
        epochs_to_boundary: int,
        sec_phase: int | None = None,
    ) -> TrackState:
        """Switch a channel to states 3/4 (narrow bandwidths + coherent
        extension over extend_correlation_symbols epochs), reference
        dll_pll_veml_tracking.cc:1774-1900.

        `epochs_to_boundary`: how many MORE epochs until the channel's next
        bit / secondary-sequence boundary (host knows it from telemetry bit
        sync); the first (possibly partial) window closes there so every
        later window is boundary-aligned.  `sec_phase`: current index into
        the slot's secondary code — enables in-loop wipe-off and the
        four-quadrant PLL (data-free channel)."""
        n = self.cfg.extend_correlation_symbols
        e = int(epochs_to_boundary) % n
        if e == 0:
            e = n

        def set_at(arr, value):
            return arr.at[ch].set(value)

        # Re-seed the carrier filter integrators for the narrow coefficients:
        # the current Doppler estimate carries over, the wide loop's
        # transient rate-integrator state does not (a residual `w` scaled
        # for the wide w0p^3 gain would take seconds to bleed off through
        # the 9x-slower narrow loop and drag the NCO off the signal).
        d = state.carrier_doppler_hz[ch]
        if self._fllpll.order == 3:
            w0, x0 = jnp.float32(0.0), 2.0 * d
        else:
            w0, x0 = d, jnp.float32(0.0)
        st = state._replace(
            mode=set_at(state.mode, 1),
            ext_cnt=set_at(state.ext_cnt, n - e),
            acc_corr=state.acc_corr.at[ch].set(0.0),
            acc_half=state.acc_half.at[ch].set(0.0),
            s_absi=set_at(state.s_absi, 0.0),
            s_i2=set_at(state.s_i2, 0.0),
            s_q2=set_at(state.s_q2, 0.0),
            push_count=set_at(state.push_count, 0),
            lock_fail=set_at(state.lock_fail, 0),
            fll_on=set_at(state.fll_on, self.cfg.fll_narrow_windows > 0),
            carr_filter=FllPllState(
                w=set_at(state.carr_filter.w, w0),
                x=set_at(state.carr_filter.x, x0),
            ),
            code_filter=IirState(
                inputs=state.code_filter.inputs.at[ch].set(0.0),
                outputs=state.code_filter.outputs,
            ),
        )
        if sec_phase is not None:
            st = st._replace(
                sec_on=set_at(st.sec_on, True),
                sec_idx=set_at(st.sec_idx, int(sec_phase) % self._sec_len),
            )
        return st

    def deactivate_channel(self, state: TrackState, ch: int) -> TrackState:
        return state._replace(active=state.active.at[ch].set(False))

    def rebase(self, state: TrackState, base: int) -> TrackState:
        """Shift block-relative start indices after a block is consumed."""
        return state._replace(start=state.start - jnp.int32(base))

    # ---------------- device path: shared loop closure ----------------

    def _fllpll_select(self, narrow):
        """Per-channel wide/narrow FLL-PLL coefficient select (reference
        switches Dll_Pll_Conf bandwidths between states 2 and 3/4)."""
        w, n = self._fllpll, self._fllpll_n
        f32 = jnp.float32

        def sel(a, b):
            return jnp.where(narrow, f32(b), f32(a))

        return FllPllCoeffs(
            order=w.order,
            w0p=sel(w.w0p, n.w0p), w0p2=sel(w.w0p2, n.w0p2),
            w0p3=sel(w.w0p3, n.w0p3), w0f=sel(w.w0f, n.w0f),
            w0f2=sel(w.w0f2, n.w0f2), a2=sel(w.a2, n.a2),
            a3=sel(w.a3, n.a3), b3=sel(w.b3, n.b3),
        )

    def _loop_update(self, state: TrackState, corr, valid):
        """Close the tracking loops for one epoch given `corr` [C, K]
        (complex, true-NCO frame): discriminators + filters (A.3/A.5,
        run_dll_pll :914-996), extended-mode coherent accumulation
        (states 3/4, :1774-1900), A.6 NCO stepping, A.7 supervision.
        Returns (new_state merged by `valid`, TrackOutputs for the epoch).
        """
        cfg = self.cfg
        f32 = jnp.float32
        chip_rate = f32(cfg.chip_rate_chips_s)
        t_epoch = state.cur_len.astype(f32) / f32(cfg.fs_hz)

        # in-loop secondary wipe-off (pilot path, start_tracking :549-660)
        sec_chip = self._sec[state.prn_slot, jnp.minimum(
            state.sec_idx, self._sec_len - 1)]
        s = jnp.where(state.sec_on, sec_chip, f32(1.0))
        corr_w = corr * s[:, None].astype(corr.dtype)
        prompt_w = corr_w[:, cfg.prompt_index]

        narrow = state.mode >= 1
        acc = unpack_complex(state.acc_corr) + corr_w
        cnt = state.ext_cnt + 1
        ext_n = jnp.int32(cfg.extend_correlation_symbols)
        boundary = narrow & (cnt >= ext_n)
        upd = (~narrow) | boundary            # loop closes this epoch

        disc = jnp.where(narrow[:, None], acc, corr_w)
        disc_prompt = disc[:, cfg.prompt_index]
        t_int = jnp.where(
            narrow, cnt.astype(f32) * f32(cfg.code_period_s), t_epoch)

        # --- carrier discriminators (A.3) ---
        prev_prompt = unpack_complex(state.prev_prompt)
        costas = pll_cloop_two_quadrant_atan(disc_prompt) / f32(_TWO_PI)
        fourq = pll_four_quadrant_atan(disc_prompt) / f32(_TWO_PI)
        if cfg.sec_data:
            # wiped secondary still leaves nav-data flips on the prompt
            carr_phase_err_cyc = costas
        else:
            carr_phase_err_cyc = jnp.where(state.sec_on, fourq, costas)
        freq_err_hz = fll_four_quadrant_atan(
            prev_prompt, prompt_w, f32(0.0), t_epoch
        ) / f32(_TWO_PI)
        # narrow-mode FLL pull-in transitory: consecutive half-window
        # accumulations sit inside one bit (flip-free) and give a
        # +-1/(2*T_half) Hz aperture — bridges the wide->narrow Doppler
        # hand-off past the narrow PLL's pull-in range, then hands over to
        # the pure PLL (the narrow analogue of the reference's FLL
        # transitory)
        half_n = cfg.extend_correlation_symbols // 2
        acc_half = unpack_complex(state.acc_half)
        t_half = f32(half_n * cfg.code_period_s)
        p2 = acc[:, cfg.prompt_index] - acc_half
        freq_err_ext = jnp.where(
            (jnp.abs(acc_half) > 0.0) & boundary,
            fll_four_quadrant_atan(acc_half, p2, f32(0.0),
                                   jnp.maximum(t_half, f32(1e-6)))
            / f32(_TWO_PI),
            f32(0.0),
        )
        # FLL-assisted PLL: both discriminators run simultaneously during
        # the transitory (reference run_dll_pll :914-996 passes both into
        # Tracking_FLL_PLL_filter); the PLL feedback is what regulates the
        # cascade's rate integrator back to zero as the frequency converges
        pll_in = carr_phase_err_cyc
        fll_in = jnp.where(
            state.fll_on & ~narrow & (state.push_count > 0),
            freq_err_hz, f32(0.0))
        fll_in = jnp.where(narrow & state.fll_on, freq_err_ext, fll_in)
        carr_filt_new, doppler_new = fll_pll_apply(
            state.carr_filter, self._fllpll_select(narrow), fll_in, pll_in,
            t_int,
        )

        # --- DLL (A.3) ---
        if cfg.veml:
            code_err_chips = dll_nc_vemlp_normalized(
                disc[:, 0], disc[:, 1], disc[:, 3], disc[:, 4]
            )
        else:
            code_err_chips = dll_nc_e_minus_l_normalized(disc[:, 0], disc[:, 2])
        b_in = jnp.where(narrow[:, None], self._dll_b_in_n, self._dll_b_in)
        b_out = jnp.where(narrow[:, None], self._dll_b_out_n, self._dll_b_out)
        code_filt_new, code_err_filt = iir_apply(
            state.code_filter, code_err_chips, b_in, b_out
        )

        app = valid & upd
        carr_filter = _where_tree(app, carr_filt_new, state.carr_filter)
        code_filter = _where_tree(app, code_filt_new, state.code_filter)
        doppler = jnp.where(app, doppler_new, state.carrier_doppler_hz)
        # carrier-aided code NCO (A.4):
        # code_freq = (1 + doppler/f_carrier)*chip_rate - code_err_filt
        code_freq_delta = jnp.where(
            app,
            chip_rate / f32(cfg.carrier_freq_hz) * doppler_new - code_err_filt,
            state.code_freq_delta,
        )

        # --- NCO stepping / next block length (A.6, split precision) ---
        new_code_freq = chip_rate + code_freq_delta
        d_t = -f32(self._t0_int) * code_freq_delta / new_code_freq \
            - f32(self._t0_frac) * code_freq_delta / new_code_freq
        frac = f32(self._t0_frac) + d_t + state.rem_code_phase_samples
        frac_floor = jnp.floor(frac)
        next_len = (jnp.int32(self._t0_int) + frac_floor.astype(jnp.int32))
        new_rem_code = frac - frac_floor

        # NCO phase step includes the FDMA slot offset; aiding above and the
        # reported Doppler stay residual (motion-only)
        new_carr_step = f32(_TWO_PI) * (
            doppler + state.carr_offset_hz) / f32(cfg.fs_hz)
        new_rem_carr = jnp.mod(
            state.rem_carr_phase_rad
            + new_carr_step * next_len.astype(f32),
            f32(_TWO_PI),
        )
        # NOTE (vs reference :1044): the reference advances rem_carr_phase by
        # step*N for the block just processed; we precompute the phase at the
        # next epoch start using the NEW step over the NEXT block, which is
        # the same recursion expressed at epoch boundaries.

        # --- CN0 / lock supervision (A.7) on loop-closure prompts: wide
        # pushes every epoch, narrow pushes the extended prompt per window
        # (the reference evaluates the detectors on the extended prompts in
        # state 4 — per-epoch prompts at narrow-mode CN0 would sit below the
        # detector thresholds by design) ---
        push = app
        pf = f32(1.0) * push.astype(f32)
        s_absi = state.s_absi + pf * jnp.abs(disc_prompt.real)
        s_i2 = state.s_i2 + pf * disc_prompt.real**2
        s_q2 = state.s_q2 + pf * disc_prompt.imag**2
        push_count = state.push_count + push.astype(jnp.int32)
        # window completes every cn0_samples pushes; the detectors are the
        # SNV estimator and the carrier lock metric evaluated on the window
        # sums (non-overlapping buffers, exactly cn0_and_tracking_lock_status
        # :839 — the sliding-buffer formulation computed the same numbers,
        # at a [C, cn0_samples, 2] shift + two reductions every epoch)
        window_done = push & (jnp.mod(push_count, cfg.cn0_samples) == 0)
        t_cn0 = jnp.where(
            narrow, ext_n.astype(f32) * f32(cfg.code_period_s), t_epoch)
        m = f32(cfg.cn0_samples)
        psig = (s_absi / m) ** 2
        ptot = (s_i2 + s_q2) / m
        noise = jnp.maximum(ptot - psig, jnp.finfo(f32).tiny)
        cn0 = (10.0 * jnp.log10(jnp.maximum(psig / noise, f32(1e-10)))
               - 10.0 * jnp.log10(t_cn0))
        carrier_lock = (s_i2 - s_q2) / jnp.maximum(
            s_i2 + s_q2, jnp.finfo(f32).tiny)
        cn0_last = jnp.where(window_done, cn0, state.cn0_last)
        hist_full = push_count >= cfg.cn0_samples
        # reset the accumulators at each completed window
        s_absi = jnp.where(window_done, 0.0, s_absi)
        s_i2_k = jnp.where(window_done, 0.0, s_i2)
        s_q2_k = jnp.where(window_done, 0.0, s_q2)
        # No phase lock exists during the FLL pull-in transitory; supervision
        # starts once the PLL takes over.  The check fires once per
        # cn0_samples NEW prompts — the reference evaluates
        # cn0_and_tracking_lock_status on non-overlapping buffers (:839), so
        # max_lock_fail counts detector windows, not epochs.
        check_now = window_done & ~state.fll_on
        fail = check_now & (
            (cn0 < cfg.cn0_min_dbhz) | (carrier_lock < cfg.carrier_lock_th)
        )
        ok = check_now & ~fail
        lock_fail = jnp.where(
            fail,
            state.lock_fail + 1,
            jnp.where(ok, jnp.maximum(state.lock_fail - 1, 0), state.lock_fail),
        )
        still_active = state.active & (lock_fail <= cfg.max_lock_fail)

        epochs_in_track = state.epochs_in_track + 1
        fll_still_on = state.fll_on & jnp.where(
            narrow,
            push_count < jnp.int32(cfg.fll_narrow_windows),
            epochs_in_track < self._fll_epochs)
        # narrow FLL hand-over: re-seed the cascade from the converged
        # Doppler so the transitory's rate-integrator residue (scaled for
        # the FLL gains) cannot drag the pure PLL off the signal
        turnoff = narrow & state.fll_on & ~fll_still_on
        if self._fllpll.order == 3:
            seeded = FllPllState(w=jnp.zeros_like(doppler), x=2.0 * doppler)
        else:
            seeded = FllPllState(w=doppler, x=jnp.zeros_like(doppler))
        carr_filter = _where_tree(turnoff & valid, seeded, carr_filter)

        reset_acc = boundary | ~narrow
        new_state = TrackState(
            active=still_active,
            prn_slot=state.prn_slot,
            start=state.start + state.cur_len,
            cur_len=next_len,
            rem_code_phase_samples=new_rem_code,
            code_freq_delta=code_freq_delta,
            carrier_doppler_hz=doppler,
            rem_carr_phase_rad=new_rem_carr,
            carr_filter=carr_filter,
            code_filter=code_filter,
            prev_prompt=pack_complex(prompt_w),
            s_absi=s_absi, s_i2=s_i2_k, s_q2=s_q2_k, cn0_last=cn0_last,
            push_count=push_count,
            lock_fail=lock_fail,
            epochs_in_track=epochs_in_track,
            fll_on=fll_still_on,
            mode=state.mode,
            ext_cnt=jnp.where(reset_acc, 0, cnt),
            acc_corr=jnp.where(reset_acc[:, None, None], 0.0,
                               pack_complex(acc)),
            acc_half=jnp.where(
                reset_acc[:, None], 0.0,
                jnp.where((narrow & (cnt == jnp.int32(half_n)))[:, None],
                          pack_complex(acc[:, cfg.prompt_index]),
                          state.acc_half)),
            sec_on=state.sec_on,
            sec_idx=jnp.mod(state.sec_idx + 1, self._sec_len),
            carr_offset_hz=state.carr_offset_hz,
        )
        merged = _where_tree(valid, new_state, state)

        outputs = TrackOutputs(
            valid=valid,
            start=state.start,
            cur_len=state.cur_len,
            correlators=jnp.where(valid[:, None, None], pack_complex(corr), 0.0),
            carrier_doppler_hz=merged.carrier_doppler_hz,
            code_freq_delta=merged.code_freq_delta,
            rem_code_phase_samples=merged.rem_code_phase_samples,
            rem_carr_phase_rad=merged.rem_carr_phase_rad,
            # latest completed-window CN0 (the reference's d_CN0_SNV_dB_Hz
            # likewise holds the last computed value between windows)
            cn0_dbhz=jnp.where(valid & hist_full, merged.cn0_last, f32(0.0)),
            active=merged.active,
        )
        return merged, outputs

    # ---------------- device path: per-epoch gather correlator ----------------

    def _epoch_step(self, samples_p, state: TrackState, limit):
        """One epoch: window slice + exact A.1/A.2 multicorrelator (the
        reference's floor resampler contract) + shared loop closure."""
        cfg = self.cfg
        f32 = jnp.float32
        Nmax = cfg.epoch_samples_max

        valid = state.active & (state.start < jnp.int32(limit))

        # One HBM window slice covers every channel (all active channels'
        # epoch starts lie within one code period of each other — they
        # advance in lock-step on the epoch grid), then cheap per-channel
        # slices within the window.
        n_samp = samples_p.shape[0]
        win = min(self._win, n_samp)
        m = jnp.min(jnp.where(state.active, state.start, jnp.int32(1 << 29)))
        m = jnp.clip(m, 0, n_samp - win)
        window = jax.lax.dynamic_slice(samples_p, (m, 0), (win, 2))
        off = jnp.clip(state.start - m, 0, win - Nmax)
        segs_p = jax.vmap(
            lambda s: jax.lax.dynamic_slice(window, (s, 0), (Nmax, 2))
        )(off)                                                 # [C, Nmax, 2]
        segs = unpack_complex(segs_p)                          # [C, Nmax]
        spc = f32(cfg.code_samples_per_chip)
        code_freq = f32(cfg.chip_rate_chips_s) + state.code_freq_delta
        code_step = code_freq / f32(cfg.fs_hz) * spc
        rem_code_chips = code_freq * state.rem_code_phase_samples / f32(cfg.fs_hz) * spc
        carr_step = f32(_TWO_PI) * (
            state.carrier_doppler_hz + state.carr_offset_hz) / f32(cfg.fs_hz)

        code_rows = self._codes[state.prn_slot]            # [C, Lspc]
        corr = jax.vmap(
            multicorrelate, in_axes=(0, 0, None, 0, 0, 0, 0, None, 0)
        )(
            segs, code_rows, self._shifts, code_step, rem_code_chips,
            state.rem_carr_phase_rad, carr_step, f32(0.0),
            state.cur_len.astype(f32),
        )                                                  # [C, K]
        return self._loop_update(state, corr, valid)

    # ---------------- device path: chunked batched-FFT correlator ----------------

    def _chunk_windows(self, samples_p, state: TrackState):
        """Shared chunk-window extraction on the REGULAR epoch grid.

        One window slice per chunk, one segment slice per channel at
        s_reg[c, 0] = start_c - grid_pad, then E STATIC windows at stride
        t0_int — the per-epoch drift d' = s_pred - s_reg (bounded by the
        chunk drift) is folded into the lag axis, so no per-(channel,epoch)
        dynamic slices exist (each unrolled to 2 tiny kernels and dominated
        the device profile).  Returns (wiped [C,E,NW] complex zero-masked
        outside each epoch's true content, s_reg [C,E] i32, s_pred [C,E+1],
        len_pred [C,E], step0 [C])."""
        cfg = self.cfg
        f32 = jnp.float32
        E = self._chunk_epochs
        NW = self._corr_win
        t0i = self._t0_int
        n_samp = samples_p.shape[0]

        # --- predict epoch starts/lengths under frozen code frequency ---
        delta0 = state.code_freq_delta
        codef0 = f32(cfg.chip_rate_chips_s) + delta0
        d_t0 = -(f32(t0i) + f32(self._t0_frac)) * delta0 / codef0
        c_step = f32(self._t0_frac) + d_t0                     # [C]
        k = jnp.arange(E + 1, dtype=f32)                       # epoch index
        # S[0]=start, S[1]=start+cur_len, S[k>=1]=S[1]+(k-1)*t0i+floor(rem0+(k-1)*c)
        r = state.rem_code_phase_samples[:, None] + (k[None, :] - 1.0) * c_step[:, None]
        s_pred = (state.start[:, None] + state.cur_len[:, None]
                  + (k[None, :].astype(jnp.int32) - 1) * jnp.int32(t0i)
                  + jnp.floor(r).astype(jnp.int32))            # [C, E+1]
        s_pred = jnp.concatenate(
            [state.start[:, None], s_pred[:, 1:]], axis=1)
        len_pred = s_pred[:, 1:] - s_pred[:, :-1]              # [C, E]

        # --- per-channel segment -> static epoch windows ---
        # each channel slices its OWN segment directly from the capture:
        # no shared window base means no cross-channel min — the sharded
        # 8-device program compiles with ZERO collectives in the hot loop
        # (a scalar all-reduce per chunk would serialize channel shards)
        seg_len = (E - 1) * t0i + NW
        # callers pre-pad via _pad_for_chunks (ONCE per program — padding
        # here would copy the whole capture every chunk iteration)
        off = jnp.clip(state.start - self._grid_pad, 0,
                       n_samp - seg_len)                       # [C]
        seg_p = jax.vmap(
            lambda s: jax.lax.dynamic_slice(samples_p, (s, 0), (seg_len, 2))
        )(off)                                                 # [C, seg_len, 2]
        seg = unpack_complex(seg_p)
        segs = jnp.stack(
            [jax.lax.slice_in_dim(seg, kk * t0i, kk * t0i + NW, axis=1)
             for kk in range(E)], axis=1)                      # [C, E, NW]
        s_reg = off[:, None] + (
            jnp.arange(E, dtype=jnp.int32) * jnp.int32(t0i))[None, :]

        # --- frozen-NCO carrier wipe-off across the chunk ---
        step0 = f32(_TWO_PI) * (
            state.carrier_doppler_hz + state.carr_offset_hz) / f32(cfg.fs_hz)
        phi_k = jnp.mod(
            state.rem_carr_phase_rad[:, None]
            + step0[:, None] * (s_reg - state.start[:, None]).astype(f32),
            f32(_TWO_PI))                                      # [C, E]
        n = jnp.arange(NW, dtype=f32)
        phase = phi_k[..., None] + step0[:, None, None] * n
        wiped = segs * jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))
        # mask to each epoch's true content [d', d' + len_pred)
        dp = (s_pred[:, :E] - s_reg).astype(f32)[..., None]    # [C, E, 1]
        nn = n[None, None, :]
        mask = (nn >= dp) & (nn < dp + len_pred[..., None].astype(f32))
        wiped = jnp.where(mask, wiped, 0.0 + 0.0j)
        return wiped, s_reg, s_pred, len_pred, step0

    def _pad_for_chunks(self, samples_p):
        """Zero-pad the capture tail ONCE so every chunk's per-channel
        segment slice fits for EVERY valid epoch (valid => start < limit
        <= n_samp - epoch_samples_max): the padded region is either masked
        (beyond a valid epoch's content) or belongs to invalid epochs
        whose state never merges.  Without it, offsets clamp near the
        capture end and later epochs' lag positions fall outside the lag
        window (taps read zeros)."""
        if self.cfg.correlator not in ("fft", "mxu", "pallas"):
            return samples_p
        E = self._chunk_epochs
        seg_len = (E - 1) * self._t0_int + self._corr_win
        n_samp = samples_p.shape[0]
        pad_tail = max(0,
                       seg_len + self._grid_pad - self.cfg.epoch_samples_max,
                       seg_len - n_samp)
        if pad_tail:
            samples_p = jnp.pad(samples_p, ((0, pad_tail), (0, 0)))
        return samples_p

    def _chunk_step(self, samples_p, state: TrackState, limit):
        """Process `chunk_epochs` epochs with ONE batched correlation.

        Epoch windows are taken on the regular grid with the chunk-entry
        (frozen) NCO rates (_chunk_windows), correlated as a [C, E, NW]
        batch against the per-slot replica bank, then an unrolled exact
        per-epoch chain reads each epoch's taps from the lag window at the
        TRUE code phase and rotates them by the known frozen-vs-true
        carrier phase difference before closing the loops.  Returns
        (state, TrackOutputs stacked [E, C, ...])."""
        cfg = self.cfg
        f32 = jnp.float32
        E = self._chunk_epochs
        F = self._fft_size
        LW = self._lag_window

        wiped, s_reg, s_pred, len_pred, step0 = self._chunk_windows(
            samples_p, state)

        # --- batched circular correlation, lag window only ---
        if cfg.correlator == "mxu":
            # one real batched matmul per I/Q plane on the MXU — identical
            # math to the FFT pair below restricted to the first LW lags
            rep_rows = self._rep_rows[state.prn_slot]          # [C, LW, NW]
            zr = jnp.einsum("cen,cln->cel", wiped.real, rep_rows,
                            preferred_element_type=jnp.float32)
            zi = jnp.einsum("cen,cln->cel", wiped.imag, rep_rows,
                            preferred_element_type=jnp.float32)
            zwin = jax.lax.complex(zr, zi)                     # [C, E, LW]
        else:
            rep_fft_conj = unpack_complex(
                self._rep_fft_conj_planar)[state.prn_slot]
            z = jnp.fft.ifft(
                jnp.fft.fft(wiped, n=F, axis=-1) * rep_fft_conj[:, None, :],
                axis=-1)
            zwin = z[:, :, :LW]                                # [C, E, LW]

        # --- exact per-epoch chain (unrolled; nested device loops hang the
        #     remote compiler, CLAUDE.md) ---
        samples_per_chip = f32(cfg.fs_hz / cfg.chip_rate_chips_s)
        shifts_chips = jnp.asarray(
            np.asarray(cfg.tap_shifts_chips(), dtype=np.float32))
        lag_grid = jnp.arange(LW, dtype=f32)
        st = state
        dphi = jnp.zeros_like(step0)   # true-NCO phase minus frozen phase
        outs_list = []
        for kk in range(E):
            valid = st.active & (st.start < jnp.int32(limit))
            # taps at the TRUE code phase: lag position folds in the true
            # epoch-start offset vs the regular-grid slice origin
            d_s = (st.start - s_reg[:, kk]).astype(f32)
            rem_eff = (d_s + st.rem_code_phase_samples) * (
                1.0 + st.code_freq_delta / f32(cfg.chip_rate_chips_s))
            pos = (f32(self._lag_margin) + rem_eff[:, None]
                   - shifts_chips[None, :] * samples_per_chip)  # [C, K]
            w = jnp.maximum(0.0, 1.0 - jnp.abs(
                pos[..., None] - lag_grid[None, None, :]))      # [C, K, LW]
            taps = jnp.einsum("cl,ckl->ck", zwin[:, kk], w)
            # rotate into the true-NCO frame: mean over the epoch of
            # (phi_true - phi_frozen)
            step_true = f32(_TWO_PI) * (
                st.carrier_doppler_hz + st.carr_offset_hz) / f32(cfg.fs_hz)
            dphi_mid = dphi + (step_true - step0) * 0.5 * st.cur_len.astype(f32)
            rot = jax.lax.complex(jnp.cos(dphi_mid), -jnp.sin(dphi_mid))
            corr = taps * rot[:, None]

            prev_len = st.cur_len
            st, out = self._loop_update(st, corr, valid)
            # advance the frozen-vs-true phase ledger with the SAME
            # recursion _loop_update used for rem_carr_phase (new step over
            # the next block length) minus the frozen advance
            step_new = f32(_TWO_PI) * (
                st.carrier_doppler_hz + st.carr_offset_hz) / f32(cfg.fs_hz)
            dphi_next = dphi + step_new * st.cur_len.astype(f32) \
                - step0 * prev_len.astype(f32)
            dphi = jnp.where(valid,
                             jnp.mod(dphi_next + f32(np.pi), f32(_TWO_PI))
                             - f32(np.pi),
                             dphi)
            outs_list.append(out)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *outs_list)
        return st, stacked

    # ---------------- device path: fused Pallas chain ----------------

    def _pack_rows(self, state: TrackState, limit):
        """TrackState -> (fstate [SF,C] f32, istate [SI,C] i32) row matrices
        in ops.pallas_chain row order (runs once per capture/block call —
        the device loop carries the packed form)."""
        K = self.cfg.n_taps
        rows = [state.rem_code_phase_samples, state.code_freq_delta,
                state.carrier_doppler_hz, state.rem_carr_phase_rad,
                state.carr_filter.w, state.carr_filter.x,
                state.prev_prompt[:, 0], state.prev_prompt[:, 1],
                state.s_absi, state.s_i2, state.s_q2, state.cn0_last,
                state.acc_half[:, 0], state.acc_half[:, 1],
                state.carr_offset_hz]
        rows += [state.code_filter.inputs[:, j] for j in range(3)]
        rows += [state.code_filter.outputs[:, j] for j in range(3)]
        rows += [state.acc_corr[:, k, 0] for k in range(K)]
        rows += [state.acc_corr[:, k, 1] for k in range(K)]
        fst = jnp.stack(rows).astype(jnp.float32)
        i32 = jnp.int32
        irows = [state.active.astype(i32), state.start, state.cur_len,
                 state.push_count, state.lock_fail, state.epochs_in_track,
                 state.fll_on.astype(i32), state.mode, state.ext_cnt,
                 state.sec_on.astype(i32), state.sec_idx,
                 jnp.broadcast_to(jnp.asarray(limit, i32), state.start.shape)]
        ist = jnp.stack(irows)
        pad = self._c_pad - self.cfg.n_channels
        if pad:
            fst = jnp.pad(fst, ((0, 0), (0, pad)))
            # dead lanes: active=0; cur_len = t0 so per-epoch time math
            # stays finite
            ist = jnp.pad(ist, ((0, 0), (0, pad)))
            ist = ist.at[2, self.cfg.n_channels:].set(self._t0_int)
        return fst, ist

    def _unpack_rows(self, state: TrackState, fst, ist) -> TrackState:
        from ..ops import pallas_chain as pc

        K = self.cfg.n_taps
        fst = fst[:, : self.cfg.n_channels]
        ist = ist[:, : self.cfg.n_channels]
        return TrackState(
            active=ist[pc.I_ACTIVE] > 0,
            prn_slot=state.prn_slot,
            start=ist[pc.I_START],
            cur_len=ist[pc.I_CURLEN],
            rem_code_phase_samples=fst[pc.F_REM_CODE],
            code_freq_delta=fst[pc.F_DELTA],
            carrier_doppler_hz=fst[pc.F_DOPPLER],
            rem_carr_phase_rad=fst[pc.F_REM_CARR],
            carr_filter=FllPllState(w=fst[pc.F_CARR_W], x=fst[pc.F_CARR_X]),
            code_filter=IirState(
                inputs=jnp.stack(
                    [fst[pc.F_DLL_IN0 + j] for j in range(3)], axis=-1),
                outputs=jnp.stack(
                    [fst[pc.F_DLL_OUT0 + j] for j in range(3)], axis=-1)),
            prev_prompt=jnp.stack(
                [fst[pc.F_PREV_R], fst[pc.F_PREV_I]], axis=-1),
            s_absi=fst[pc.F_SABSI], s_i2=fst[pc.F_SI2], s_q2=fst[pc.F_SQ2],
            cn0_last=fst[pc.F_CN0],
            push_count=ist[pc.I_PUSH],
            lock_fail=ist[pc.I_LOCKFAIL],
            epochs_in_track=ist[pc.I_EPOCHS],
            fll_on=ist[pc.I_FLL_ON] > 0,
            mode=ist[pc.I_MODE],
            ext_cnt=ist[pc.I_EXTCNT],
            acc_corr=jnp.stack(
                [jnp.stack([fst[pc.F_ACC_R0 + k], fst[pc.F_ACC_R0 + K + k]],
                           axis=-1) for k in range(K)], axis=1),
            acc_half=jnp.stack(
                [fst[pc.F_ACCH_R], fst[pc.F_ACCH_I]], axis=-1),
            sec_on=ist[pc.I_SEC_ON] > 0,
            sec_idx=ist[pc.I_SEC_IDX],
            carr_offset_hz=fst[pc.F_CARR_OFF],
        )

    def _pallas_chunk(self, samples_p, fst, ist, rep_rows, sec_rows):
        """One chunk on packed rows: XLA predicts windows + correlates on
        the MXU (identical math to _chunk_step), then the fused Pallas
        kernel runs the exact per-epoch chain for all E epochs in ONE
        launch (ops/pallas_chain.py)."""
        from ..ops import pallas_chain as pc

        cfg = self.cfg
        E = self._chunk_epochs
        C = cfg.n_channels

        # XLA-side window/correlation math runs at the true channel count
        # (shared _chunk_windows regular-grid extraction); only the kernel
        # boundary is lane-padded
        state_view = self._unpack_rows(
            TrackState(*([jnp.zeros(C)] * len(TrackState._fields))), fst, ist)
        wiped, s_reg, _s_pred, _len_pred, step0 = self._chunk_windows(
            samples_p, state_view)

        zr = jnp.einsum("cen,cln->elc", wiped.real, rep_rows,
                        preferred_element_type=jnp.float32)
        zi = jnp.einsum("cen,cln->elc", wiped.imag, rep_rows,
                        preferred_element_type=jnp.float32)

        pad = self._c_pad - C
        if pad:
            zr = jnp.pad(zr, ((0, 0), (0, 0), (0, pad)))
            zi = jnp.pad(zi, ((0, 0), (0, 0), (0, pad)))
        s_pred_k = jnp.transpose(s_reg)
        step0_k = step0[None]
        if pad:
            s_pred_k = jnp.pad(s_pred_k, ((0, 0), (0, pad)))
            step0_k = jnp.pad(step0_k, ((0, 0), (0, pad)),
                              constant_values=1.0)
        if sec_rows.shape[1] != self._c_pad:
            sec_rows = jnp.pad(
                sec_rows, ((0, 0), (0, self._c_pad - sec_rows.shape[1])),
                constant_values=1.0)
        out_f, out_i, out_corr, fst2, ist2 = self._chain_call(
            zr, zi, s_pred_k, step0_k, sec_rows, fst, ist)

        K = cfg.n_taps
        out_f = out_f[..., :C]
        out_i = out_i[..., :C]
        out_corr = out_corr[..., :C]
        corr = jnp.stack([out_corr[:, :K], out_corr[:, K:]], axis=-1)
        outs = TrackOutputs(
            valid=out_f[:, pc.O_VALID] > 0.5,
            start=out_i[:, 0],
            cur_len=out_i[:, 1],
            correlators=jnp.transpose(corr, (0, 2, 1, 3)),
            carrier_doppler_hz=out_f[:, pc.O_DOPPLER],
            code_freq_delta=out_f[:, pc.O_DELTA],
            rem_code_phase_samples=out_f[:, pc.O_REM_CODE],
            rem_carr_phase_rad=out_f[:, pc.O_REM_CARR],
            cn0_dbhz=out_f[:, pc.O_CN0],
            active=out_f[:, pc.O_ACTIVE] > 0.5,
        )
        return fst2, ist2, outs

    # ---------------- jitted programs ----------------

    def _track_block_impl(self, samples, state: TrackState, *, base: int, n_epochs: int):
        samples = self._pad_for_chunks(samples)
        if self.cfg.correlator in ("fft", "mxu", "pallas"):
            E = self._chunk_epochs
            n_chunks = (n_epochs + E - 1) // E

            if self.cfg.correlator == "pallas":
                fst, ist = self._pack_rows(state, base)
                rep_rows = self._rep_rows[state.prn_slot]
                sec_rows = jnp.transpose(self._sec[state.prn_slot])

                def step(carry, _):
                    f, i = carry
                    f, i, outs = self._pallas_chunk(
                        samples, f, i, rep_rows, sec_rows)
                    return (f, i), outs

                (fst, ist), outs = jax.lax.scan(
                    step, (fst, ist), None, length=n_chunks)
                outs = jax.tree.map(
                    lambda a: a.reshape((n_chunks * E,) + a.shape[2:]), outs)
                return self._unpack_rows(state, fst, ist), outs

            def step(carry, _):
                return self._chunk_step(samples, carry, jnp.int32(base))

            st, outs = jax.lax.scan(step, state, None, length=n_chunks)
            # [n_chunks, E, C, ...] -> [n_chunks*E, C, ...]
            outs = jax.tree.map(
                lambda a: a.reshape((n_chunks * E,) + a.shape[2:]), outs)
            return st, outs

        def step(carry, _):
            return self._epoch_step(samples, carry, jnp.int32(base))

        return jax.lax.scan(step, state, None, length=n_epochs)

    # compact harvest packing: the terminal backend's host readback pays
    # ~tens of ms of latency PER ARRAY plus ~45 ms/MB (PERF.md round 4),
    # so the capture path ships ONE flat i32 buffer holding
    #   full rate  — flags (cur_len | valid<<16 | active<<17), the prompt
    #                correlator as an f16 I/Q pair (telemetry consumes
    #                every symbol; taps beyond the prompt are debug-only
    #                and stay on device), and rem_code (f32 — the exact
    #                sub-sample pseudorange contract rides on it)
    #   1/D rate   — rem_carr/doppler (f32) + cn0|delta (f16x2), sampled
    #                at epochs k % D == D-1: these feed the 20 ms
    #                observables grid, not per-epoch logic
    #   once       — the pre-call per-channel start (epoch starts are
    #                reconstructed exactly as start0 + cumsum(valid*len))
    _DEC_ROWS = 3

    @property
    def capture_decim(self) -> int:
        """Decimation of the loop-state rows in packed capture outputs.
        4 epochs (~4 ms at 1 ms codes) keeps the observables-grid state
        fresh through mode transitions (8 ms nudged the BeiDou system test
        over the 5 m bar) while still shrinking the readback ~2x.
        (Round-5 A/B on the dual-band L2CM scenario: decim 1 on 20 ms
        codes REGRESSED the joint fix ~2x — the 4-epoch grid's entering-
        state sampling is the better observable; keep 4 regardless of the
        code period, overridable via `capture_decim_override`.)"""
        override = getattr(self, "capture_decim_override", None)
        if override:
            return int(override)
        d = 4
        while self._chunk_epochs % d and d > 1:
            d //= 2
        return d

    def _pack_outputs(self, bufs: TrackOutputs, start0):
        f32 = jnp.float32
        i32 = jnp.int32
        D = self.capture_decim

        def bc(x):
            return jax.lax.bitcast_convert_type(x.astype(f32), i32)

        def f16x2(a, b):
            ah = jax.lax.bitcast_convert_type(
                a.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
            bh = jax.lax.bitcast_convert_type(
                b.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
            return (ah | (bh << 16)).astype(i32)

        p = self.cfg.prompt_index
        prompt = bufs.correlators[:, :, p, :]          # [E, C, 2]
        flags = (bufs.cur_len & 0xFFFF) \
            | (bufs.valid.astype(i32) << 16) \
            | (bufs.active.astype(i32) << 17)
        prompt_c = jnp.clip(prompt, -60000.0, 60000.0)   # f16 range guard
        full = jnp.stack([flags,
                          f16x2(prompt_c[..., 0], prompt_c[..., 1]),
                          bc(bufs.rem_code_phase_samples)])
        dec = jnp.stack([
            bc(bufs.rem_carr_phase_rad[D - 1::D]),
            bc(bufs.carrier_doppler_hz[D - 1::D]),
            f16x2(bufs.cn0_dbhz[D - 1::D],
                  bufs.code_freq_delta[D - 1::D]),
        ])                                             # [3, E/D, C]
        # 2-D [rows, C]: the channel axis stays LAST (and sharded — a 1-D
        # flatten would all-gather the output inside the program)
        E = full.shape[1]
        C = full.shape[2]
        return jnp.concatenate([
            full.reshape(3 * E, C),
            dec.reshape(-1, C),
            start0.astype(i32)[None, :]], axis=0)

    def _unpack_outputs(self, packed: np.ndarray) -> TrackOutputs:
        """Host-side inverse of _pack_outputs -> numpy TrackOutputs.

        Full [E, C, K, 2] correlators carry the prompt only; epoch starts
        are reconstructed exactly; the decimated loop-state fields are
        UPSAMPLED by repetition, so upsampled[k] equals the true value
        exactly at k % D == D-1 (the receiver's harvest samples there —
        capture_decim tells it the grid)."""
        packed = np.asarray(packed)
        C = self.cfg.n_channels
        K = self.cfg.n_taps
        D = self.capture_decim
        n_rows = packed.shape[0] - 1
        # n_rows = 3*E + DEC_ROWS*(E/D), E divisible by D
        E = n_rows * D // (3 * D + self._DEC_ROWS)
        full = packed[: 3 * E].reshape(3, E, C)
        dec = packed[3 * E : n_rows].reshape(self._DEC_ROWS, E // D, C)
        start0 = packed[n_rows]

        def fb(row):
            return row.view(np.float32)

        def f16_lo(row):
            return (row.view(np.uint32) & 0xFFFF).astype(np.uint16) \
                .view(np.float16).astype(np.float32)

        def f16_hi(row):
            return (row.view(np.uint32) >> 16).astype(np.uint16) \
                .view(np.float16).astype(np.float32)

        flags = full[0]
        valid = (flags >> 16) & 1 > 0
        cur_len = (flags & 0xFFFF).astype(np.int32)
        adv = np.where(valid, cur_len, 0).astype(np.int64)
        start = start0[None, :] + np.concatenate(
            [np.zeros((1, C), np.int64), np.cumsum(adv, axis=0)[:-1]])
        corr = np.zeros((E, C, K, 2), np.float32)
        corr[:, :, self.cfg.prompt_index, 0] = f16_lo(full[1])
        corr[:, :, self.cfg.prompt_index, 1] = f16_hi(full[1])

        def up(a):
            return np.repeat(a, D, axis=0)

        return TrackOutputs(
            valid=valid,
            start=start.astype(np.int32),
            cur_len=cur_len,
            correlators=corr,
            carrier_doppler_hz=up(fb(dec[1])),
            code_freq_delta=up(f16_hi(dec[2])),
            rem_code_phase_samples=fb(full[2]),
            rem_carr_phase_rad=up(fb(dec[0])),
            cn0_dbhz=up(f16_lo(dec[2])),
            active=(flags >> 17) & 1 > 0,
        )

    # -- symbol-grid compact packing (post-sync fast path) --------------
    #
    # Once the host knows each channel's bit/secondary boundary, telemetry
    # only needs one prompt per SYMBOL (20 epochs for 1C) and the
    # observables grid runs at the same cadence, so the capture program
    # reduces its full-rate buffers onto the symbol grid before readback:
    # 7 rows x (E/N) instead of 3.75 rows x E — ~10x less d2h, which is
    # the terminal backend's entire RTF wall (PERF.md round 4).  The hot
    # loop is untouched; this is a pure packing epilogue.

    @staticmethod
    def n_symbol_slots(n_epochs_cap: int, sym_n: int) -> int:
        return n_epochs_cap // sym_n + 2

    def _pack_outputs_symbol(self, bufs: TrackOutputs, entering_rem,
                             sym_off, N: int):
        f32, i32 = jnp.float32, jnp.int32
        cap, C = bufs.valid.shape
        S = self.n_symbol_slots(cap, N)
        p = self.cfg.prompt_index

        def bc(x):
            return jax.lax.bitcast_convert_type(x.astype(f32), i32)

        def f16x2(a, b):
            ah = jax.lax.bitcast_convert_type(
                a.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
            bh = jax.lax.bitcast_convert_type(
                b.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
            return (ah | (bh << 16)).astype(i32)

        b0 = sym_off[None, :].astype(i32)                # [1, C], in [1, N]
        sl = jnp.arange(S, dtype=i32)
        # slot sums via per-channel roll + reshape: slot 0 = the partial
        # head [0, b0); slot s >= 1 covers [b0 + (s-1)N, b0 + sN).  Rolling
        # channel c forward by N - b0_c puts epoch b0 at row N, so an
        # [S, N] reshape sums each slot — no [S, cap, C] one-hot tensor
        # (that blows to ~0.5 GB for long captures).
        v = bufs.valid.astype(f32)
        prompt = bufs.correlators[:, :, p, :]            # [cap, C, 2]
        fields = jnp.concatenate(
            [prompt * v[..., None], v[..., None]], axis=-1)  # [cap, C, 3]
        P = S * N
        fields = jnp.pad(fields, ((0, P - cap), (0, 0), (0, 0)))
        rolled = jax.vmap(
            lambda col, sh: jnp.roll(col, sh, axis=0),
            in_axes=(1, 0), out_axes=1)(fields, (N - sym_off).astype(i32))
        sums = rolled.reshape(S, N, C, 3).sum(axis=1)    # [S, C, 3]
        mi = sums[..., 0] * (1.0 / N)
        mq = sums[..., 1] * (1.0 / N)
        vcount = sums[..., 2].astype(i32)
        # entering epoch of each slot and its predecessor (slot state rows
        # mirror the decim harvest's m-1 sampling)
        e_s = jnp.clip(b0 - N + sl[:, None] * N, 0, cap - 1)   # [S, C]
        em1 = jnp.clip(e_s - 1, 0, cap - 1)

        def take(a, idx):
            return jnp.take_along_axis(a, idx, axis=0)

        rem = bufs.rem_code_phase_samples
        prev = jnp.concatenate([entering_rem[None], rem[:-1]], axis=0)
        # pre-floor code-phase fraction (receiver._harvest wrap note): the
        # true drift is << 0.5 sample/epoch, so the round() recovers the
        # +-1-sample wrap the device's A.6 floor recursion realizes late
        fracs = rem - jnp.round(rem - prev)
        nv = jnp.sum(v, axis=0).astype(i32)              # [C]
        active_last = take(bufs.active,
                           jnp.clip(nv - 1, 0, cap - 1)[None, :])
        rows = jnp.concatenate([
            take(bufs.start, e_s),
            f16x2(mi, mq),
            bc(take(fracs, em1)),
            bc(take(bufs.rem_carr_phase_rad, em1)),
            bc(take(bufs.carrier_doppler_hz, em1)),
            f16x2(take(bufs.cn0_dbhz, em1),
                  take(bufs.code_freq_delta, em1)),
            vcount,
            (nv | (active_last[0].astype(i32) << 16))[None, :],
        ], axis=0)
        return rows

    def _unpack_outputs_symbol(self, packed: np.ndarray) -> SymbolOutputs:
        packed = np.asarray(packed)
        S = (packed.shape[0] - 1) // 7

        def fb(rows):
            return rows.view(np.float32)

        def f16_lo(rows):
            return (rows.view(np.uint32) & 0xFFFF).astype(np.uint16) \
                .view(np.float16).astype(np.float32)

        def f16_hi(rows):
            return (rows.view(np.uint32) >> 16).astype(np.uint16) \
                .view(np.float16).astype(np.float32)

        tail = packed[7 * S]
        return SymbolOutputs(
            start=packed[0:S],
            mean_i=f16_lo(packed[S:2 * S]),
            mean_q=f16_hi(packed[S:2 * S]),
            frac=fb(packed[2 * S:3 * S]),
            rem_carr_phase_rad=fb(packed[3 * S:4 * S]),
            carrier_doppler_hz=fb(packed[4 * S:5 * S]),
            cn0_dbhz=f16_lo(packed[5 * S:6 * S]),
            code_freq_delta=f16_hi(packed[5 * S:6 * S]),
            vcount=packed[6 * S:7 * S],
            n_valid=tail & 0xFFFF,
            active=(tail >> 16) & 1 > 0,
        )

    def _track_capture_impl(self, samples, state: TrackState, limit,
                            n_epochs, sym_off=None, *, n_epochs_cap: int,
                            sym_n: int = 0):
        """Dynamic epoch loop over a device-resident capture.

        `limit` (traced): epochs start only while start < limit.
        `n_epochs` (traced): epoch budget — a traced bound forces a real
        device loop (the terminal backend unrolls static-length scans, which
        makes long-capture compiles intractable).  Outputs are written into
        preallocated [n_epochs_cap, ...] buffers and returned as ONE packed
        [R, cap, C] i32 buffer (_pack_outputs), or — when sym_n > 0 and
        sym_off [C] gives each channel's symbol boundary (in [1, sym_n]) —
        the ~10x smaller symbol-grid reduction (_pack_outputs_symbol).
        """
        samples = self._pad_for_chunks(samples)
        C = self.cfg.n_channels
        K = self.cfg.n_taps
        f32 = jnp.float32
        E = self._chunk_epochs          # epochs per device-loop iteration
        n_chunks_cap = (n_epochs_cap + E - 1) // E
        cap = n_chunks_cap * E

        if sym_n > 0:
            def pack(b):
                return self._pack_outputs_symbol(
                    b, state.rem_code_phase_samples, sym_off, sym_n)
        else:
            def pack(b):
                return self._pack_outputs(b, state.start)
        bufs = TrackOutputs(
            valid=jnp.zeros((cap, C), bool),
            start=jnp.zeros((cap, C), jnp.int32),
            cur_len=jnp.zeros((cap, C), jnp.int32),
            correlators=jnp.zeros((cap, C, K, 2), f32),
            carrier_doppler_hz=jnp.zeros((cap, C), f32),
            code_freq_delta=jnp.zeros((cap, C), f32),
            rem_code_phase_samples=jnp.zeros((cap, C), f32),
            rem_carr_phase_rad=jnp.zeros((cap, C), f32),
            cn0_dbhz=jnp.zeros((cap, C), f32),
            active=jnp.zeros((cap, C), bool),
        )

        if self.cfg.correlator == "pallas":
            fst0, ist0 = self._pack_rows(state, limit)
            rep_rows = self._rep_rows[state.prn_slot]
            sec_rows = jnp.transpose(self._sec[state.prn_slot])

            def chunk_p(i, carry):
                f, s, b = carry
                f, s, stacked = self._pallas_chunk(
                    samples, f, s, rep_rows, sec_rows)
                b = jax.tree.map(
                    lambda buf, o: jax.lax.dynamic_update_slice_in_dim(
                        buf, o.astype(buf.dtype), i * E, 0),
                    b, stacked)
                return f, s, b

            n_chunks = (n_epochs + E - 1) // E
            fst, ist, bufs = jax.lax.fori_loop(
                0, n_chunks, chunk_p, (fst0, ist0, bufs))
            return self._unpack_rows(state, fst, ist), pack(bufs)

        if self.cfg.correlator in ("fft", "mxu"):
            def chunk(i, carry):
                st, b = carry
                st, stacked = self._chunk_step(samples, st, limit)
                b = jax.tree.map(
                    lambda buf, o: jax.lax.dynamic_update_slice_in_dim(
                        buf, o.astype(buf.dtype), i * E, 0),
                    b, stacked)
                return st, b
        else:
            # flat dynamic loop with a manually inlined body: the terminal
            # backend hangs compiling nested control flow (scan-in-scan,
            # scan-in-fori), so the body runs E epoch steps as straight-line
            # code and writes their stacked outputs once — amortizing
            # per-iteration loop overhead without nesting
            def chunk(i, carry):
                st, b = carry
                outs_list = []
                for _ in range(E):
                    st, out = self._epoch_step(samples, st, limit)
                    outs_list.append(out)
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0),
                                       *outs_list)
                b = jax.tree.map(
                    lambda buf, o: jax.lax.dynamic_update_slice_in_dim(
                        buf, o.astype(buf.dtype), i * E, 0),
                    b, stacked)
                return st, b

        n_chunks = (n_epochs + E - 1) // E
        st, bufs = jax.lax.fori_loop(0, n_chunks, chunk, (state, bufs))
        return st, pack(bufs)

    # ---------------- host API ----------------

    def track_block(self, samples: np.ndarray, state: TrackState, base: int):
        """Process one sample block.

        `samples`: complex64 host array (or planar float32 [S, 2]) holding
        `base + epoch_samples_max` samples — the tail overlaps the next
        block.  Every active channel advances through all epochs that START
        within [0, base).  Returns (state_rebased, TrackOutputs[E, C, ...]).
        """
        n_epochs = base // (self._t0_int - 2) + 2
        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            samples = to_planar(samples)
        if samples.shape[0] < base + self.cfg.epoch_samples_max:
            raise ValueError(
                f"block must be >= base+epoch_samples_max ="
                f" {base + self.cfg.epoch_samples_max}, got {samples.shape[0]}"
            )
        new_state, outs = self._block_fn(
            jnp.asarray(samples), state, base=base, n_epochs=n_epochs
        )
        return self.rebase(new_state, base), outs

    def track_capture_symbols(self, samples_device, state: TrackState,
                              span: int, sym_off, sym_n: int):
        """Whole-capture tracking with symbol-grid compact readback.

        `sym_off` [C] int: each channel's next symbol boundary as an epoch
        index in [1, sym_n] (host bit/secondary sync supplies it); `sym_n`
        the symbols-per-... epochs per symbol (20 for GPS L1 C/A).  Returns
        (state_rebased, SymbolOutputs) — ~10x less d2h than track_capture
        (see _pack_outputs_symbol).
        """
        need = span + self.cfg.epoch_samples_max
        if samples_device.shape[0] < need:
            raise ValueError(f"capture must hold >= {need} samples")
        n_epochs = span // (self._t0_int - 2) + 2
        if n_epochs > 0xFFFF:
            # the tail row packs n_valid | active<<16 into one i32
            raise ValueError(
                "symbol-readback segments are capped at 65535 epochs; "
                "split the capture into shorter segments")
        st, packed = self._capture_fn(
            samples_device, state, jnp.int32(span), jnp.int32(n_epochs),
            jnp.asarray(sym_off, dtype=jnp.int32),
            n_epochs_cap=n_epochs, sym_n=int(sym_n))
        return self.rebase(st, span), self._unpack_outputs_symbol(packed)

    def track_capture(self, samples_device, state: TrackState, span: int,
                      segment_epochs: int | None = None):
        """Process a whole device-resident capture segment in one call.

        `samples_device`: planar float32 [S, 2] jax array on device with
        S >= span + epoch_samples_max; every active channel consumes all
        epochs starting within [0, span).  Returns (state_rebased_by_span,
        TrackOutputs with a leading [n_epochs] axis and segment-relative
        epoch starts).  This is the production fast path — one host
        round-trip per segment instead of per block.
        """
        need = span + self.cfg.epoch_samples_max
        if samples_device.shape[0] < need:
            raise ValueError(f"capture must hold >= {need} samples")
        if segment_epochs is None:
            n_epochs = span // (self._t0_int - 2) + 2
            st, packed = self._capture_fn(
                samples_device, state, jnp.int32(span), jnp.int32(n_epochs),
                n_epochs_cap=n_epochs)
            return self.rebase(st, span), self._unpack_outputs(packed)
        # segmented: one compiled program (fixed buffer capacity) called
        # repeatedly with an advancing sample limit.  All segments are
        # DISPATCHED before any readback (async jax dispatch chains them on
        # the state future), so each segment's packed-buffer transfer
        # overlaps the next segment's device compute — the terminal
        # backend's readback latency would otherwise serialize with compute
        cap = int(segment_epochs)
        seg_span = (cap - 2) * (self._t0_int - 2)
        st = state
        pending = []
        k = 0
        while k * seg_span < span:
            lim = min(span, (k + 1) * seg_span)
            st, packed = self._capture_fn(
                samples_device, st, jnp.int32(lim), jnp.int32(cap),
                n_epochs_cap=cap)
            try:
                # start the d2h of this segment as soon as its compute
                # finishes, overlapping the next segments' device work
                # (np.asarray alone pulls on demand, serializing transfer
                # after ALL compute)
                packed.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
            pending.append(packed)
            k += 1
        outs = [self._unpack_outputs(p) for p in pending]
        collected = jax.tree.map(
            lambda *xs: np.concatenate(xs), *outs)
        return self.rebase(st, span), collected
