"""Channel-batched scan-carried tracking engine.

Reference parity: dll_pll_veml_tracking.cc (src/algorithms/tracking/
gnuradio_blocks/).  The reference runs one GNU Radio thread per channel with a
state machine in general_work (:1544-1900); here every channel advances in
lock-step through a `lax.scan` over integration epochs inside one jitted
call per sample block, with the multicorrelator vmapped across channels
(SURVEY.md §2.7 TPU mapping).  The channel lifecycle FSM (acquisition ->
pull-in -> track -> drop) lives on HOST between blocks; the device carries
only branch-light per-channel loop state.

Numerical contracts implemented exactly (SURVEY.md Appendix A):
  A.2 floor code resampler      A.3 discriminators
  A.4 carrier-aided code NCO    A.5 loop filters (FLL-assisted PLL + IIR DLL)
  A.6 NCO stepping & variable block length (floor/remainder recursion,
      computed in split precision so float32 device math stays < 1e-6
      samples/epoch of the reference's double recursion)
  A.7 CN0 SNV estimator + carrier lock detector + max_lock_fail counter

Variable block length: the reference consumes d_current_prn_length_samples
(varies +-1-2 samples with code Doppler) per GR work call; here each scan
step slices a fixed `epoch_samples_max` window at the channel's `start`
index and masks samples beyond `cur_len` (SURVEY.md §7 hard part 1).
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
)
from .lock_detectors import carrier_lock_detector, cn0_svn_estimator
from .loop_filter import (
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
    prompt_hist: jnp.ndarray       # f32 [C, cn0_samples, 2] sliding buffer
    hist_count: jnp.ndarray        # int32 prompts accumulated
    lock_fail: jnp.ndarray         # int32 consecutive lock failures
    epochs_in_track: jnp.ndarray   # int32 epochs since pull-in
    fll_on: jnp.ndarray            # bool — FLL pull-in transitory active


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
    """

    def __init__(self, cfg: TrackConfig, codes: np.ndarray):
        self.cfg = cfg
        if codes.ndim != 2:
            raise ValueError("codes must be [n_slots, code_samples]")
        self._codes = jnp.asarray(codes, dtype=jnp.float32)
        self._shifts = jnp.asarray(
            np.asarray(cfg.tap_shifts_chips(), dtype=np.float32)
            * cfg.code_samples_per_chip
        )
        # loop filter constants
        self._fllpll = fll_pll_coefficients(
            cfg.fll_bw_hz, cfg.pll_bw_hz, cfg.pll_filter_order
        )
        b_in, b_out = iir_coefficients(
            cfg.dll_bw_hz, cfg.code_period_s, cfg.dll_filter_order, False
        )
        self._dll_b_in = jnp.asarray(b_in)
        self._dll_b_out = jnp.asarray(b_out)
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
        if cfg.correlator == "fft":
            F = 1
            while F < cfg.epoch_samples_max + 2 * self._lag_margin:
                F <<= 1
            self._fft_size = F
            a0 = cfg.chip_rate_chips_s * cfg.code_samples_per_chip / cfg.fs_hz
            n = np.arange(F, dtype=np.float64)
            lv = codes.shape[1]
            idx = np.mod(np.floor(a0 * (n + self._lag_margin)).astype(np.int64), lv)
            reps = codes[:, idx].astype(np.float32)         # [slots, F]
            rep_fft_conj = np.conj(np.fft.fft(reps, axis=1)).astype(np.complex64)
            self._rep_fft_conj_planar = jnp.asarray(
                np.stack([rep_fft_conj.real, rep_fft_conj.imag], axis=-1))
        # inner static scan length of the hybrid capture loop
        self._chunk_epochs = 4
        self._fll_epochs = int(round(cfg.pull_in_time_s / cfg.code_period_s))
        self._block_fn = jax.jit(
            self._track_block_impl, static_argnames=("base", "n_epochs")
        )
        self._capture_fn = jax.jit(
            self._track_capture_impl,
            static_argnames=("n_epochs_cap",),
        )

    # ---------------- state management (host) ----------------

    def init_state(self) -> TrackState:
        C = self.cfg.n_channels
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
            prompt_hist=jnp.zeros((C, self.cfg.cn0_samples, 2), f32),
            hist_count=zi,
            lock_fail=zi,
            epochs_in_track=zi,
            fll_on=jnp.zeros(C, bool),
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
            prompt_hist=state.prompt_hist.at[ch].set(0.0),
            hist_count=set_at(state.hist_count, 0),
            lock_fail=set_at(state.lock_fail, 0),
            epochs_in_track=set_at(state.epochs_in_track, 0),
            fll_on=set_at(state.fll_on, bool(self.cfg.enable_fll_pull_in)),
        )

    def deactivate_channel(self, state: TrackState, ch: int) -> TrackState:
        return state._replace(active=state.active.at[ch].set(False))

    def rebase(self, state: TrackState, base: int) -> TrackState:
        """Shift block-relative start indices after a block is consumed."""
        return state._replace(start=state.start - jnp.int32(base))

    # ---------------- device path ----------------

    def _fft_correlate(self, segs, state: TrackState, carr_step):
        """FFT-lag correlator: carrier wipe-off, one batched circular
        correlation against the precomputed replica-template FFT, taps read
        by linear interpolation at fractional sample lags.

        Numerics vs the reference's floor resampler: the interpolated
        correlator has LESS code-phase scalloping; the replica is at the
        nominal chip rate (code-Doppler rate mismatch within one epoch is
        < 0.01 chips — negligible).  No per-sample gathers, so it runs at
        VPU/FFT speed on TPU where gathers serialize.
        """
        cfg = self.cfg
        f32 = jnp.float32
        C, Nmax = segs.shape
        F = self._fft_size
        n = jnp.arange(Nmax, dtype=f32)
        phase = state.rem_carr_phase_rad[:, None] + carr_step[:, None] * n[None, :]
        wiped = segs * jax.lax.complex(jnp.cos(phase), -jnp.sin(phase))
        mask = n[None, :] < state.cur_len[:, None].astype(f32)
        wiped = jnp.where(mask, wiped, 0.0 + 0.0j)
        rep_fft_conj = unpack_complex(self._rep_fft_conj_planar)[state.prn_slot]
        z = jnp.fft.ifft(jnp.fft.fft(wiped, n=F, axis=-1) * rep_fft_conj,
                         axis=-1)                              # [C, F]
        # tap lag positions: margin + rem_samples*(code_freq/chip_rate)
        #                    - shift_chips * fs/chip_rate
        samples_per_chip = f32(cfg.fs_hz / cfg.chip_rate_chips_s)
        rem_samples = state.rem_code_phase_samples * (
            1.0 + state.code_freq_delta / f32(cfg.chip_rate_chips_s))
        shifts_chips = jnp.asarray(
            np.asarray(cfg.tap_shifts_chips(), dtype=np.float32))
        pos = (f32(self._lag_margin) + rem_samples[:, None]
               - shifts_chips[None, :] * samples_per_chip)     # [C, K]
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - i0.astype(f32)

        def read(zc, i0c, fracc):
            def one(i, fr):
                pair = jax.lax.dynamic_slice(zc, (i,), (2,))
                return pair[0] * (1.0 - fr) + pair[1] * fr
            return jax.vmap(one)(i0c, fracc)

        return jax.vmap(read)(z, i0, frac)                     # [C, K]

    def _epoch_step(self, samples_p, state: TrackState, base: int):
        cfg = self.cfg
        f32 = jnp.float32
        Nmax = cfg.epoch_samples_max

        valid = state.active & (state.start < jnp.int32(base))

        # --- correlation (A.1/A.2) ---
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
        chip_rate = f32(cfg.chip_rate_chips_s)
        code_freq = chip_rate + state.code_freq_delta
        code_step = code_freq / f32(cfg.fs_hz) * spc
        rem_code_chips = code_freq * state.rem_code_phase_samples / f32(cfg.fs_hz) * spc
        carr_step = f32(_TWO_PI) * state.carrier_doppler_hz / f32(cfg.fs_hz)

        if cfg.correlator == "fft":
            corr = self._fft_correlate(segs, state, carr_step)
        else:
            code_rows = self._codes[state.prn_slot]            # [C, Lspc]
            corr = jax.vmap(
                multicorrelate, in_axes=(0, 0, None, 0, 0, 0, 0, None, 0)
            )(
                segs, code_rows, self._shifts, code_step, rem_code_chips,
                state.rem_carr_phase_rad, carr_step, f32(0.0),
                state.cur_len.astype(f32),
            )                                                  # [C, K]

        prompt = corr[:, cfg.prompt_index]
        t_int = state.cur_len.astype(f32) / f32(cfg.fs_hz)

        # --- discriminators + filters (A.3/A.5, run_dll_pll :914-996) ---
        prev_prompt = unpack_complex(state.prev_prompt)
        carr_phase_err_cyc = pll_cloop_two_quadrant_atan(prompt) / f32(_TWO_PI)
        freq_err_hz = fll_four_quadrant_atan(
            prev_prompt, prompt, f32(0.0), t_int
        ) / f32(_TWO_PI)
        fll_on = state.fll_on
        pll_in = jnp.where(fll_on, f32(0.0), carr_phase_err_cyc)
        fll_in = jnp.where(
            fll_on & (state.hist_count > 0), freq_err_hz, f32(0.0)
        )
        carr_filt, doppler = fll_pll_apply(
            state.carr_filter, self._fllpll, fll_in, pll_in, t_int
        )

        if cfg.veml:
            code_err_chips = dll_nc_vemlp_normalized(
                corr[:, 0], corr[:, 1], corr[:, 3], corr[:, 4]
            )
        else:
            code_err_chips = dll_nc_e_minus_l_normalized(corr[:, 0], corr[:, 2])
        code_filt, code_err_filt = iir_apply(
            state.code_filter, code_err_chips, self._dll_b_in, self._dll_b_out
        )
        # carrier-aided code NCO (A.4):
        # code_freq = (1 + doppler/f_carrier)*chip_rate - code_err_filt
        code_freq_delta = (
            chip_rate / f32(cfg.carrier_freq_hz) * doppler - code_err_filt
        )

        # --- NCO stepping / next block length (A.6, split precision) ---
        new_code_freq = chip_rate + code_freq_delta
        d_t = -f32(self._t0_int) * code_freq_delta / new_code_freq \
            - f32(self._t0_frac) * code_freq_delta / new_code_freq
        frac = f32(self._t0_frac) + d_t + state.rem_code_phase_samples
        frac_floor = jnp.floor(frac)
        next_len = (jnp.int32(self._t0_int) + frac_floor.astype(jnp.int32))
        new_rem_code = frac - frac_floor

        new_carr_step = f32(_TWO_PI) * doppler / f32(cfg.fs_hz)
        new_rem_carr = jnp.mod(
            state.rem_carr_phase_rad
            + new_carr_step * next_len.astype(f32),
            f32(_TWO_PI),
        )
        # NOTE (vs reference :1044): the reference advances rem_carr_phase by
        # step*N for the block just processed; we precompute the phase at the
        # next epoch start using the NEW step over the NEXT block, which is
        # the same recursion expressed at epoch boundaries.

        # --- CN0 / lock supervision (A.7) ---
        hist_p = jnp.concatenate(
            [state.prompt_hist[:, 1:], pack_complex(prompt)[:, None, :]], axis=1
        )
        hist = unpack_complex(hist_p)
        hist_count = jnp.minimum(state.hist_count + 1, cfg.cn0_samples)
        hist_full = hist_count >= cfg.cn0_samples
        cn0 = cn0_svn_estimator(hist, f32(cfg.code_period_s))
        carrier_lock = carrier_lock_detector(hist)
        # No phase lock exists during the FLL pull-in transitory; supervision
        # starts once the PLL takes over (reference keeps the channel through
        # its pull-in transitory via the wide/narrow state split, :1601) and
        # after a grace period covering PLL pull-in transients.  The check
        # fires once per cn0_samples NEW prompts — the reference evaluates
        # cn0_and_tracking_lock_status on non-overlapping buffers (:839), so
        # max_lock_fail counts 20-symbol windows, not epochs.
        check_now = jnp.mod(state.epochs_in_track + 1, cfg.cn0_samples) == 0
        fail = check_now & hist_full & ~state.fll_on & (
            state.epochs_in_track >= cfg.supervision_grace_epochs
        ) & (
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
        fll_still_on = state.fll_on & (epochs_in_track < self._fll_epochs)

        new_state = TrackState(
            active=still_active,
            prn_slot=state.prn_slot,
            start=state.start + state.cur_len,
            cur_len=next_len,
            rem_code_phase_samples=new_rem_code,
            code_freq_delta=code_freq_delta,
            carrier_doppler_hz=doppler,
            rem_carr_phase_rad=new_rem_carr,
            carr_filter=carr_filt,
            code_filter=code_filt,
            prev_prompt=pack_complex(prompt),
            prompt_hist=hist_p,
            hist_count=hist_count,
            lock_fail=lock_fail,
            epochs_in_track=epochs_in_track,
            fll_on=fll_still_on,
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
            cn0_dbhz=jnp.where(valid & hist_full, cn0, f32(0.0)),
            active=merged.active,
        )
        return merged, outputs

    def _track_block_impl(self, samples, state: TrackState, *, base: int, n_epochs: int):
        def step(carry, _):
            return self._epoch_step(samples, carry, base)

        return jax.lax.scan(step, state, None, length=n_epochs)

    def _track_capture_impl(self, samples, state: TrackState, limit,
                            n_epochs, *, n_epochs_cap: int):
        """Dynamic epoch loop over a device-resident capture.

        `limit` (traced): epochs start only while start < limit.
        `n_epochs` (traced): loop trip count — a traced bound forces a real
        device loop (the terminal backend unrolls static-length scans, which
        makes long-capture compiles intractable).  Outputs are written into
        preallocated [n_epochs_cap, ...] buffers.
        """
        C = self.cfg.n_channels
        K = self.cfg.n_taps
        f32 = jnp.float32
        E = self._chunk_epochs          # static inner-scan length
        n_chunks_cap = (n_epochs_cap + E - 1) // E
        cap = n_chunks_cap * E
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
        return jax.lax.fori_loop(0, n_chunks, chunk, (state, bufs))

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
            st, outs = self._capture_fn(
                samples_device, state, jnp.int32(span), jnp.int32(n_epochs),
                n_epochs_cap=n_epochs)
            return self.rebase(st, span), outs
        # segmented: one compiled program (fixed buffer capacity) called
        # repeatedly with an advancing sample limit — bounds the loop-carry
        # output buffers (large carries degrade the device loop) while
        # keeping the capture resident
        cap = int(segment_epochs)
        seg_span = (cap - 2) * (self._t0_int - 2)
        st = state
        collected = None
        k = 0
        while k * seg_span < span:
            lim = min(span, (k + 1) * seg_span)
            st, outs = self._capture_fn(
                samples_device, st, jnp.int32(lim), jnp.int32(cap),
                n_epochs_cap=cap)
            host = jax.tree.map(np.asarray, outs)
            collected = host if collected is None else jax.tree.map(
                lambda a, b: np.concatenate([a, b]), collected, host)
            k += 1
        return self.rebase(st, span), collected
