"""Kalman-filter carrier tracking (channel-batched, scan-carried).

Reference parity: gps_l1_ca_kf_tracking_cc.{h,cc} (src/algorithms/tracking/
gnuradio_blocks/, state model :203-249, predict/update :748-796) and the
normal-inverse-Wishart measurement-covariance estimator
(src/algorithms/tracking/libs/bayesian_estimation.cc:update_sequential).

The reference runs one KF per channel inside a GNU Radio thread with arma
matrices.  Here the filter state is batched over channels ([C, 3] state,
[C, 3, 3] covariance) and every epoch's predict + scalar-measurement update
is closed-form (the innovation covariance is 1x1, so no matrix inverse) —
one fused XLA program per epoch across all channels, TPU-native.

State (order 3; order 2 zeroes the rate row/column):
    x = [carrier phase at epoch start (rad), Doppler (Hz), Doppler rate (Hz/s)]
    F = [[1, 2*pi*T, pi*T^2], [0, 1, T], [0, 0, 1]]        (:214-243)
    H = [1, 0, 0]
    y = Costas two-quadrant atan of the Prompt (rad)       (:752)
    R = sigma2 of the phase detector from the running CN0  (:755-760)
    Q = diag(T^4, T, T)                                    (:210-236)

Code tracking stays the reference's 2nd-order IIR DLL with carrier aiding
(:795-805) — the KF replaces only the PLL/FLL cascade.

Bayesian covariance (bayes_run): after `ptrans` epochs the NIW posterior of
the innovation starts accumulating; after `ptrans + strans` epochs the
innovation covariance P_y is taken from the NIW estimate instead of
H P_pre H' + R (:763-776).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.multicorrelator import multicorrelate
from ..utils.planar import pack_complex, to_planar, unpack_complex
from .discriminators import dll_nc_e_minus_l_normalized, pll_cloop_two_quadrant_atan
from .lock_detectors import carrier_lock_detector, cn0_svn_estimator
from .loop_filter import IirState, iir_apply, iir_coefficients

_TWO_PI = 2.0 * np.pi


@dataclasses.dataclass(frozen=True)
class KfTrackConfig:
    fs_hz: float
    code_length_chips: int
    chip_rate_chips_s: float
    carrier_freq_hz: float
    n_channels: int = 12
    order: int = 2                     # 2 = phase+Doppler, 3 = +Doppler rate
    dll_bw_hz: float = 2.0
    early_late_space_chips: float = 0.5
    # initial covariances (gps_l1_ca_kf_tracking_cc.cc:195-205)
    sigma2_carrier_phase: float = _TWO_PI / 4.0
    sigma2_doppler: float = 450.0
    sigma2_doppler_rate: float = (4.0 * _TWO_PI) ** 2 / 12.0
    # Bayesian covariance estimation (bce_* ctor args, :254-262)
    bayes_run: bool = False
    bayes_ptrans: int = 50             # prediction-only transitory [epochs]
    bayes_strans: int = 50             # estimation transitory [epochs]
    bayes_nu: int = 0
    bayes_kappa: int = 0
    cn0_samples: int = 20
    cn0_min_dbhz: float = 25.0
    max_lock_fail: int = 50
    carrier_lock_th: float = 0.85

    @property
    def code_period_s(self) -> float:
        return self.code_length_chips / self.chip_rate_chips_s

    @property
    def samples_per_code(self) -> float:
        return self.fs_hz * self.code_length_chips / self.chip_rate_chips_s

    @property
    def epoch_samples_max(self) -> int:
        import math
        return int(math.floor(self.samples_per_code * (1.0 + 1e-4))) + 2


class KfTrackState(NamedTuple):
    """Per-channel KF tracking state ([C] leading axis everywhere)."""

    active: jnp.ndarray        # bool
    prn_slot: jnp.ndarray      # int32
    start: jnp.ndarray         # int32 next epoch start (block-relative)
    cur_len: jnp.ndarray       # int32
    rem_code_phase_samples: jnp.ndarray  # f32
    code_freq_delta: jnp.ndarray         # f32 chips/s above nominal
    x: jnp.ndarray             # f32 [C, 3] KF state
    P: jnp.ndarray             # f32 [C, 3, 3] state covariance
    code_filter: IirState      # DLL IIR
    cn0_dbhz: jnp.ndarray      # f32 running CN0 (drives R)
    prompt_hist: jnp.ndarray   # f32 [C, cn0_samples, 2]
    hist_count: jnp.ndarray    # int32
    lock_fail: jnp.ndarray     # int32
    epochs: jnp.ndarray        # int32 KF iterations since pull-in (kf_iter)
    # NIW posterior hyper-parameters of the innovation (scalar case)
    niw_mu: jnp.ndarray        # f32
    niw_kappa: jnp.ndarray     # f32
    niw_nu: jnp.ndarray        # f32
    niw_psi: jnp.ndarray       # f32
    niw_psi_est: jnp.ndarray   # f32 current Psi estimate (P_y when active)


class KfTrackOutputs(NamedTuple):
    valid: jnp.ndarray
    start: jnp.ndarray
    cur_len: jnp.ndarray
    correlators: jnp.ndarray   # [E, C, 3, 2]
    carrier_doppler_hz: jnp.ndarray
    doppler_rate_hz_s: jnp.ndarray
    carr_phase_sigma2: jnp.ndarray   # R estimate in use (:791)
    code_freq_delta: jnp.ndarray
    rem_code_phase_samples: jnp.ndarray
    # filtered NCO carrier phase (kf_x(0), d_rem_carr_phase_rad :786)
    # wrapped to [0, 2pi) — the receiver's phase ledger consumes it like
    # the DLL/PLL engine's rem_carr_phase_rad output
    rem_carr_phase_rad: jnp.ndarray
    cn0_dbhz: jnp.ndarray
    active: jnp.ndarray


def _phase_sigma2(cn0_dbhz, t):
    """Phase-detector variance from CN0 (gps_l1_ca_kf_tracking_cc.cc:755-758):
    sigma2 = 1/(2*CN0*T) * (1 + 1/(2*CN0*T))   [rad^2]."""
    cn_lin = jnp.power(10.0, cn0_dbhz / 10.0)
    a = 1.0 / (2.0 * cn_lin * t)
    return a * (1.0 + a)


class KfTrackingEngine:
    """Channel-batched Kalman carrier tracking + IIR DLL.

    `codes` is [n_slots, code_len] float32 +-1 at 1 sample/chip (the gather
    multicorrelator resamples on the fly, A.2 floor contract)."""

    def __init__(self, cfg: KfTrackConfig, codes: np.ndarray):
        if cfg.order not in (2, 3):
            raise ValueError("KF order must be 2 or 3")
        self.cfg = cfg
        self._codes = jnp.asarray(codes, dtype=jnp.float32)
        el = cfg.early_late_space_chips
        self._shifts = jnp.asarray([-el, 0.0, el], dtype=jnp.float32)
        b_in, b_out = iir_coefficients(cfg.dll_bw_hz, cfg.code_period_s, 2, False)
        self._dll_b_in = jnp.asarray(b_in)
        self._dll_b_out = jnp.asarray(b_out)
        t0 = float(cfg.samples_per_code)
        self._t0_int = int(np.floor(t0))
        self._t0_frac = float(t0 - self._t0_int)
        self._win = cfg.epoch_samples_max + self._t0_int + 66
        # constant matrices (order-2 zeroes the rate row/col so one [3,3]
        # program covers both orders)
        t = cfg.code_period_s
        f = np.eye(3, dtype=np.float32)
        f[0, 1] = _TWO_PI * t
        f[1, 2] = t
        f[0, 2] = 0.5 * _TWO_PI * t * t
        q = np.diag([t**4, t, t]).astype(np.float32)
        p0 = np.diag([cfg.sigma2_carrier_phase, cfg.sigma2_doppler,
                      cfg.sigma2_doppler_rate]).astype(np.float32)
        if cfg.order == 2:
            f[0, 2] = f[1, 2] = 0.0
            q[2, 2] = 0.0
            p0[2, 2] = 0.0
        self._F = jnp.asarray(f)
        self._Q = jnp.asarray(q)
        self._P0 = np.asarray(p0)
        self._block_fn = jax.jit(
            self._track_block_impl, static_argnames=("base", "n_epochs"))

    # ---------------- host state management ----------------

    def init_state(self) -> KfTrackState:
        C = self.cfg.n_channels
        f32 = jnp.float32
        zf = jnp.zeros(C, f32)
        zi = jnp.zeros(C, jnp.int32)
        return KfTrackState(
            active=jnp.zeros(C, bool), prn_slot=zi, start=zi,
            cur_len=jnp.full(C, self._t0_int, jnp.int32),
            rem_code_phase_samples=zf, code_freq_delta=zf,
            x=jnp.zeros((C, 3), f32),
            P=jnp.broadcast_to(jnp.asarray(self._P0), (C, 3, 3)),
            code_filter=IirState(inputs=jnp.zeros((C, 3), f32),
                                 outputs=jnp.zeros((C, 3), f32)),
            cn0_dbhz=jnp.full(C, 30.0, f32),   # CN_dB_Hz init (:192)
            prompt_hist=jnp.zeros((C, self.cfg.cn0_samples, 2), f32),
            hist_count=zi, lock_fail=zi, epochs=zi,
            niw_mu=zf, niw_kappa=zf, niw_nu=zf, niw_psi=zf,
            niw_psi_est=zf,
        )

    def activate_channel(self, state: KfTrackState, ch: int, prn_slot: int,
                         acq_delay_samples: float, acq_doppler_hz: float,
                         acq_samplestamp: int, block_start_abs: int,
                         doppler_step_hz: float | None = None) -> KfTrackState:
        """Pull-in (:700-730): align to the acq code boundary, seed the KF
        state from Acq_doppler and the phase implied by the sample offset;
        optionally tighten the Doppler prior to (step/3)^2 (:276-279)."""
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
        samples_offset = start_abs - boundary_abs
        phase0 = _TWO_PI * acq_doppler_hz / cfg.fs_hz * samples_offset  # (:720)

        p0 = np.array(self._P0)
        if doppler_step_hz is not None:
            p0[1, 1] = (float(doppler_step_hz) / 3.0) ** 2

        def sa(arr, v):
            return arr.at[ch].set(v)

        return state._replace(
            active=sa(state.active, True),
            prn_slot=sa(state.prn_slot, prn_slot),
            start=sa(state.start, start_i),
            cur_len=sa(state.cur_len, cur_len),
            rem_code_phase_samples=sa(state.rem_code_phase_samples, rem),
            code_freq_delta=sa(state.code_freq_delta,
                               code_freq - cfg.chip_rate_chips_s),
            x=state.x.at[ch].set(
                jnp.asarray([phase0, acq_doppler_hz, 0.0], jnp.float32)),
            P=state.P.at[ch].set(jnp.asarray(p0, jnp.float32)),
            code_filter=IirState(
                inputs=state.code_filter.inputs.at[ch].set(0.0),
                outputs=state.code_filter.outputs.at[ch].set(0.0)),
            cn0_dbhz=sa(state.cn0_dbhz, 30.0),
            prompt_hist=state.prompt_hist.at[ch].set(0.0),
            hist_count=sa(state.hist_count, 0),
            lock_fail=sa(state.lock_fail, 0),
            epochs=sa(state.epochs, 0),
            niw_mu=sa(state.niw_mu, 0.0),
            niw_kappa=sa(state.niw_kappa, float(self.cfg.bayes_kappa)),
            niw_nu=sa(state.niw_nu, float(self.cfg.bayes_nu)),
            # Psi prior = (H P0 H' + R)*(nu+2) (:262)
            niw_psi=sa(state.niw_psi,
                       (p0[0, 0] + float(_phase_sigma2(
                           jnp.float32(30.0), self.cfg.code_period_s)))
                       * (self.cfg.bayes_nu + 2.0)),
            niw_psi_est=sa(state.niw_psi_est, 0.0),
        )

    def rebase(self, state: KfTrackState, base: int) -> KfTrackState:
        return state._replace(start=state.start - jnp.int32(base))

    def deactivate_channel(self, state, ch):
        return state._replace(active=state.active.at[ch].set(False))

    # ---------------- device epoch step ----------------

    def _epoch_step(self, samples_p, state: KfTrackState, limit):
        cfg = self.cfg
        f32 = jnp.float32
        Nmax = cfg.epoch_samples_max
        valid = state.active & (state.start < jnp.int32(limit))

        n_samp = samples_p.shape[0]
        win = min(self._win, n_samp)
        m = jnp.min(jnp.where(state.active, state.start, jnp.int32(1 << 29)))
        m = jnp.clip(m, 0, n_samp - win)
        window = jax.lax.dynamic_slice(samples_p, (m, 0), (win, 2))
        off = jnp.clip(state.start - m, 0, win - Nmax)
        segs = unpack_complex(jax.vmap(
            lambda s: jax.lax.dynamic_slice(window, (s, 0), (Nmax, 2)))(off))

        code_freq = f32(cfg.chip_rate_chips_s) + state.code_freq_delta
        code_step = code_freq / f32(cfg.fs_hz)
        rem_code_chips = code_freq * state.rem_code_phase_samples / f32(cfg.fs_hz)
        doppler = state.x[:, 1]
        carr_step = f32(_TWO_PI) * doppler / f32(cfg.fs_hz)
        # phase state is the NCO phase at epoch start (d_rem_carr_phase_rad
        # = kf_x(0), :786); order 3 feeds the Doppler-rate state into the
        # correlator's quadratic phase term — the high-dynamics resampler
        # variant (volk ..._resampler with phase-rate, dll_pll high_dyn)
        carr_phase = state.x[:, 0]
        carr_rate = (f32(_TWO_PI) * state.x[:, 2] / f32(cfg.fs_hz) ** 2
                     if self.cfg.order == 3 else jnp.zeros_like(carr_step))
        corr = jax.vmap(
            multicorrelate, in_axes=(0, 0, None, 0, 0, 0, 0, 0, 0)
        )(segs, self._codes[state.prn_slot], self._shifts, code_step,
          rem_code_chips, carr_phase, carr_step, carr_rate,
          state.cur_len.astype(f32))                     # [C, 3] complex
        prompt = corr[:, 1]

        t = f32(cfg.code_period_s)
        # --- KF predict (:748-749) ---
        x_pre = jnp.einsum("ij,cj->ci", self._F, state.x)
        P_pre = self._F @ state.P @ self._F.T + self._Q

        # --- measurement (:752-760) ---
        y = pll_cloop_two_quadrant_atan(prompt)          # rad
        r = _phase_sigma2(state.cn0_dbhz, t)

        # --- NIW innovation-covariance estimate (bayesian_estimation.cc,
        # sequential K=1 scalar update) ---
        if cfg.bayes_run:
            upd_niw = valid & (state.epochs >= cfg.bayes_ptrans)
            kap, nu, mu, psi = (state.niw_kappa, state.niw_nu,
                                state.niw_mu, state.niw_psi)
            mu_post = (kap * mu + y) / (kap + 1.0)
            kap_post = kap + 1.0
            nu_post = nu + 1.0
            psi_post = psi + kap / (kap + 1.0) * (y - mu) ** 2
            psi_est = jnp.where(nu_post - 2.0 > 0.0,
                                psi_post / (nu_post - 2.0),
                                psi_post / (nu_post + 2.0))
            niw_mu = jnp.where(upd_niw, mu_post, mu)
            niw_kappa = jnp.where(upd_niw, kap_post, kap)
            niw_nu = jnp.where(upd_niw, nu_post, nu)
            niw_psi = jnp.where(upd_niw, psi_post, psi)
            niw_psi_est = jnp.where(upd_niw, psi_est, state.niw_psi_est)
            use_bayes = state.epochs >= (cfg.bayes_ptrans + cfg.bayes_strans)
            p_y = jnp.where(use_bayes, niw_psi_est, P_pre[:, 0, 0] + r)
            r_est = jnp.where(use_bayes, niw_psi_est - P_pre[:, 0, 0], r)
        else:
            niw_mu, niw_kappa = state.niw_mu, state.niw_kappa
            niw_nu, niw_psi = state.niw_nu, state.niw_psi
            niw_psi_est = state.niw_psi_est
            p_y = P_pre[:, 0, 0] + r
            r_est = r

        # --- scalar-measurement update (:779-782), H = [1,0,0] ---
        K = P_pre[:, :, 0] / p_y[:, None]                # [C, 3]
        x_new = x_pre + K * y[:, None]
        P_new = P_pre - K[:, :, None] * P_pre[:, None, 0, :]

        # --- DLL with carrier aiding (:795-805) ---
        code_err_chips = dll_nc_e_minus_l_normalized(corr[:, 0], corr[:, 2])
        code_filt_new, code_err_filt = iir_apply(
            state.code_filter, code_err_chips, self._dll_b_in, self._dll_b_out)
        doppler_new = x_new[:, 1]
        new_code_freq_delta = (f32(cfg.chip_rate_chips_s)
                               / f32(cfg.carrier_freq_hz) * doppler_new
                               - code_err_filt)

        # --- next epoch length (A.6 split precision) ---
        new_code_freq = f32(cfg.chip_rate_chips_s) + new_code_freq_delta
        d_t = -(f32(self._t0_int) * new_code_freq_delta / new_code_freq
                + f32(self._t0_frac) * new_code_freq_delta / new_code_freq)
        frac = f32(self._t0_frac) + d_t + state.rem_code_phase_samples
        frac_floor = jnp.floor(frac)
        next_len = jnp.int32(self._t0_int) + frac_floor.astype(jnp.int32)
        new_rem_code = frac - frac_floor

        # --- CN0 / lock supervision (A.7) ---
        pushed = jnp.concatenate(
            [state.prompt_hist[:, 1:], pack_complex(prompt)[:, None, :]], axis=1)
        hist_p = jnp.where(valid[:, None, None], pushed, state.prompt_hist)
        hist = unpack_complex(hist_p)
        hist_count = jnp.minimum(state.hist_count + valid.astype(jnp.int32),
                                 cfg.cn0_samples)
        hist_full = hist_count >= cfg.cn0_samples
        cn0 = cn0_svn_estimator(hist, t)
        cn0_run = jnp.where(valid & hist_full, cn0, state.cn0_dbhz)
        carrier_lock = carrier_lock_detector(hist)
        epochs = state.epochs + valid.astype(jnp.int32)
        check_now = valid & hist_full & (
            jnp.mod(epochs, cfg.cn0_samples) == 0)
        fail = check_now & ((cn0 < cfg.cn0_min_dbhz)
                            | (carrier_lock < cfg.carrier_lock_th))
        lock_fail = jnp.where(
            fail, state.lock_fail + 1,
            jnp.where(check_now, jnp.maximum(state.lock_fail - 1, 0),
                      state.lock_fail))
        still_active = state.active & (lock_fail <= cfg.max_lock_fail)

        def mrg(n, o):
            v = valid
            while v.ndim < n.ndim:
                v = v[..., None]
            return jnp.where(v, n, o)

        new_state = KfTrackState(
            active=mrg(still_active, state.active),
            prn_slot=state.prn_slot,
            start=mrg(state.start + state.cur_len, state.start),
            cur_len=mrg(next_len, state.cur_len),
            rem_code_phase_samples=mrg(new_rem_code,
                                       state.rem_code_phase_samples),
            code_freq_delta=mrg(new_code_freq_delta, state.code_freq_delta),
            x=mrg(x_new, state.x),
            P=mrg(P_new, state.P),
            code_filter=IirState(
                inputs=mrg(code_filt_new.inputs, state.code_filter.inputs),
                outputs=mrg(code_filt_new.outputs, state.code_filter.outputs)),
            cn0_dbhz=cn0_run,
            prompt_hist=hist_p,
            hist_count=hist_count,
            lock_fail=mrg(lock_fail, state.lock_fail),
            epochs=epochs,
            niw_mu=niw_mu, niw_kappa=niw_kappa, niw_nu=niw_nu,
            niw_psi=niw_psi, niw_psi_est=niw_psi_est,
        )
        outputs = KfTrackOutputs(
            valid=valid,
            start=state.start,
            cur_len=state.cur_len,
            correlators=jnp.where(valid[:, None, None], pack_complex(corr), 0.0),
            carrier_doppler_hz=new_state.x[:, 1],
            doppler_rate_hz_s=new_state.x[:, 2],
            carr_phase_sigma2=jnp.where(valid, r_est, 0.0),
            code_freq_delta=new_state.code_freq_delta,
            rem_code_phase_samples=new_state.rem_code_phase_samples,
            rem_carr_phase_rad=jnp.mod(new_state.x[:, 0], f32(_TWO_PI)),
            cn0_dbhz=jnp.where(valid & hist_full, cn0, 0.0),
            active=new_state.active,
        )
        return new_state, outputs

    def _track_block_impl(self, samples, state, *, base: int, n_epochs: int):
        def step(carry, _):
            return self._epoch_step(samples, carry, jnp.int32(base))
        return jax.lax.scan(step, state, None, length=n_epochs)

    # ---------------- host API ----------------

    def track_block(self, samples: np.ndarray, state: KfTrackState, base: int):
        n_epochs = base // (self._t0_int - 2) + 2
        samples = np.asarray(samples)
        if np.iscomplexobj(samples):
            samples = to_planar(samples)
        if samples.shape[0] < base + self.cfg.epoch_samples_max:
            raise ValueError("block must hold base + epoch_samples_max samples")
        st, outs = self._block_fn(jnp.asarray(samples), state,
                                  base=base, n_epochs=n_epochs)
        return self.rebase(st, base), outs
