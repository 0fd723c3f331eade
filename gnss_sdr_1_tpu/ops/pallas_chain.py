"""Fused per-epoch tracking-chain kernel (Pallas / Mosaic TPU).

The flagship TPU kernel (SURVEY.md §2.13 item 1/2): the reference's hot
tracking loop is volk's rotator-dot-product multicorrelator plus the loop
closure in `run_dll_pll` (cpu_multicorrelator_real_codes.cc:129-169,
dll_pll_veml_tracking.cc:914-996).  In the XLA formulation the chunk's
correlation is one MXU matmul, but the EXACT sequential per-epoch loop
closure (discriminators -> filters -> NCO stepping -> supervision) unrolls
into ~300 tiny fused kernels per chunk — per-kernel dispatch dominates the
wall time (PERF.md round 3).  This module fuses the whole chain for
`chunk_epochs` epochs x all channels into ONE Pallas kernel: state lives in
registers/VMEM across the in-kernel `fori_loop`, and every epoch costs a few
hundred VPU vector ops on [C]-lane vectors instead of ~19 kernel launches.

Numerics: identical formulas to track.engine._loop_update (A.3-A.7), with
one documented exception — Mosaic has no atan/atan2 primitive, so the
discriminators use the Cephes-style float32 arctan rational (max error
2.4e-7 rad vs XLA's atan2, measured over 2e5 random pairs; the phase noise
floor at 45 dB-Hz is ~1e-2 rad, five orders above).

State crosses the kernel boundary packed as row-stacked matrices
(`FROWS` x C float32 + `IROWS` x C int32) because Mosaic supports neither
pytree refs nor scatter; row order is defined by the F_* / I_* constants
below and shared with track.engine's pack/unpack.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = float(2.0 * np.pi)
_PI = float(np.pi)
_TINY = float(np.finfo(np.float32).tiny)

# float32 state rows (before the trailing dll/acc blocks)
F_REM_CODE, F_DELTA, F_DOPPLER, F_REM_CARR = 0, 1, 2, 3
F_CARR_W, F_CARR_X, F_PREV_R, F_PREV_I = 4, 5, 6, 7
F_SABSI, F_SI2, F_SQ2, F_CN0 = 8, 9, 10, 11
F_ACCH_R, F_ACCH_I, F_CARR_OFF = 12, 13, 14
F_DLL_IN0 = 15          # 3 rows
F_DLL_OUT0 = 18         # 3 rows
F_ACC_R0 = 21           # K rows, then K rows of acc_i


def n_frows(K: int) -> int:
    return F_ACC_R0 + 2 * K


# int32 state rows
I_ACTIVE, I_START, I_CURLEN, I_PUSH, I_LOCKFAIL = 0, 1, 2, 3, 4
I_EPOCHS, I_FLL_ON, I_MODE, I_EXTCNT, I_SEC_ON, I_SEC_IDX, I_LIMIT = \
    5, 6, 7, 8, 9, 10, 11
N_IROWS = 12

# per-epoch float32 output rows
O_DOPPLER, O_DELTA, O_REM_CODE, O_REM_CARR, O_CN0, O_VALID, O_ACTIVE = \
    0, 1, 2, 3, 4, 5, 6
N_OROWS = 7


def atan_f32(x):
    """Cephes atanf: range-reduced 4-term rational, |err| <= ~1.2e-7 rad."""
    ax = jnp.abs(x)
    big = ax > 2.414213562373095          # tan(3*pi/8)
    mid = ax > 0.4142135623730950         # tan(pi/8)
    z = jnp.where(big, -1.0 / jnp.where(ax == 0.0, 1.0, ax),
                  jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    z2 = z * z
    p = ((8.05374449538e-2 * z2 - 1.38776856032e-1) * z2
         + 1.99777106478e-1) * z2 - 3.33329491539e-1
    y = z + z * z2 * p
    y = y + jnp.where(big, jnp.float32(_PI / 2),
                      jnp.where(mid, jnp.float32(_PI / 4), jnp.float32(0.0)))
    return jnp.sign(x) * y


def atan2_f32(y, x):
    """Four-quadrant arctan from atan_f32 (max err 2.4e-7 rad)."""
    a = atan_f32(y / jnp.where(x == 0.0, jnp.float32(1e-30), x))
    pi = jnp.float32(_PI)
    a = jnp.where(x < 0.0, a + jnp.where(y < 0.0, -pi, pi), a)
    return jnp.where((x == 0.0) & (y != 0.0),
                     jnp.sign(y) * jnp.float32(_PI / 2), a)


@dataclasses.dataclass(frozen=True)
class ChainSpec:
    """Static configuration baked into one compiled chain kernel."""

    E: int                  # epochs per chunk
    LW: int                 # lag-window length
    K: int                  # correlator taps
    C: int                  # channels
    sec_len: int
    prompt_index: int
    veml: bool
    sec_data: bool
    lag_margin: float
    spc_samples: float      # samples per chip
    shifts_chips: tuple     # [K]
    fs: float
    chip_rate: float
    carrier_freq: float
    t0_int: int
    t0_frac: float
    code_period_s: float
    ext_n: int
    cn0_samples: int
    cn0_min_dbhz: float
    carrier_lock_th: float
    max_lock_fail: int
    fll_narrow_windows: int
    fll_epochs: int
    order: int              # PLL filter order (2 or 3)
    wide: tuple             # (w0p, w0p2, w0p3, w0f, w0f2, a2, a3, b3)
    narrow: tuple
    dll_b_in: tuple         # [4]
    dll_b_in_n: tuple
    dll_b_out: tuple        # [3]
    dll_b_out_n: tuple


def _sel(narrow_f, wide_v, narrow_v):
    """Per-channel wide/narrow constant select (narrow_f is a 0/1 mask)."""
    return (jnp.float32(wide_v) + narrow_f
            * jnp.float32(float(narrow_v) - float(wide_v)))


def _make_kernel(spec: ChainSpec):
    E, LW, K = spec.E, spec.LW, spec.K
    P = spec.prompt_index
    f32 = jnp.float32
    half_n = spec.ext_n // 2

    # float32 carry tuple layout (loop state as individual [C] vectors —
    # a row-matrix carry costs an extract + shape_cast per read and a
    # 27-row concatenate per epoch in Mosaic; the tuple form measured ~2x
    # faster for the whole kernel)
    NF = n_frows(K)

    def kernel(zr_ref, zi_ref, s_pred_ref, step0_ref, sec_ref,
               fst_ref, ist_ref,
               out_f_ref, out_i_ref, out_corr_ref,
               fst_out_ref, ist_out_ref):
        # EVERY per-channel vector in this kernel is rank-2 [1, C], and
        # every state row is loaded from a [ROWS, 1, C] ref so each row is
        # its OWN (1, C) tile at sublane offset 0.  Two Mosaic performance/
        # correctness cliffs force this: (a) layout inference crashes
        # joining a rank-1 native layout with a rank-2 implicit one
        # (layout.h VectorLayout::join check 1 vs 2), and (b) a [1, C]
        # slice row i of a [ROWS, C] ref lives at sublane offset i%8, so
        # every op mixing rows inserts a vreg relayout — measured 350 us
        # per epoch vs ~2 us with tile-aligned rows
        step0 = step0_ref[...]                        # [1, C]
        sec_rows = sec_ref[...]                       # [sec_len, C]
        C = step0.shape[-1]
        # tpu.iota only produces integer vectors — iota as i32 then convert
        lag_col = jax.lax.broadcasted_iota(
            jnp.int32, (LW, C), 0).astype(f32)

        frow = lambda i: fst_ref[i]                   # [1, C] f32, aligned
        irow = lambda i: ist_ref[i]                   # [1, C] i32, aligned
        carr_off = frow(F_CARR_OFF)
        limit = irow(I_LIMIT)
        mode0 = irow(I_MODE)
        sec_on0 = irow(I_SEC_ON)

        carry0 = (
            # f32 block
            frow(F_REM_CODE), frow(F_DELTA), frow(F_DOPPLER),
            frow(F_REM_CARR), frow(F_CARR_W), frow(F_CARR_X),
            frow(F_PREV_R), frow(F_PREV_I),
            frow(F_SABSI), frow(F_SI2), frow(F_SQ2), frow(F_CN0),
            frow(F_ACCH_R), frow(F_ACCH_I),
            tuple(frow(F_DLL_IN0 + j) for j in range(3)),
            tuple(frow(F_DLL_OUT0 + j) for j in range(3)),
            tuple(frow(F_ACC_R0 + k) for k in range(K)),
            tuple(frow(F_ACC_R0 + K + k) for k in range(K)),
            # i32 block
            irow(I_ACTIVE), irow(I_START), irow(I_CURLEN), irow(I_PUSH),
            irow(I_LOCKFAIL), irow(I_EPOCHS), irow(I_FLL_ON),
            irow(I_EXTCNT), irow(I_SEC_IDX),
            # ledger
            jnp.zeros_like(step0),
        )

        def body(kk, carry):
            (rem_code, delta, doppler, rem_carr, cw, cx, prev_r, prev_i,
             sabsi0, si20, sq20, cn0_old, acch_r, acch_i, din, dout,
             accr0, acci0, active_i, start, cur_len, push_count0,
             lockfail0, epochs0, fllon_i, extcnt0, sec_idx, dphi) = carry
            active = active_i > 0
            valid = active & (start < limit)
            validf = valid.astype(f32)

            # ---- tap read at the TRUE code phase (engine._chunk_step) ----
            # dynamic ref load (Mosaic has no value-level dynamic_slice);
            # s_pred is [E, 1, C] so the row is tile-aligned
            s_pred_k = s_pred_ref[kk]                 # [1, C]
            d_s = (start - s_pred_k).astype(f32)
            rem_eff = (d_s + rem_code) * (1.0 + delta / f32(spec.chip_rate))
            zr = zr_ref[kk]                           # [LW, C]
            zi = zi_ref[kk]
            taps_r = []
            taps_i = []
            for k in range(K):
                pos = (f32(spec.lag_margin) + rem_eff
                       - f32(spec.shifts_chips[k] * spec.spc_samples))
                w = jnp.maximum(0.0, 1.0 - jnp.abs(pos - lag_col))
                taps_r.append(jnp.sum(zr * w, axis=0, keepdims=True))
                taps_i.append(jnp.sum(zi * w, axis=0, keepdims=True))

            # ---- rotate into the true-NCO frame ----
            step_true = f32(_TWO_PI) * (doppler + carr_off) / f32(spec.fs)
            dphi_mid = dphi + (step_true - step0) * 0.5 * cur_len.astype(f32)
            rc = jnp.cos(dphi_mid)
            rs = jnp.sin(dphi_mid)
            corr_r = [taps_r[k] * rc + taps_i[k] * rs for k in range(K)]
            corr_i = [taps_i[k] * rc - taps_r[k] * rs for k in range(K)]

            # =============== loop closure (engine._loop_update) ===========
            t_epoch = cur_len.astype(f32) / f32(spec.fs)
            sec_on = sec_on0 > 0
            if spec.sec_len > 1:
                idx_c = jnp.minimum(sec_idx, spec.sec_len - 1)
                row_idx = jax.lax.broadcasted_iota(
                    jnp.int32, (spec.sec_len, C), 0)
                onehot = (row_idx == idx_c).astype(f32)
                sec_chip = jnp.sum(sec_rows * onehot, axis=0, keepdims=True)
            else:
                sec_chip = sec_rows[0:1]
            s = jnp.where(sec_on, sec_chip, f32(1.0))
            cw_r = [corr_r[k] * s for k in range(K)]
            cw_i = [corr_i[k] * s for k in range(K)]
            pw_r, pw_i = cw_r[P], cw_i[P]

            narrow = mode0 >= 1
            narrow_f = narrow.astype(f32)
            acc_r = [accr0[k] + cw_r[k] for k in range(K)]
            acc_i = [acci0[k] + cw_i[k] for k in range(K)]
            cnt = extcnt0 + 1
            boundary = narrow & (cnt >= spec.ext_n)
            upd = (~narrow) | boundary
            disc_r = [jnp.where(narrow, acc_r[k], cw_r[k]) for k in range(K)]
            disc_i = [jnp.where(narrow, acc_i[k], cw_i[k]) for k in range(K)]
            dp_r, dp_i = disc_r[P], disc_i[P]
            t_int = jnp.where(narrow,
                              cnt.astype(f32) * f32(spec.code_period_s),
                              t_epoch)

            # --- carrier discriminators (A.3) ---
            costas = jnp.where(
                dp_r != 0.0,
                atan2_f32(dp_i * jnp.sign(dp_r), jnp.abs(dp_r)),
                f32(0.0)) / f32(_TWO_PI)
            fourq = atan2_f32(dp_i, dp_r) / f32(_TWO_PI)
            if spec.sec_data:
                carr_err_cyc = costas
            else:
                carr_err_cyc = jnp.where(sec_on, fourq, costas)
            dot = prev_r * pw_r + prev_i * pw_i
            cross = prev_r * pw_i - pw_r * prev_i
            freq_err_hz = atan2_f32(cross, dot) / t_epoch / f32(_TWO_PI)
            t_half = f32(half_n * spec.code_period_s)
            p2_r = acc_r[P] - acch_r
            p2_i = acc_i[P] - acch_i
            dot_h = acch_r * p2_r + acch_i * p2_i
            cross_h = acch_r * p2_i - p2_r * acch_i
            h_mag = acch_r * acch_r + acch_i * acch_i
            freq_err_ext = jnp.where(
                (h_mag > 0.0) & boundary,
                atan2_f32(cross_h, dot_h)
                / jnp.maximum(t_half, f32(1e-6)) / f32(_TWO_PI),
                f32(0.0))

            fll_on = fllon_i > 0
            pll_in = carr_err_cyc
            fll_in = jnp.where(fll_on & ~narrow & (push_count0 > 0),
                               freq_err_hz, f32(0.0))
            fll_in = jnp.where(narrow & fll_on, freq_err_ext, fll_in)

            # --- FLL-assisted PLL cascade (A.5), wide/narrow select ---
            w0p = _sel(narrow_f, spec.wide[0], spec.narrow[0])
            w0p2 = _sel(narrow_f, spec.wide[1], spec.narrow[1])
            w0p3 = _sel(narrow_f, spec.wide[2], spec.narrow[2])
            w0f = _sel(narrow_f, spec.wide[3], spec.narrow[3])
            w0f2 = _sel(narrow_f, spec.wide[4], spec.narrow[4])
            a2 = _sel(narrow_f, spec.wide[5], spec.narrow[5])
            a3 = _sel(narrow_f, spec.wide[6], spec.narrow[6])
            b3 = _sel(narrow_f, spec.wide[7], spec.narrow[7])
            if spec.order == 3:
                w_new = cw + t_int * (w0p3 * pll_in + w0f2 * fll_in)
                x_new = cx + t_int * (0.5 * w_new + a2 * w0f * fll_in
                                      + a3 * w0p2 * pll_in)
                doppler_new = 0.5 * x_new + b3 * w0p * pll_in
            else:
                w_new = cw + t_int * (w0p2 * pll_in + w0f * fll_in)
                doppler_new = 0.5 * (w_new + cw) + a2 * w0p * pll_in
                x_new = cx

            # --- DLL (A.3/A.5) ---
            if spec.veml:
                pe = jnp.sqrt(disc_r[0] ** 2 + disc_i[0] ** 2
                              + disc_r[1] ** 2 + disc_i[1] ** 2)
                pl_ = jnp.sqrt(disc_r[3] ** 2 + disc_i[3] ** 2
                               + disc_r[4] ** 2 + disc_i[4] ** 2)
                ssum = pe + pl_
                code_err = jnp.where(ssum > 0.0, (pe - pl_) / ssum, f32(0.0))
            else:
                e = jnp.sqrt(disc_r[0] ** 2 + disc_i[0] ** 2)
                l = jnp.sqrt(disc_r[2] ** 2 + disc_i[2] ** 2)
                ssum = e + l
                code_err = jnp.where(ssum > 0.0,
                                     0.5 * (e - l) / ssum, f32(0.0))
            bi = [_sel(narrow_f, spec.dll_b_in[j], spec.dll_b_in_n[j])
                  for j in range(4)]
            bo = [_sel(narrow_f, spec.dll_b_out[j], spec.dll_b_out_n[j])
                  for j in range(3)]
            code_err_filt = (bo[0] * dout[0] + bo[1] * dout[1]
                             + bo[2] * dout[2] + bi[0] * code_err
                             + bi[1] * din[0] + bi[2] * din[1]
                             + bi[3] * din[2])
            din_new = (code_err, din[0], din[1])
            dout_new = (code_err_filt, dout[0], dout[1])

            app = valid & upd
            appf = app.astype(f32)
            mrg = lambda n, o: jnp.where(app, n, o)
            cw_m = mrg(w_new, cw)
            cx_m = mrg(x_new, cx)
            din_m = tuple(mrg(din_new[j], din[j]) for j in range(3))
            dout_m = tuple(mrg(dout_new[j], dout[j]) for j in range(3))
            doppler_m = mrg(doppler_new, doppler)
            delta_m = mrg(f32(spec.chip_rate) / f32(spec.carrier_freq)
                          * doppler_new - code_err_filt, delta)

            # --- NCO stepping / next length (A.6 split precision) ---
            ncf = f32(spec.chip_rate) + delta_m
            d_t = (-f32(spec.t0_int) * delta_m / ncf
                   - f32(spec.t0_frac) * delta_m / ncf)
            frac = f32(spec.t0_frac) + d_t + rem_code
            frac_floor = jnp.floor(frac)
            next_len = jnp.int32(spec.t0_int) + frac_floor.astype(jnp.int32)
            rem_code_new = frac - frac_floor
            carr_step_new = f32(_TWO_PI) * (doppler_m + carr_off) / f32(spec.fs)
            rem_carr_new = jnp.mod(
                rem_carr + carr_step_new * next_len.astype(f32),
                f32(_TWO_PI))

            # --- CN0 / lock supervision on window accumulators (A.7) ---
            s_absi = sabsi0 + appf * jnp.abs(dp_r)
            s_i2 = si20 + appf * dp_r * dp_r
            s_q2 = sq20 + appf * dp_i * dp_i
            push_count = push_count0 + app.astype(jnp.int32)
            window_done = app & (
                jnp.mod(push_count, spec.cn0_samples) == 0)
            t_cn0 = jnp.where(narrow,
                              f32(spec.ext_n * spec.code_period_s), t_epoch)
            m = f32(spec.cn0_samples)
            psig = (s_absi / m) ** 2
            ptot = (s_i2 + s_q2) / m
            noise = jnp.maximum(ptot - psig, f32(_TINY))
            cn0 = (10.0 * jnp.log10(jnp.maximum(psig / noise, f32(1e-10)))
                   - 10.0 * jnp.log10(t_cn0))
            carrier_lock = (s_i2 - s_q2) / jnp.maximum(s_i2 + s_q2, f32(_TINY))
            cn0_last = jnp.where(window_done, cn0, cn0_old)
            hist_full = push_count >= spec.cn0_samples
            s_absi = jnp.where(window_done, 0.0, s_absi)
            s_i2 = jnp.where(window_done, 0.0, s_i2)
            s_q2 = jnp.where(window_done, 0.0, s_q2)
            check_now = window_done & ~fll_on
            fail = check_now & ((cn0 < spec.cn0_min_dbhz)
                                | (carrier_lock < spec.carrier_lock_th))
            ok = check_now & ~fail
            lock_fail = jnp.where(
                fail, lockfail0 + 1,
                jnp.where(ok, jnp.maximum(lockfail0 - 1, 0), lockfail0))
            still_active = active & (lock_fail <= spec.max_lock_fail)

            epochs_in_track = epochs0 + 1
            # Mosaic cannot select between i1 vectors (lowers via an
            # unsupported i8->i1 truncation) — select as i32 and compare
            fll_still_on = fll_on & (jnp.where(
                narrow,
                (push_count < spec.fll_narrow_windows).astype(jnp.int32),
                (epochs_in_track < spec.fll_epochs).astype(jnp.int32)) > 0)
            turnoff = narrow & fll_on & ~fll_still_on
            if spec.order == 3:
                seed_w = jnp.zeros_like(doppler_m)
                seed_x = 2.0 * doppler_m
            else:
                seed_w = doppler_m
                seed_x = jnp.zeros_like(doppler_m)
            tv = turnoff & valid
            cw_m = jnp.where(tv, seed_w, cw_m)
            cx_m = jnp.where(tv, seed_x, cx_m)

            reset_acc = boundary | ~narrow
            racf = (~reset_acc).astype(f32)
            acc_r_new = [acc_r[k] * racf for k in range(K)]
            acc_i_new = [acc_i[k] * racf for k in range(K)]
            at_half = narrow & (cnt == half_n)
            acch_r_new = racf * jnp.where(at_half, acc_r[P], acch_r)
            acch_i_new = racf * jnp.where(at_half, acc_i[P], acch_i)

            # --- merge by valid (engine merges every leaf) ---
            mv = lambda n, o: jnp.where(valid, n, o)
            merged_dopp = mv(doppler_m, doppler)
            merged_active = mv(still_active.astype(jnp.int32), active_i)
            merged_cn0 = mv(cn0_last, cn0_old)
            merged_delta = mv(delta_m, delta)
            merged_rem_code = mv(rem_code_new, rem_code)
            merged_rem_carr = mv(rem_carr_new, rem_carr)
            new_cur = mv(next_len, cur_len)

            # --- per-epoch outputs (TrackOutputs rows; all [1, C]) ---
            out_f_ref[kk] = jnp.concatenate([
                merged_dopp,
                merged_delta,
                merged_rem_code,
                merged_rem_carr,
                jnp.where(valid & hist_full, merged_cn0, f32(0.0)),
                validf,
                merged_active.astype(f32),
            ], axis=0)
            out_i_ref[kk] = jnp.concatenate([start, cur_len], axis=0)
            out_corr_ref[kk] = jnp.concatenate(
                [validf * corr_r[k] for k in range(K)]
                + [validf * corr_i[k] for k in range(K)], axis=0)

            # --- frozen-vs-true phase ledger (engine._chunk_step tail) ---
            step_new = f32(_TWO_PI) * (merged_dopp + carr_off) / f32(spec.fs)
            dphi_next = (dphi + step_new * new_cur.astype(f32)
                         - step0 * cur_len.astype(f32))
            dphi = jnp.where(
                valid,
                jnp.mod(dphi_next + f32(_PI), f32(_TWO_PI)) - f32(_PI),
                dphi)

            return (
                merged_rem_code, merged_delta, merged_dopp, merged_rem_carr,
                mv(cw_m, cw), mv(cx_m, cx),
                mv(pw_r, prev_r), mv(pw_i, prev_i),
                mv(s_absi, sabsi0), mv(s_i2, si20), mv(s_q2, sq20),
                merged_cn0,
                mv(acch_r_new, acch_r), mv(acch_i_new, acch_i),
                din_m, dout_m,
                tuple(mv(acc_r_new[k], accr0[k]) for k in range(K)),
                tuple(mv(acc_i_new[k], acci0[k]) for k in range(K)),
                merged_active, mv(start + cur_len, start), new_cur,
                mv(push_count, push_count0), mv(lock_fail, lockfail0),
                mv(epochs_in_track, epochs0),
                mv(fll_still_on.astype(jnp.int32), fllon_i),
                mv(jnp.where(reset_acc, 0, cnt), extcnt0),
                mv(jnp.mod(sec_idx + 1, spec.sec_len), sec_idx),
                dphi,
            )

        c = jax.lax.fori_loop(0, E, body, carry0)
        (rem_code, delta, doppler, rem_carr, cw, cx, prev_r, prev_i,
         sabsi, si2, sq2, cn0_last, acch_r, acch_i, din, dout, accr, acci,
         active_i, start, cur_len, push, lockfail, epochs, fllon_i,
         extcnt, sec_idx, _dphi) = c
        # per-row tile-aligned stores into the [ROWS, 1, C] out refs
        f_rows = ([rem_code, delta, doppler, rem_carr,
                   cw, cx, prev_r, prev_i,
                   sabsi, si2, sq2, cn0_last,
                   acch_r, acch_i, carr_off]
                  + [din[j] for j in range(3)]
                  + [dout[j] for j in range(3)]
                  + [accr[k] for k in range(K)]
                  + [acci[k] for k in range(K)])
        for j, r in enumerate(f_rows):
            fst_out_ref[j] = r
        i_rows = [active_i, start, cur_len, push,
                  lockfail, epochs, fllon_i, mode0,
                  extcnt, sec_on0, sec_idx, limit]
        for j, r in enumerate(i_rows):
            ist_out_ref[j] = r

    return kernel


@functools.lru_cache(maxsize=32)
def make_chain_call(spec: ChainSpec, interpret: bool = False):
    """Build the jittable chunk-chain call for a static ChainSpec.

    Signature: (zr [E,LW,C], zi [E,LW,C], s_pred [E,C] i32, step0 [1,C],
                sec_rows [sec_len,C], fstate [FROWS,C], istate [IROWS,C])
             -> (out_f [E,7,C], out_i [E,2,C], out_corr [E,2K,C],
                 fstate', istate')
    """
    from jax.experimental import pallas as pl

    E, LW, K, C = spec.E, spec.LW, spec.K, spec.C
    SF = n_frows(K)
    kernel = _make_kernel(spec)
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((E, N_OROWS, C), jnp.float32),
            jax.ShapeDtypeStruct((E, 2, C), jnp.int32),
            jax.ShapeDtypeStruct((E, 2 * K, C), jnp.float32),
            # state rows travel as [ROWS, 1, C]: one (1, C) tile per row
            # so in-kernel loads/stores are sublane-aligned (see kernel)
            jax.ShapeDtypeStruct((SF, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((N_IROWS, 1, C), jnp.int32),
        ),
        interpret=interpret,
    )

    def run(zr, zi, s_pred, step0, sec_rows, fst, ist):
        out_f, out_i, out_corr, fst2, ist2 = call(
            zr, zi, s_pred[:, None, :], step0, sec_rows,
            fst[:, None, :], ist[:, None, :])
        return out_f, out_i, out_corr, fst2[:, 0], ist2[:, 0]

    return run
