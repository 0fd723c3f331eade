#!/usr/bin/env python3
"""Debug observables: compare per-channel decoded TOW against scenario truth."""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from gnss_sdr_1_tpu.codes import gps_l1ca_code
from gnss_sdr_1_tpu.constants import GPS_L1_CA, SPEED_OF_LIGHT_M_S
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.runtime import Receiver, ReceiverConfig
from gnss_sdr_1_tpu.siggen.generator import generate_baseband
from gnss_sdr_1_tpu.siggen.scenario import build_scenario, observed_delay_s

FS = 2.046e6
DUR = 14.0
rx_ecef = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
prns = [1, 2, 3, 4]
scen = build_scenario(rx_ecef, prns, t0_tow=345601.25, duration_s=DUR,
                      cn0_dbhz=47.0, subframe_cycle=(1, 2, 3))
x = generate_baseband(GPS_L1_CA, scen.sats, {p: gps_l1ca_code(p) for p in prns},
                      FS, DUR, noise=True)
cfg = ReceiverConfig(fs_hz=FS, n_channels=4, prn_search=tuple(prns))
rx = Receiver(cfg)
rx.process(x)

rx_sample = int(13.8 * FS)
print("at rx t=13.8 s (sample", rx_sample, ")")
for p in prns:
    hist = rx.histories.get(p)
    if hist is None or len(hist.start_samples) < 2:
        print(f"PRN {p}: no history")
        continue
    print(f"PRN {p}: history [{hist.start_samples[0]}, {hist.start_samples[-1]}] "
          f"n={len(hist.start_samples)} tow[0]={hist.tow_s[0]:.3f}")
    r = hist.interpolate(rx_sample, FS)
    if r is None:
        print(f"PRN {p}: no interp")
        continue
    tow_meas, dop_meas, _ = r
    t_rx_true = scen.t0_tow + rx_sample / FS
    tau_true = observed_delay_s(scen.ephemerides[p], rx_ecef, t_rx_true)
    tow_true = t_rx_true - tau_true
    print(f"PRN {p}: tow_meas {tow_meas:.9f} tow_true {tow_true:.9f} "
          f"diff {(tow_meas-tow_true)*1e6:+.3f} us "
          f"({(tow_meas-tow_true)*SPEED_OF_LIGHT_M_S:+.1f} m) "
          f"dop {dop_meas:+.1f} vs {scen.truth[p]['doppler_hz']:+.1f}")

# --- run observables + solver at this tick ---
from gnss_sdr_1_tpu.observables import compute_observables
from gnss_sdr_1_tpu.pvt.solver import solve_pvt
from gnss_sdr_1_tpu.pvt.ephemeris import satellite_position_velocity

rx_tow, obs = compute_observables(rx.histories, rx_sample, FS, None)
print("rx_tow:", rx_tow)
t_rx_true = scen.t0_tow + rx_sample / FS
for p, o in obs.items():
    tau_true = observed_delay_s(scen.ephemerides[p], rx_ecef, t_rx_true)
    rho_plus = (tau_true) * SPEED_OF_LIGHT_M_S
    print(f"PRN {p}: pr {o.pseudorange_m:.1f} tau_obs*c {rho_plus:.1f} "
          f"pr - tau_obs*c = {o.pseudorange_m - rho_plus:.1f} m")
ephs = {p: rx.decoders[p].ephemeris for p in obs}
for p in obs:
    e_dec, e_true = ephs[p], scen.ephemerides[p]
    import dataclasses as dc
    bad = [f.name for f in dc.fields(e_true)
           if abs(getattr(e_dec, f.name) - getattr(e_true, f.name)) >
              max(1e-7*abs(getattr(e_true, f.name)), 1e-7)]
    print(f"PRN {p}: decoded-eph field diffs: {bad}")
try:
    sol = solve_pvt(ephs, {p: o.pseudorange_m for p, o in obs.items()}, rx_tow,
                    dopplers_hz={p: o.doppler_hz for p, o in obs.items()})
except Exception as ex:
    print("solve crashed:", ex)
else:
    print("sol valid", sol.valid, "err3d", np.linalg.norm(sol.rx_ecef_m - rx_ecef),
          "clk", sol.rx_clock_bias_s, "resid", sol.residuals_m)

p = 2
e_dec, e_true = ephs[p], scen.ephemerides[p]
import dataclasses as dc
for f in dc.fields(e_true):
    a, b = getattr(e_true, f.name), getattr(e_dec, f.name)
    print(f"{f.name:10s} true={a!r:24} dec={b!r:24} diff={a-b:.3e}")
