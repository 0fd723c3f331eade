#!/usr/bin/env python3
"""Offline dump analysis — the reference's MATLAB script role.

Reference parity: src/utils/matlab/ (dll_pll_veml_plot_sample.m,
plot_acq_grid.m, gps_l1_ca_pvt_plot_sample.m and friends read the dump
files written by dump=true blocks and plot tracking/acquisition/PVT
series).  This tool reads the same dumps this framework writes
(runtime/dumps.py .npz, the CLI's position outputs) and prints summary
statistics; with --plot and matplotlib available it also renders the
classic panels (prompt I/Q scatter, CN0, Doppler, code-phase, DLL/PLL
discriminator proxies, acquisition grid surface).

Usage:
  python tools/analyze_dumps.py tracking  dump_dir/tracking_ch_prn01.npz
  python tools/analyze_dumps.py acquisition acq_grid.npz
  python tools/analyze_dumps.py position  out_dir/position.geojson [--truth lat lon h]
"""

from __future__ import annotations

import argparse
import json
import math
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _read_npz(path: str) -> dict:
    """Plain npz read — keeps the tool jax-free for dump analysis
    (runtime.dumps.read_tracking_dump does exactly this, but importing the
    runtime package pulls the full receiver/jax stack)."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _fmt(v: float) -> str:
    return f"{v:.3f}" if abs(v) < 1e4 else f"{v:.6g}"


def analyze_tracking(path: str, plot: bool = False) -> dict:
    """Summary of one channel's tracking dump (dll_pll_veml_plot_sample.m
    panels: prompt constellation, CN0, Doppler, filter outputs)."""
    d = _read_npz(path)
    pi, pq = d["prompt_i"], d["prompt_q"]
    n = len(pi)
    if n == 0:
        return {"epochs": 0}
    abs_p = np.hypot(pi, pq)
    # data-bit SNR proxy: |mean(|I|)| vs std(Q) (post-lock Costas alignment)
    out = {
        "epochs": int(n),
        "duration_s_approx": float(n * 1e-3),
        "cn0_dbhz_mean": float(np.mean(d["cn0_dbhz"][n // 4:])) if n else 0.0,
        "cn0_dbhz_min": float(np.min(d["cn0_dbhz"][n // 4:])) if n else 0.0,
        "doppler_hz_mean": float(np.mean(d["carrier_doppler_hz"][n // 4:])),
        "doppler_hz_std": float(np.std(d["carrier_doppler_hz"][n // 4:])),
        "prompt_abs_mean": float(np.mean(abs_p)),
        "iq_power_ratio_db": float(
            10 * math.log10((np.mean(pi[n // 4:] ** 2) + 1e-12)
                            / (np.mean(pq[n // 4:] ** 2) + 1e-12))),
        "code_freq_delta_std": float(np.std(d["code_freq_delta"][n // 4:])),
    }
    if plot:
        _plot_tracking(d, path)
    return out


def _plot_tracking(d: dict, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(2, 3, figsize=(14, 8))
    t = np.arange(len(d["prompt_i"])) * 1e-3
    ax[0, 0].plot(d["prompt_i"], d["prompt_q"], ".", ms=1)
    ax[0, 0].set_title("prompt I/Q")
    ax[0, 1].plot(t, d["cn0_dbhz"])
    ax[0, 1].set_title("CN0 (dB-Hz)")
    ax[0, 2].plot(t, d["carrier_doppler_hz"])
    ax[0, 2].set_title("carrier Doppler (Hz)")
    ax[1, 0].plot(t, d["prompt_i"], lw=0.5)
    ax[1, 0].set_title("prompt I (nav bits)")
    e = np.hypot(d["early_i"], d["early_q"])
    l = np.hypot(d["late_i"], d["late_q"])
    ax[1, 1].plot(t, 0.5 * (e - l) / np.maximum(e + l, 1e-9), lw=0.5)
    ax[1, 1].set_title("E-L discriminator proxy")
    ax[1, 2].plot(t, d["rem_code_phase_samples"], lw=0.5)
    ax[1, 2].set_title("rem code phase (samples)")
    for a in ax.flat:
        a.grid(alpha=0.3)
    out = path.rsplit(".", 1)[0] + ".png"
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}", file=sys.stderr)


def analyze_acquisition(path: str, plot: bool = False) -> dict:
    """Acquisition grid summary (plot_acq_grid.m): peak location, peak-to-
    second ratio per PRN."""
    z = np.load(path)
    grid = np.asarray(z["grid"])      # [C, D, delay]
    prns = np.asarray(z["prns"])
    dops = np.asarray(z["doppler_bins_hz"])
    rows = []
    for c, prn in enumerate(prns):
        g = grid[c]
        k = np.unravel_index(np.argmax(g), g.shape)
        peak = float(g[k])
        # exclude +-1 bins around the peak delay for the second peak
        mask = np.ones_like(g, dtype=bool)
        lo, hi = max(0, k[1] - 2), min(g.shape[1], k[1] + 3)
        mask[:, lo:hi] = False
        second = float(g[mask].max()) if mask.any() else 0.0
        rows.append({
            "prn": int(prn),
            "doppler_hz": float(dops[k[0]]),
            "delay_bin": int(k[1]),
            "peak_ratio": peak / max(second, 1e-12),
        })
    if plot:
        _plot_acq(grid, prns, dops, path)
    return {"n_prns": len(prns), "channels": rows}


def _plot_acq(grid, prns, dops, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(prns)
    cols = min(4, n)
    rowsn = (n + cols - 1) // cols
    fig, axes = plt.subplots(rowsn, cols, figsize=(4 * cols, 3 * rowsn),
                             squeeze=False)
    for c in range(n):
        a = axes[c // cols][c % cols]
        a.imshow(grid[c], aspect="auto", origin="lower",
                 extent=[0, grid.shape[2], dops[0], dops[-1]])
        a.set_title(f"PRN {prns[c]}")
    out = path.rsplit(".", 1)[0] + ".png"
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}", file=sys.stderr)


def analyze_position(path: str, truth=None, plot: bool = False) -> dict:
    """Position track summary (gps_l1_ca_pvt_plot_sample.m): mean/std and,
    with --truth, 2D/3D error statistics."""
    # geodesy is numpy-only, but the package __init__ pulls jax — pin the
    # CPU platform first (CLAUDE.md: JAX_PLATFORMS is overridden by the
    # axon sitecustomize, set it after import jax)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef

    lats, lons, hgts = [], [], []
    if path.endswith(".geojson"):
        gj = json.load(open(path))
        feats = gj.get("features", [gj] if "geometry" in gj else [])
        for f in feats:
            g = f.get("geometry", {})
            if g.get("type") == "Point":
                coords = [g["coordinates"]]
            elif g.get("type") == "LineString":
                coords = g["coordinates"]
            else:
                continue
            for lon, lat, *h in coords:
                lats.append(lat)
                lons.append(lon)
                hgts.append(h[0] if h else 0.0)
    elif path.endswith(".nmea"):
        for line in open(path):
            if "GGA" not in line:
                continue
            p = line.split(",")
            if len(p) < 10 or not p[2]:
                continue
            lat = float(p[2][:2]) + float(p[2][2:]) / 60.0
            if p[3] == "S":
                lat = -lat
            lon = float(p[4][:3]) + float(p[4][3:]) / 60.0
            if p[5] == "W":
                lon = -lon
            lats.append(lat)
            lons.append(lon)
            hgts.append(float(p[9]))
    else:
        raise ValueError("position analysis reads .geojson or .nmea")
    lats, lons, hgts = map(np.asarray, (lats, lons, hgts))
    if len(lats) == 0:
        return {"fixes": 0}
    out = {
        "fixes": int(len(lats)),
        "lat_mean": float(lats.mean()), "lon_mean": float(lons.mean()),
        "h_mean": float(hgts.mean()),
        "lat_std_m": float(lats.std() * 111_320.0),
        "lon_std_m": float(lons.std() * 111_320.0
                           * math.cos(math.radians(lats.mean()))),
        "h_std_m": float(hgts.std()),
    }
    if truth is not None:
        t_ecef = llh_to_ecef(math.radians(truth[0]), math.radians(truth[1]),
                             truth[2])
        errs = []
        for la, lo, h in zip(lats, lons, hgts):
            e = llh_to_ecef(math.radians(la), math.radians(lo), h)
            errs.append(np.linalg.norm(np.asarray(e) - np.asarray(t_ecef)))
        errs = np.asarray(errs)
        out["err3d_median_m"] = float(np.median(errs))
        out["err3d_p95_m"] = float(np.percentile(errs, 95))
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("kind", choices=["tracking", "acquisition", "position"])
    ap.add_argument("path")
    ap.add_argument("--plot", action="store_true",
                    help="also write a .png next to the dump (matplotlib)")
    ap.add_argument("--truth", nargs=3, type=float, metavar=("LAT", "LON", "H"),
                    help="truth lat(deg) lon(deg) h(m) for position errors")
    args = ap.parse_args(argv)
    if args.kind == "tracking":
        res = analyze_tracking(args.path, plot=args.plot)
    elif args.kind == "acquisition":
        res = analyze_acquisition(args.path, plot=args.plot)
    else:
        res = analyze_position(args.path, truth=args.truth, plot=args.plot)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
