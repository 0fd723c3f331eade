#!/usr/bin/env python3
"""Front-end oscillator calibration.

Reference parity: src/utils/front-end-cal (front_end_cal.cc): acquire all
GPS PRNs on a capture, compare measured Dopplers with Dopplers predicted
from assisted ephemeris + a reference position, and solve the common offset
-> the RF front-end's oscillator frequency error (ppm of L1).

Usage:
  python tools/front_end_cal.py --signal_file cap.dat --item_type ishort \
      --fs 4e6 --assist agnss.json --lat 41.27 --lon 1.99 --h 80 --tow 345600
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--signal_file", required=True)
    ap.add_argument("--item_type", default="ishort")
    ap.add_argument("--fs", type=float, required=True)
    ap.add_argument("--assist", required=True, help="assistance JSON")
    ap.add_argument("--lat", type=float, required=True)
    ap.add_argument("--lon", type=float, required=True)
    ap.add_argument("--h", type=float, default=0.0)
    ap.add_argument("--tow", type=float, required=True)
    ap.add_argument("--doppler_max", type=float, default=15000.0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from gnss_sdr_1_tpu.acquire import AcqConfig, PcpsAcquisition
    from gnss_sdr_1_tpu.codes import gps_l1ca_code
    from gnss_sdr_1_tpu.io import FileSignalSource
    from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
    from gnss_sdr_1_tpu.runtime.assistance import load_assistance, predict_visible

    ephs, _, _ = load_assistance(args.assist)
    rx = llh_to_ecef(np.radians(args.lat), np.radians(args.lon), args.h)
    vis = predict_visible(ephs, rx, args.tow)
    print(f"{len(vis)} satellites predicted visible")

    fs = args.fs
    spc = int(round(fs * 1e-3))
    cfg = AcqConfig(fs_hz=fs, samples_per_code=spc,
                    samples_per_chip=max(1, int(round(fs / 1.023e6))),
                    doppler_max_hz=args.doppler_max, doppler_step_hz=250.0,
                    max_dwells=4, use_cfar=False, threshold=2.0,
                    make_two_steps=True, doppler_step2_hz=25.0,
                    num_doppler_bins_step2=12)
    codes = {p: gps_l1ca_code(p) for p in vis}
    eng = PcpsAcquisition(cfg, codes, fs_code_rate=(1.023e6, 1023))
    src = FileSignalSource(args.signal_file, item_type=args.item_type,
                           sampling_frequency=fs)
    samples = src.read(0, cfg.fft_size * cfg.max_dwells + spc)
    res = eng.acquire(samples)

    diffs = []
    for i, prn in enumerate(eng.prns):
        if not res.positive[i]:
            continue
        pred = vis[prn]["doppler_hz"]
        meas = res.doppler_hz[i]
        diffs.append(meas - pred)
        print(f"PRN {prn:2d}: measured {meas:+8.1f} Hz  predicted "
              f"{pred:+8.1f} Hz  diff {meas - pred:+7.1f} Hz")
    if len(diffs) < 2:
        print("Not enough detections for calibration.")
        return
    offset = float(np.median(diffs))
    ppm = offset / 1575.42e6 * 1e6
    print(f"\nEstimated oscillator offset: {offset:+.1f} Hz at L1 "
          f"= {ppm:+.4f} ppm")
    print(f"Corrected sampling frequency suggestion: fs * (1 {'-' if ppm>0 else '+'} "
          f"{abs(ppm):.4f}e-6)")


if __name__ == "__main__":
    main()
