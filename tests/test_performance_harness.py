"""ROC / pull-in harness smoke tests (small grids; the full sweeps are
tools-level runs).  Mirrors acq_performance_test.cc / tracking_pull-in_test."""

import numpy as np

from gnss_sdr_1_tpu.acquire.performance import (
    acquisition_roc,
    tracking_pull_in_map,
)


def test_roc_monotone_in_cn0():
    pts = acquisition_roc(cn0_grid=(33.0, 45.0), n_trials=6, threshold=2.0)
    lo, hi = pts
    assert hi.pd >= lo.pd
    assert hi.pd == 1.0                  # strong signal always detected
    assert hi.mean_stat_present > 2.0 * hi.mean_stat_absent
    assert lo.pfa <= 0.5 and hi.pfa <= 0.5


def test_pull_in_map_center_locks():
    pts = tracking_pull_in_map(doppler_errs=(0.0, 150.0),
                               delay_errs=(0.0, 0.75),
                               duration_s=1.2)
    by_key = {(p.doppler_err_hz, p.delay_err_chips): p for p in pts}
    assert by_key[(0.0, 0.0)].locked
    # larger injected errors may or may not lock, but the harness reports
    assert len(pts) == 4
