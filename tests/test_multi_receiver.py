"""Multi-constellation joint PVT tests.

ISB solver unit test (synthetic GPS+`E` observations with different clock
biases) + the MultiReceiver plumbing over a shared stream.
"""

import numpy as np
import pytest

from gnss_sdr_1_tpu.constants import SPEED_OF_LIGHT_M_S
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.pvt.solver import solve_pvt
from gnss_sdr_1_tpu.siggen.scenario import build_scenario, observed_delay_s


def test_isb_solver_two_systems():
    rx = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    t_rx = 345601.0
    bias_g, bias_e = 2.1e-4, 2.1e-4 + 45e-9   # 45 ns inter-system bias
    scen = build_scenario(rx, [1, 2, 3, 4, 5, 6, 7, 8], t0_tow=t_rx,
                          duration_s=1.0)
    ephs, prs, systems = {}, {}, {}
    for i, p in enumerate(scen.ephemerides):
        tau = observed_delay_s(scen.ephemerides[p], rx, t_rx)
        sysid = "G" if i < 4 else "E"
        bias = bias_g if sysid == "G" else bias_e
        ephs[p] = scen.ephemerides[p]
        prs[p] = (tau + bias) * SPEED_OF_LIGHT_M_S
        systems[p] = sysid
    sol = solve_pvt(ephs, prs, t_rx + bias_g, systems=systems)
    assert sol.valid
    assert np.linalg.norm(sol.rx_ecef_m - rx) < 0.05
    # the alphabetically-first system's ('E') bias is reported; the 45 ns
    # inter-system bias is resolved, not smeared into position
    assert sol.rx_clock_bias_s == pytest.approx(bias_e, abs=1e-10)


def test_isb_solver_insufficient_per_system():
    """3 sats of one system + 1 of another = 4 total but 5 unknowns."""
    rx = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)
    t_rx = 345601.0
    scen = build_scenario(rx, [1, 2, 3, 4], t0_tow=t_rx, duration_s=1.0)
    ephs, prs, systems = {}, {}, {}
    for i, p in enumerate(scen.ephemerides):
        tau = observed_delay_s(scen.ephemerides[p], rx, t_rx)
        ephs[p] = scen.ephemerides[p]
        prs[p] = tau * SPEED_OF_LIGHT_M_S
        systems[p] = "G" if i < 3 else "E"
    sol = solve_pvt(ephs, prs, t_rx, systems=systems)
    assert not sol.valid
