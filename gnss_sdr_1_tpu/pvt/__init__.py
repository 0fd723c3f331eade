"""PVT: satellite orbits, geodesy, positioning and output formats (host).

Reference parity: src/algorithms/PVT/ + the embedded RTKLIB fork
(SURVEY.md §2.10).  The round-1 spine is the reference's legacy
hybrid_ls_pvt path (Bancroft-style init + iterated least squares with
satellite clock, earth-rotation and optional atmospheric corrections);
RTKLIB-class PPP/RTK layers on in later rounds.
"""

from .ephemeris import satellite_position_velocity, satellite_clock_correction
from .geodesy import ecef_to_llh, llh_to_ecef, ecef_to_enu, az_el, dops
from .solver import PvtSolution, solve_pvt

__all__ = [
    "satellite_position_velocity", "satellite_clock_correction",
    "ecef_to_llh", "llh_to_ecef", "ecef_to_enu", "az_el", "dops",
    "PvtSolution", "solve_pvt",
]
