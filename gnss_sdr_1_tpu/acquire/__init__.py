"""Acquisition: batched PCPS (Parallel Code Phase Search) on device.

Reference parity: src/algorithms/acquisition/ — pcps_acquisition.cc and its
CUDA/OpenCL/FPGA variants all collapse into one batched XLA path here
(SURVEY.md §2.6): a (channels, doppler_bins, fft_size) tensor pipeline of
carrier wipe-off, FFT circular correlation and CFAR / peak-ratio statistics.
"""

from .pcps import AcqConfig, AcqResult, PcpsAcquisition
from .variants import (CafAcquisition, CccwsrAcquisition,
                       FineDopplerAcquisition, Pcps8msAcquisition,
                       QuickSyncAcquisition)

__all__ = ["AcqConfig", "AcqResult", "PcpsAcquisition",
           "QuickSyncAcquisition", "CccwsrAcquisition",
           "FineDopplerAcquisition", "Pcps8msAcquisition", "CafAcquisition"]
