"""Raw IQ sample formats and conversion to complex64.

Reference parity: the item_type config values accepted by File_Signal_Source
plus the data-type adapters (src/algorithms/data_type_adapter/adapters/):
  byte          real int8
  short         real int16
  ibyte         interleaved I/Q int8    (Ibyte_To_Complex)
  ishort        interleaved I/Q int16   (Ishort_To_Complex)
  cbyte         complex int8 pairs      (same memory layout as ibyte)
  cshort        complex int16 pairs     (same memory layout as ishort)
  gr_complex    complex64
Real formats are converted to analytic baseband by the conditioner's
freq-xlating stage; here they become complex with zero Q.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SampleFormat:
    name: str
    dtype: np.dtype
    items_per_sample: int   # raw dtype items consumed per complex sample

    @property
    def bytes_per_sample(self) -> int:
        return self.dtype.itemsize * self.items_per_sample


FORMATS: dict[str, SampleFormat] = {
    "byte": SampleFormat("byte", np.dtype(np.int8), 1),
    "short": SampleFormat("short", np.dtype(np.int16), 1),
    "ibyte": SampleFormat("ibyte", np.dtype(np.int8), 2),
    "ishort": SampleFormat("ishort", np.dtype(np.int16), 2),
    "cbyte": SampleFormat("cbyte", np.dtype(np.int8), 2),
    "cshort": SampleFormat("cshort", np.dtype(np.int16), 2),
    "gr_complex": SampleFormat("gr_complex", np.dtype(np.complex64), 1),
}


def convert_to_complex64(raw: np.ndarray, fmt: SampleFormat) -> np.ndarray:
    """Convert a raw item array (1-D, dtype = fmt.dtype) to complex64."""
    if fmt.name == "gr_complex":
        return np.ascontiguousarray(raw, dtype=np.complex64)
    if fmt.items_per_sample == 1:
        out = np.zeros(len(raw), dtype=np.complex64)
        out.real = raw.astype(np.float32)
        return out
    # interleaved I/Q
    n = len(raw) // 2
    f = raw[: 2 * n].astype(np.float32).reshape(n, 2)
    out = np.empty(n, dtype=np.complex64)
    out.real = f[:, 0]
    out.imag = f[:, 1]
    return out
