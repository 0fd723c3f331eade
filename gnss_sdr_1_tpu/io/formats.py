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
    items_per_sample: int        # raw dtype items consumed per complex sample
    samples_per_item: int = 1    # sub-byte packings: complex samples per item

    @property
    def bytes_per_sample(self) -> float:
        return (self.dtype.itemsize * self.items_per_sample
                / self.samples_per_item)


FORMATS: dict[str, SampleFormat] = {
    "byte": SampleFormat("byte", np.dtype(np.int8), 1),
    "short": SampleFormat("short", np.dtype(np.int16), 1),
    "ibyte": SampleFormat("ibyte", np.dtype(np.int8), 2),
    "ishort": SampleFormat("ishort", np.dtype(np.int16), 2),
    "cbyte": SampleFormat("cbyte", np.dtype(np.int8), 2),
    "cshort": SampleFormat("cshort", np.dtype(np.int16), 2),
    "gr_complex": SampleFormat("gr_complex", np.dtype(np.complex64), 1),
    # packed front-end formats (unpack_byte_2bit_cpx_samples.cc:75-95 /
    # unpack_byte_4bit_samples): 2-bit signed I/Q nibble-packed 2 complex
    # samples per byte [MS nibble first, nibble = Q1 Q0 I1 I0]; 4-bit
    # signed I/Q one complex sample per byte [Q nibble high, I low]
    "2bits_cpx": SampleFormat("2bits_cpx", np.dtype(np.uint8), 1, 2),
    "4bits_cpx": SampleFormat("4bits_cpx", np.dtype(np.uint8), 1, 1),
    # unsigned uint8 I/Q centered on 127.5 (the rtl_tcp / RTL-SDR stream)
    "ubyte_iq": SampleFormat("ubyte_iq", np.dtype(np.uint8), 2),
}


def _signed_k_bits(v: np.ndarray, k: int) -> np.ndarray:
    """Two's-complement reinterpretation of the low k bits."""
    m = 1 << (k - 1)
    v = v & ((1 << k) - 1)
    return v.astype(np.float32) - 2.0 * m * (v >= m)


def convert_to_complex64(raw: np.ndarray, fmt: SampleFormat) -> np.ndarray:
    """Convert a raw item array (1-D, dtype = fmt.dtype) to complex64."""
    if fmt.name == "gr_complex":
        return np.ascontiguousarray(raw, dtype=np.complex64)
    if fmt.name == "2bits_cpx":
        b = raw.astype(np.uint16)
        nibs = np.empty(2 * len(b), dtype=np.uint16)
        nibs[0::2] = (b >> 4) & 0xF          # sample n in the MS nibble
        nibs[1::2] = b & 0xF
        out = np.empty(len(nibs), dtype=np.complex64)
        out.real = _signed_k_bits(nibs & 0x3, 2)
        out.imag = _signed_k_bits((nibs >> 2) & 0x3, 2)
        return out
    if fmt.name == "4bits_cpx":
        b = raw.astype(np.uint16)
        out = np.empty(len(b), dtype=np.complex64)
        out.real = _signed_k_bits(b & 0xF, 4)
        out.imag = _signed_k_bits((b >> 4) & 0xF, 4)
        return out
    if fmt.name == "ubyte_iq":
        n = len(raw) // 2
        f = raw[: 2 * n].astype(np.float32) - 127.5
        out = np.empty(n, dtype=np.complex64)
        out.real = f[0::2]
        out.imag = f[1::2]
        return out
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
