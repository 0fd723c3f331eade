#!/usr/bin/env python3
"""Extract public-ICD constant tables from the reference headers into an .npz.

These tables are pure data published in the GNSS interface control documents
(IS-GPS-200/705 register presets, Galileo OS SIS ICD Annex C memory codes,
BeiDou ICD register presets).  Any implementation must contain bit-identical
tables; we read them from the reference's headers once at build time and store
them as a binary asset (gnss_sdr_1_tpu/codes/data/icd_tables.npz).  No code is
copied — the generator algorithms are implemented independently from the ICDs.

Run: python tools/extract_icd_tables.py [/root/reference]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

REF = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
SP = REF / "src/core/system_parameters"
OUT = Path(__file__).resolve().parent.parent / "gnss_sdr_1_tpu/codes/data/icd_tables.npz"


def read(p: Path) -> str:
    return p.read_text(errors="replace")


def int_array(text: str, name: str) -> np.ndarray:
    """Parse `const int32_t NAME[...] = { ... };` into an int64 array.
    Octal literals (leading 0) are parsed base-8, as in C."""
    m = re.search(rf"{name}\s*\[[^\]]*\]\s*=\s*\{{(.*?)\}}\s*;", text, re.S)
    if not m:
        raise KeyError(name)
    body = re.sub(r"//[^\n]*", "", m.group(1))
    vals = []
    for tok in re.findall(r"[0-9]+", body):
        vals.append(int(tok, 8) if tok.startswith("0") and len(tok) > 1 else int(tok))
    return np.asarray(vals, dtype=np.int64)


def str_array(text: str, name: str) -> list[str]:
    """Parse `const std::string NAME[...] = { "..." , ... };`"""
    m = re.search(rf"{name}\s*\[[^\]]*\]\s*=\s*\{{(.*?)\}}\s*;", text, re.S)
    if not m:
        raise KeyError(name)
    return re.findall(r'"([^"]+)"', m.group(1))


def scalar_str(text: str, name: str) -> str:
    m = re.search(rf"{name}\s*=\s*\{{?\s*\"([^\"]+)\"", text)
    if not m:
        raise KeyError(name)
    return m.group(1)


def bool_matrix(text: str, name: str) -> np.ndarray:
    """Parse `std::array<std::array<bool, W>, H> NAME = {{ {{true,...}}, ... }};`"""
    m = re.search(rf"{name}\s*=\s*(\{{.*?\}})\s*;", text, re.S)
    if not m:
        raise KeyError(name)
    rows = re.findall(r"\{\{([^{}]+)\}\}", m.group(1))
    mat = [[1 if t.strip() == "true" else 0 for t in row.split(",")] for row in rows]
    return np.asarray(mat, dtype=np.int8)


def main() -> None:
    tables: dict[str, object] = {}

    l2c = read(SP / "GPS_L2C.h")
    tables["gps_l2cm_init_reg"] = int_array(l2c, "GPS_L2C_M_INIT_REG")

    l5 = read(SP / "GPS_L5.h")
    tables["gps_l5i_init_reg"] = int_array(l5, "GPS_L5I_INIT_REG")
    tables["gps_l5q_init_reg"] = int_array(l5, "GPS_L5Q_INIT_REG")

    e1 = read(SP / "Galileo_E1.h")
    tables["galileo_e1b_hex"] = np.asarray(str_array(e1, "GALILEO_E1_B_PRIMARY_CODE"))
    tables["galileo_e1c_hex"] = np.asarray(str_array(e1, "GALILEO_E1_C_PRIMARY_CODE"))
    tables["galileo_e1c_secondary"] = np.asarray(
        scalar_str(e1, "GALILEO_E1_C_SECONDARY_CODE")
    )

    e5a = read(SP / "Galileo_E5a.h")
    tables["galileo_e5ai_hex"] = np.asarray(str_array(e5a, "GALILEO_E5A_I_PRIMARY_CODE"))
    tables["galileo_e5aq_hex"] = np.asarray(str_array(e5a, "GALILEO_E5A_Q_PRIMARY_CODE"))
    tables["galileo_e5ai_secondary"] = np.asarray(
        scalar_str(e5a, "GALILEO_E5A_I_SECONDARY_CODE")
    )
    tables["galileo_e5aq_secondary"] = np.asarray(
        str_array(e5a, "GALILEO_E5A_Q_SECONDARY_CODE")
    )

    b3i = read(REF / "src/algorithms/libs/beidou_b3i_signal_processing.cc")
    tables["beidou_b3i_g2_presets"] = bool_matrix(b3i, "G2_register_shifted")

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **tables)
    for k, v in tables.items():
        shape = getattr(v, "shape", None)
        print(f"{k}: shape={shape}")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
