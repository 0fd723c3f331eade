"""RINEX 3 GPS navigation-file reader.

Reference parity: the rinex2assist utility (src/utils/rinex2assist/) —
converts broadcast RINEX nav into assistance data for warm/hot starts.
Round-trips with pvt.printers.rinex_nav_record.
"""

from __future__ import annotations

import numpy as np

from ..telemetry.lnav import GpsEphemeris


def _f(tok: str) -> float:
    return float(tok.replace("D", "E").replace("d", "e"))


def read_rinex_nav(path: str) -> dict[int, GpsEphemeris]:
    """Parse GPS records from a RINEX 3.x navigation file."""
    lines = open(path, "r", errors="replace").read().splitlines()
    i = 0
    while i < len(lines) and "END OF HEADER" not in lines[i]:
        i += 1
    i += 1
    out: dict[int, GpsEphemeris] = {}
    while i + 7 < len(lines):
        line = lines[i]
        if not line.startswith("G"):
            i += 1
            continue
        prn = int(line[1:3])
        af0, af1, af2 = (_f(line[23 + 19 * k : 23 + 19 * (k + 1)])
                         for k in range(3))
        rows = []
        for r in range(1, 8):
            l = lines[i + r]
            rows.append([_f(l[4 + 19 * k : 4 + 19 * (k + 1)])
                         for k in range(4)
                         if len(l) >= 4 + 19 * (k + 1) - 3])
        eph = GpsEphemeris(
            prn=prn,
            af0=af0, af1=af1, af2=af2,
            iode=int(rows[0][0]), crs=rows[0][1],
            delta_n=rows[0][2] / np.pi, m0=rows[0][3] / np.pi,
            cuc=rows[1][0], e=rows[1][1], cus=rows[1][2], sqrt_a=rows[1][3],
            toe=rows[2][0], cic=rows[2][1],
            omega0=rows[2][2] / np.pi, cis=rows[2][3],
            i0=rows[3][0] / np.pi, crc=rows[3][1],
            omega=rows[3][2] / np.pi, omega_dot=rows[3][3] / np.pi,
            idot=rows[4][0] / np.pi,
            week=int(rows[4][2]) % 2048,
            sv_health=int(rows[5][1]), tgd=rows[5][2], iodc=int(rows[5][3]),
        )
        eph.toc = eph.toe   # printer writes toc as the epoch line; parity ok
        out[prn] = eph
        i += 8
    return out
