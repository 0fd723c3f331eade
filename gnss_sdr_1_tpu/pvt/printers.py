"""PVT output formats: RINEX observation/navigation, NMEA, KML, GPX, GeoJSON.

Reference parity: src/algorithms/PVT/libs/rinex_printer.cc (RINEX 3.02
subset: obs + nav for GPS), nmea_printer.cc (GPGGA/GPRMC), kml_printer.cc,
gpx_printer.cc, geojson_printer.cc.  Scoped per SURVEY.md §7: RINEX obs+nav
first, full multi-constellation headers and RTCM later rounds.
"""

from __future__ import annotations

import datetime
import io
from typing import Iterable

import numpy as np

from ..telemetry.lnav import GpsEphemeris
from .solver import PvtSolution

_GPS_EPOCH = datetime.datetime(1980, 1, 6, tzinfo=datetime.timezone.utc)


def gps_time_to_utc(week: int, tow_s: float, leap_s: int = 18) -> datetime.datetime:
    return _GPS_EPOCH + datetime.timedelta(
        weeks=week, seconds=tow_s - leap_s
    )


# ---------------------------------------------------------------- RINEX ----

def _rnx(x: float, width: int = 19, dec: int = 12) -> str:
    """RINEX D-format float."""
    s = f"{x:.{dec}E}"
    mant, _, exp = s.partition("E")
    return f"{mant}D{int(exp):+03d}".rjust(width)


def rinex_obs_header(marker: str = "GNSS_SDR_1_TPU",
                     approx_xyz: np.ndarray | None = None) -> str:
    out = io.StringIO()
    out.write(f"{'3.02':>9}{'':11}{'OBSERVATION DATA':<20}{'M: MIXED':<20}"
              "RINEX VERSION / TYPE\n")
    out.write(f"{'gnss-sdr-1-tpu':<20}{'':40}PGM / RUN BY / DATE\n")
    out.write(f"{marker:<60}MARKER NAME\n")
    if approx_xyz is not None:
        out.write(f"{approx_xyz[0]:14.4f}{approx_xyz[1]:14.4f}"
                  f"{approx_xyz[2]:14.4f}{'':18}APPROX POSITION XYZ\n")
    out.write(f"G    4 C1C L1C D1C S1C{'':38}SYS / # / OBS TYPES\n")
    out.write(f"{'':60}END OF HEADER\n")
    return out.getvalue()


def rinex_obs_epoch(week: int, tow_s: float,
                    observations: dict[int, dict]) -> str:
    """One observation epoch.  observations: prn -> {pseudorange_m,
    carrier_phase_cycles, doppler_hz, cn0_dbhz}."""
    t = gps_time_to_utc(week, tow_s)
    out = io.StringIO()
    out.write(f"> {t.year:4d} {t.month:02d} {t.day:02d} {t.hour:02d} "
              f"{t.minute:02d}{t.second + t.microsecond/1e6:11.7f}  0"
              f"{len(observations):3d}\n")
    for prn in sorted(observations):
        o = observations[prn]
        out.write(f"G{prn:02d}"
                  f"{o.get('pseudorange_m', 0.0):14.3f}  "
                  f"{o.get('carrier_phase_cycles', 0.0):14.3f}  "
                  f"{o.get('doppler_hz', 0.0):14.3f}  "
                  f"{o.get('cn0_dbhz', 0.0):14.3f}\n")
    return out.getvalue()


def rinex_nav_header() -> str:
    out = io.StringIO()
    out.write(f"{'3.02':>9}{'':11}{'N: GNSS NAV DATA':<20}{'G: GPS':<20}"
              "RINEX VERSION / TYPE\n")
    out.write(f"{'gnss-sdr-1-tpu':<20}{'':40}PGM / RUN BY / DATE\n")
    out.write(f"{'':60}END OF HEADER\n")
    return out.getvalue()


def rinex_nav_record(eph: GpsEphemeris) -> str:
    """One GPS LNAV broadcast record (8 lines, RINEX 3.02)."""
    t = gps_time_to_utc(eph.week + 2048, eph.toc, leap_s=0)
    out = io.StringIO()
    out.write(f"G{eph.prn:02d} {t.year:4d} {t.month:02d} {t.day:02d} "
              f"{t.hour:02d} {t.minute:02d} {t.second:02d}"
              f"{_rnx(eph.af0)}{_rnx(eph.af1)}{_rnx(eph.af2)}\n")
    rows = [
        (eph.iode, eph.crs, eph.delta_n * np.pi, eph.m0 * np.pi),
        (eph.cuc, eph.e, eph.cus, eph.sqrt_a),
        (eph.toe, eph.cic, eph.omega0 * np.pi, eph.cis),
        (eph.i0 * np.pi, eph.crc, eph.omega * np.pi, eph.omega_dot * np.pi),
        (eph.idot * np.pi, 1.0, float(eph.week + 2048), 0.0),
        (2.0, float(eph.sv_health), eph.tgd, float(eph.iodc)),
        (0.0, 4.0, 0.0, 0.0),
    ]
    for row in rows:
        out.write("    " + "".join(_rnx(float(v)) for v in row) + "\n")
    return out.getvalue()


# ----------------------------------------------------------------- NMEA ----

def _nmea_checksum(body: str) -> str:
    c = 0
    for ch in body:
        c ^= ord(ch)
    return f"{c:02X}"


def _nmea_latlon(deg: float, is_lat: bool) -> tuple[str, str]:
    hemi = ("N" if deg >= 0 else "S") if is_lat else ("E" if deg >= 0 else "W")
    d = abs(deg)
    whole = int(d)
    minutes = (d - whole) * 60.0
    fmt = f"{whole:02d}" if is_lat else f"{whole:03d}"
    return f"{fmt}{minutes:09.6f}", hemi


def nmea_gga(sol: PvtSolution, utc: datetime.datetime) -> str:
    """$GPGGA sentence (nmea_printer.cc analogue)."""
    lat, ns = _nmea_latlon(sol.lat_deg, True)
    lon, ew = _nmea_latlon(sol.lon_deg, False)
    hdop = sol.dops["hdop"] if sol.dops else 0.0
    body = (f"GPGGA,{utc:%H%M%S}.00,{lat},{ns},{lon},{ew},1,"
            f"{sol.n_sats:02d},{hdop:.1f},{sol.height_m:.1f},M,0.0,M,,")
    return f"${body}*{_nmea_checksum(body)}"


def nmea_rmc(sol: PvtSolution, utc: datetime.datetime) -> str:
    lat, ns = _nmea_latlon(sol.lat_deg, True)
    lon, ew = _nmea_latlon(sol.lon_deg, False)
    speed_kt = float(np.linalg.norm(sol.rx_vel_ecef_ms)) * 1.9438445
    body = (f"GPRMC,{utc:%H%M%S}.00,A,{lat},{ns},{lon},{ew},"
            f"{speed_kt:.2f},0.0,{utc:%d%m%y},,,A")
    return f"${body}*{_nmea_checksum(body)}"


# ------------------------------------------------------- KML / GPX / GeoJSON

def kml_document(solutions: Iterable[PvtSolution], name: str = "gnss-sdr-1-tpu") -> str:
    coords = " ".join(
        f"{s.lon_deg:.9f},{s.lat_deg:.9f},{s.height_m:.3f}"
        for s in solutions if s.valid
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<kml xmlns="http://www.opengis.net/kml/2.2">\n'
        f"<Document><name>{name}</name><Placemark><LineString>\n"
        f"<coordinates>{coords}</coordinates>\n"
        "</LineString></Placemark></Document></kml>\n"
    )


def gpx_document(solutions: Iterable[PvtSolution], name: str = "gnss-sdr-1-tpu") -> str:
    pts = "\n".join(
        f'      <trkpt lat="{s.lat_deg:.9f}" lon="{s.lon_deg:.9f}">'
        f"<ele>{s.height_m:.3f}</ele></trkpt>"
        for s in solutions if s.valid
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<gpx version="1.1" creator="{name}" '
        'xmlns="http://www.topografix.com/GPX/1/1">\n'
        f"  <trk><name>{name}</name><trkseg>\n{pts}\n"
        "  </trkseg></trk>\n</gpx>\n"
    )


def geojson_document(solutions: Iterable[PvtSolution]) -> str:
    import json

    coords = [
        [s.lon_deg, s.lat_deg, s.height_m] for s in solutions if s.valid
    ]
    return json.dumps({
        "type": "Feature",
        "geometry": {"type": "LineString", "coordinates": coords},
        "properties": {"name": "gnss-sdr-1-tpu position"},
    }, indent=1)
