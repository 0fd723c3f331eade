"""RINEX layout validation INDEPENDENT of the repo's own reader
(VERDICT r4 Weak #8): a character-position checker written from the
RINEX 3.02 / 2.11 format tables (IGS RINEX 3.02 §A2-A9; the same layout
rtklib and teqc enforce), applied to the printers' output.  Catches
column drift the self round-trips structurally cannot (both sides would
shift together)."""

import numpy as np

from gnss_sdr_1_tpu.pvt import printers
from gnss_sdr_1_tpu.siggen.scenario import make_test_ephemeris


def _header_labels_in_column_61(text: str) -> None:
    """RINEX A2: header labels occupy columns 61-80 of every header line;
    the terminator is exactly 'END OF HEADER'."""
    lines = text.splitlines()
    assert lines, "empty header"
    saw_end = False
    for ln in lines:
        if not ln.strip():
            continue
        assert len(ln) >= 61, f"header line shorter than label column: {ln!r}"
        label = ln[60:80].rstrip()
        assert label, f"no label in cols 61-80: {ln!r}"
        if label == "END OF HEADER":
            saw_end = True
    assert saw_end


def test_rinex3_obs_header_layout():
    hdr = printers.rinex_obs_header(signals=("1C",))
    _header_labels_in_column_61(hdr)
    first = hdr.splitlines()[0]
    # A2: F9.2 version in cols 1-9, file type 'O' at col 21
    assert first[60:80].rstrip() == "RINEX VERSION / TYPE"
    assert first[:9].strip() == "3.02"
    assert first[20] == "O"
    # APPROX POSITION XYZ: three F14.4 fields
    for ln in hdr.splitlines():
        if ln[60:80].rstrip() == "APPROX POSITION XYZ":
            for k in range(3):
                f = ln[14 * k : 14 * (k + 1)]
                assert len(f) == 14
                float(f)            # numeric, right-justified F14.4
                assert f[-5] == "."
        if ln[60:80].rstrip() == "SYS / # / OBS TYPES":
            assert ln[0] == "G"
            assert int(ln[3:6]) >= 3          # C1C L1C D1C (S1C)
            assert ln[7:10] == "C1C"


def test_rinex3_obs_epoch_layout():
    obs = {5: {"C": 21000000.123, "L": -110363000.456, "D": 1234.5,
               "S": 44.0},
           17: {"C": 23456789.012, "L": -123456789.987, "D": -4321.0,
                "S": 41.5}}
    rec = printers.rinex_obs_epoch(2200, 345600.0, obs, signals=("1C",))
    lines = rec.splitlines()
    ep = lines[0]
    # A6 epoch record: '>' col 1, I4 year at 3-6, fields at fixed offsets,
    # epoch flag at col 32, sat count I3 at 33-35
    assert ep[0] == ">"
    assert ep[1] == " "
    int(ep[2:6])
    assert ep[31] == "0"
    assert int(ep[32:35]) == 2
    for ln in lines[1:]:
        # sat id A1+I2.2 then N x F14.3 + LLI + SSI
        assert ln[0] == "G"
        int(ln[1:3])
        for k in range(3):          # C, L, D fields present
            f = ln[3 + 16 * k : 3 + 16 * k + 14]
            float(f)
            assert f[-4] == "."     # F14.3


def test_rinex3_nav_record_layout():
    eph = make_test_ephemeris(7, 345600.0)
    rec = printers.rinex_nav_record(eph)
    lines = rec.splitlines()
    # A14: 'Gnn' + epoch + 3 clock D19.12 fields on line 1; 7 continuation
    # lines of up to 4 D19.12 fields starting at col 5
    assert lines[0][0] == "G"
    assert int(lines[0][1:3]) == 7
    assert len(lines) == 8
    for f0 in (23, 42, 61):
        fld = lines[0][f0 : f0 + 19]
        assert "E" in fld.upper() or "D" in fld.upper()
        float(fld.upper().replace("D", "E"))
    for ln in lines[1:]:
        assert ln[:4] == "    "
        body = ln[4:]
        assert len(body) % 19 == 0
        for k in range(len(body) // 19):
            float(body[19 * k : 19 * (k + 1)].upper().replace("D", "E"))


def test_rinex2_obs_types_layout():
    hdr = printers.rinex_obs_header(signals=("1C",), version=2)
    _header_labels_in_column_61(hdr)
    first = hdr.splitlines()[0]
    assert first[:9].strip() == "2.11"
    for ln in hdr.splitlines():
        if ln[60:80].rstrip() == "# / TYPES OF OBSERV":
            n = int(ln[:6])
            assert n >= 3
            # 6-char fields: right-justified 2-char codes
            codes = [ln[6 + 6 * k : 12 + 6 * k] for k in range(n)]
            assert codes[0].endswith("C1")


def test_nmea_checksums_and_talkers():
    """NMEA 0183: '$' + talker/type, '*' + XOR checksum of the body."""
    from gnss_sdr_1_tpu.pvt.solver import PvtSolution

    sol = PvtSolution(True, np.array([4797671.0, 166532.0, 4185477.0]),
                      0.0, np.zeros(3), 0.0, 345600.0, lat_deg=41.275,
                      lon_deg=1.988, height_m=80.0,
                      dops={"pdop": 2.0, "hdop": 1.0, "vdop": 1.5},
                      n_sats=8)
    utc = printers.gps_time_to_utc(2200, 345600.0)
    for s in (printers.nmea_gga(sol, utc), printers.nmea_rmc(sol, utc)):
        assert s.startswith("$GP")
        body, chk = s[1:].split("*")
        x = 0
        for c in body:
            x ^= ord(c)
        assert f"{x:02X}" == chk.strip()
