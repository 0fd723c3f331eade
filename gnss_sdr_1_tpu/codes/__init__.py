"""PRN spreading-code generation (host-side, precomputed once per run).

Reference parity: src/algorithms/libs/gps_sdr_signal_processing.{h,cc},
gps_l2c_signal.cc, gps_l5_signal.cc, galileo_e1_signal_processing.cc,
galileo_e5_signal_processing.cc, glonass_l{1,2}_signal_processing.cc,
beidou_b{1,3}i_signal_processing.cc, gnss_signal_processing.cc.

Codes are generated from the public ICD shift-register definitions, emitted
as ±1 float arrays, then resampled / FFT'd per sampling rate by the
acquisition and tracking layers.  All pure NumPy — tiny, run once.
"""

from .gps_l1ca import gps_l1ca_code
from .gps_l2c import gps_l2cm_code
from .gps_l5 import gps_l5i_code, gps_l5q_code, NH10, NH20
from .galileo_e1 import galileo_e1b_code, galileo_e1c_code, galileo_e1_sinboc11, E1C_SECONDARY
from .galileo_e5 import galileo_e5ai_code, galileo_e5aq_code
from .glonass import glonass_ca_code
from .beidou import beidou_b1i_code, beidou_b3i_code, BEIDOU_NH20
from .sampling import resample_code, code_to_baseband

__all__ = [
    "gps_l1ca_code", "gps_l2cm_code", "gps_l5i_code", "gps_l5q_code",
    "NH10", "NH20",
    "galileo_e1b_code", "galileo_e1c_code", "galileo_e1_sinboc11", "E1C_SECONDARY",
    "galileo_e5ai_code", "galileo_e5aq_code",
    "glonass_ca_code", "beidou_b1i_code", "beidou_b3i_code", "BEIDOU_NH20",
    "resample_code", "code_to_baseband", "generate_code", "tracking_replica",
]


def tracking_replica(signal_id: str, prn: int):
    """Local replica for acquisition/tracking: returns
    (samples, virtual_chip_rate, code_samples_per_chip).

    For BOC signals the replica carries the subcarrier: Galileo E1 uses
    sinBOC(1,1) at 2 samples/chip (the reference's default tracking replica,
    galileo_e1_code_gen_sinboc11_float), so the 'virtual' chip rate doubles.
    """
    chips = generate_code(signal_id, prn)
    if signal_id == "1B":
        from .galileo_e1 import galileo_e1_sinboc11

        return galileo_e1_sinboc11(chips), 2 * 1.023e6, 2
    from ..constants import SIGNALS

    return chips, SIGNALS[signal_id].code_rate_chips_s, 1


def generate_code(signal_id: str, prn: int):
    """Dispatch: (signal_id, prn) -> ±1 float32 chip array at 1 sample/chip.

    signal_id uses the reference's 2-char codes ('1C','2S','L5','1B','5X',
    '1G','2G','B1','B3'); mirrors the per-adapter code generation calls in
    src/algorithms/acquisition/adapters/*.cc.
    """
    if signal_id == "1C":
        return gps_l1ca_code(prn)
    if signal_id == "2S":
        return gps_l2cm_code(prn)
    if signal_id == "L5":
        return gps_l5i_code(prn)
    if signal_id == "1B":
        return galileo_e1b_code(prn)
    if signal_id == "5X":
        return galileo_e5ai_code(prn)
    if signal_id in ("1G", "2G"):
        return glonass_ca_code()
    if signal_id == "B1":
        return beidou_b1i_code(prn)
    if signal_id == "B3":
        return beidou_b3i_code(prn)
    raise ValueError(f"unknown signal id {signal_id!r}")
