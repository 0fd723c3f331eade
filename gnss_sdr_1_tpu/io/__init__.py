"""Sample ingest (host-side).

Reference parity: src/algorithms/signal_source/ (File_Signal_Source + the
format-specific sources) and src/algorithms/data_type_adapter/ (Ibyte_To_*,
Ishort_To_*).  In the TPU design the data-type adapter collapses into the
reader: every source yields complex64 baseband blocks ready for device
transfer, and the reference's `gnss_sdr_valve` (bounded stream) becomes the
reader's `max_samples` bound.
"""

from .file_source import FileSignalSource, read_capture
from .formats import FORMATS, convert_to_complex64

__all__ = ["FileSignalSource", "read_capture", "FORMATS", "convert_to_complex64"]
