"""Signal conditioning: IF mixing, FIR filtering, resampling (device).

Reference parity: SignalConditioner chain (src/algorithms/conditioner/ +
data_type_adapter/ + input_filter/ + resampler/, SURVEY.md §2.5):
  * DataTypeAdapter    -> io.formats (conversion happens at ingest)
  * Freq_Xlating_Fir_Filter -> freq-shift + FIR decimate via overlap-save
    FFT block convolution (the TPU-idiomatic form of gr firdes filtering)
  * Direct_Resampler   -> nearest-previous-sample decimation
  * Notch/pulse-blanking -> notch_filter (spectral excision)
  * Beamformer_Filter  -> fixed-weight array combiner (beamformer.cc)
"""

from .filters import (
    Beamformer,
    Conditioner,
    design_lowpass_fir,
    direct_resample,
    freq_xlating_fir,
    steering_weights,
)

__all__ = [
    "Beamformer", "Conditioner", "design_lowpass_fir", "direct_resample",
    "freq_xlating_fir", "steering_weights",
]
