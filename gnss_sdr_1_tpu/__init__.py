"""TPU-native GNSS software-defined receiver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of GNSS-SDR
(reference: /root/reference, v0.0.10): multi-constellation acquisition,
tracking, telemetry decoding, observables and PVT, architected for TPU
hardware — batched FFT circular correlation for acquisition, scan-carried
tracking loops with fused correlator kernels, channel sharding over device
meshes — rather than a port of the reference's GNU Radio flowgraph.

Layering (bottom-up, see SURVEY.md §7):
    constants   per-signal ICD constants (ref: src/core/system_parameters/)
    codes       PRN code generation     (ref: src/algorithms/libs/*signal_processing*)
    io          sample ingest           (ref: src/algorithms/signal_source/)
    condition   type conversion, filtering, resampling (ref: src/algorithms/{data_type_adapter,input_filter,resampler})
    acquire     batched PCPS            (ref: src/algorithms/acquisition/)
    track       scan DLL/PLL/FLL        (ref: src/algorithms/tracking/)
    ops         device kernels (Pallas + XLA)  (ref: volk_gnsssdr SIMD module)
    telemetry   nav-message decoding    (ref: src/algorithms/telemetry_decoder/)
    observables pseudorange/phase       (ref: src/algorithms/observables/)
    pvt         positioning + printers  (ref: src/algorithms/PVT/)
    runtime     receiver orchestration  (ref: src/core/receiver/)
    parallel    mesh/sharding/collectives (no reference analogue; SURVEY §2.14)
    siggen      synthetic signal generator for tests (ref: src/algorithms/signal_generator/)
"""

__version__ = "0.1.0"
