"""Mixed-constellation system test: GPS L1 C/A + Galileo E1B from ONE
capture, tracked by concurrent channel groups with one joint ISB PVT — the
reference's flagship hybrid configuration (gnss_flowgraph.cc:1722
set_signals_list; conf/gnss-sdr_GPS_L1_Galileo_E1_ishort.conf spirit).

Galileo contributes only THREE satellites, so no Galileo-only fix is
possible, and the joint solution must carry the Galileo ISB as a fifth
unknown — the accuracy bar is only reachable if the mixed solver genuinely
fuses both systems (7 observations, 5 unknowns).

Also exercises the multi-band path: GPS L1 + L2C dual-frequency streams of
the same satellites through MultiReceiver (GpsL2ChannelDecoder end-to-end).
"""

import dataclasses

import numpy as np
import pytest

import pytest as _pytest_mark
pytestmark = _pytest_mark.mark.slow

from gnss_sdr_1_tpu.codes import gps_l1ca_code, tracking_replica
from gnss_sdr_1_tpu.constants import GALILEO_E1B, GPS_L1_CA
from gnss_sdr_1_tpu.pvt.geodesy import llh_to_ecef
from gnss_sdr_1_tpu.runtime.config import (InMemoryConfiguration,
                                           to_receiver_configs)
from gnss_sdr_1_tpu.runtime.multi_receiver import MultiReceiver
from gnss_sdr_1_tpu.siggen.generator import generate_baseband
from gnss_sdr_1_tpu.siggen.scenario import build_scenario

FS = 4.0e6
DURATION = 30.0
RX_ECEF = llh_to_ecef(np.radians(41.275), np.radians(1.988), 80.0)


@pytest.fixture(scope="module")
def mixed_run():
    gps_prns = [1, 2, 3, 4]
    gal_prns = [11, 12, 13]
    scen_g = build_scenario(RX_ECEF, gps_prns, t0_tow=345601.25,
                            duration_s=DURATION, cn0_dbhz=47.0,
                            subframe_cycle=(1, 2, 3))
    scen_e = build_scenario(RX_ECEF, gal_prns, t0_tow=345601.25,
                            duration_s=DURATION, cn0_dbhz=48.0,
                            chip_rate=2.046e6, signal="1B")
    # both signals share the 1575.42 MHz band: one baseband stream carries
    # the sum (noise added once)
    from conftest import cached_capture

    def _build():
        x = generate_baseband(
            GPS_L1_CA, scen_g.sats, {p: gps_l1ca_code(p) for p in gps_prns},
            FS, DURATION, noise=True)
        spec_e = dataclasses.replace(
            GALILEO_E1B, code_rate_chips_s=2.046e6,
            code_length_chips=2 * 4092, bit_rate_bps=250.0)
        return x + generate_baseband(
            spec_e, scen_e.sats,
            {p: tracking_replica("1B", p)[0] for p in gal_prns},
            FS, DURATION, noise=False)

    x = cached_capture(f"sysmixed_{FS:.0f}_{DURATION:.0f}_v1", _build)

    conf = InMemoryConfiguration({
        "GNSS-SDR.internal_fs_sps": str(FS),
        "Channels_1C.count": "4",
        "Channels_1B.count": "3",
        "Acquisition_1C.implementation": "GPS_L1_CA_PCPS_Acquisition",
        "Acquisition_1B.implementation":
            "Galileo_E1_PCPS_Ambiguous_Acquisition",
        "Tracking_1C.implementation": "GPS_L1_CA_DLL_PLL_Tracking",
        "Tracking_1B.implementation": "Galileo_E1_DLL_PLL_VEML_Tracking",
    })
    cfgs = to_receiver_configs(conf)
    assert [c.signal_id for c in cfgs] == ["1C", "1B"]
    cfgs[0] = dataclasses.replace(cfgs[0], prn_search=tuple(gps_prns))
    cfgs[1] = dataclasses.replace(cfgs[1], prn_search=tuple(gal_prns),
                                  acq_dwells=3, pll_bw_hz=15.0,
                                  dll_bw_hz=2.0)
    mrx = MultiReceiver(cfgs)
    sols = mrx.process(np.ascontiguousarray(x))
    return scen_g, scen_e, mrx, sols


def test_mixed_joint_fix_at_reference_bar(mixed_run):
    scen_g, scen_e, mrx, sols = mixed_run
    # the Galileo group alone (3 satellites) can never fix
    assert len(mrx.receivers[1].solutions) == 0
    assert len(sols) >= 10, f"only {len(sols)} joint fixes"
    errs = np.stack([s.solution.rx_ecef_m - RX_ECEF for s in sols])
    e3d = np.linalg.norm(errs, axis=1)
    assert np.median(e3d) < 5.0, f"median 3D {np.median(e3d):.2f} m"
    # every fix fused both systems (Galileo enters through the ISB model)
    for s in sols:
        assert set(s.per_system_prns) == {"G", "E"}
        assert len(s.per_system_prns["G"]) >= 3
        assert len(s.per_system_prns["E"]) >= 2


def test_mixed_groups_decode_their_own_ephemeris(mixed_run):
    scen_g, scen_e, mrx, sols = mixed_run
    rx_g, rx_e = mrx.receivers
    assert sum(d.ephemeris_complete for d in rx_g.decoders.values()) >= 3
    assert sum(d.ephemeris_complete for d in rx_e.decoders.values()) >= 2
    for p, d in rx_e.decoders.items():
        if d.ephemeris_complete:
            assert d.ephemeris.sqrt_a == pytest.approx(
                scen_e.ephemerides[p].sqrt_a, abs=2e-5)


def test_dual_band_l1_l2c_joint(tmp_path):
    """GPS L1 + L2C dual-band: the same satellites on two frequencies
    through MultiReceiver's per-group streams — exercises
    GpsL2ChannelDecoder (CNAV) end-to-end through a receiver; the L2
    measurements join the L1 fix (1000*group PRN offsetting keeps both
    bands of one SV contributing)."""
    from gnss_sdr_1_tpu.constants import GPS_L2C

    prns = [1, 2, 3, 4]
    fs2 = 2.046e6       # both bands at 2 samples/chip (L1) / 4 (L2CM)
    dur = 55.0          # CNAV needs the full {10,11,30} 36 s cycle + sync
    scen_1 = build_scenario(RX_ECEF, prns, t0_tow=345601.25, duration_s=dur,
                            cn0_dbhz=47.0, subframe_cycle=(1, 2, 3))
    scen_2 = build_scenario(RX_ECEF, prns, t0_tow=345601.25, duration_s=dur,
                            cn0_dbhz=47.0, signal="2S")
    from conftest import cached_capture

    x1 = cached_capture(
        f"dual_l1_{fs2:.0f}_{dur:.0f}_v1",
        lambda: generate_baseband(
            GPS_L1_CA, scen_1.sats, {p: gps_l1ca_code(p) for p in prns},
            fs2, dur, noise=True))
    codes2 = {p: tracking_replica("2S", p)[0] for p in prns}
    x2 = cached_capture(
        f"dual_l2_{fs2:.0f}_{dur:.0f}_v1",
        lambda: generate_baseband(GPS_L2C, scen_2.sats, codes2, fs2, dur,
                                  noise=True))

    from gnss_sdr_1_tpu.runtime import ReceiverConfig
    # 4 s Hatch windows: the L2 band's code noise (interpolated from the
    # 80 ms capture grid) dominated the joint fix; round-5 A/B:
    # sm=25 -> 6.9 m conv-half median, sm=200 -> 2.8 m, sm=400 -> 2.1 m
    cfg1 = ReceiverConfig(fs_hz=fs2, signal_id="1C", n_channels=4,
                          prn_search=tuple(prns),
                          carrier_smoothing_epochs=200)
    # L2CM: 20 ms coherent acquisition needs a ~1/(2T) Doppler grid (the
    # 1 ms default of 250 Hz nulls most satellites) and the narrow fine
    # step keeps the handoff inside the 4 Hz PLL's pull-in range
    cfg2 = ReceiverConfig(fs_hz=fs2, signal_id="2S", n_channels=4,
                          prn_search=tuple(prns),
                          pll_bw_hz=4.0, dll_bw_hz=0.4,
                          doppler_max_hz=3000.0, doppler_step_hz=50.0,
                          acq_threshold=1.6,
                          doppler_step2_hz=4.0,
                          num_doppler_bins_step2=50,
                          carrier_smoothing_epochs=200)
    mrx = MultiReceiver([cfg1, cfg2])
    sols = mrx.process([x1, x2])
    rx2 = mrx.receivers[1]
    from gnss_sdr_1_tpu.telemetry.channel_adapters import GpsL2ChannelDecoder
    assert all(isinstance(d, GpsL2ChannelDecoder)
               for d in rx2.decoders.values())
    n2 = sum(d.ephemeris_complete for d in rx2.decoders.values())
    assert n2 >= 3, f"only {n2} CNAV ephemerides decoded"
    assert len(sols) >= 10
    errs = np.stack([s.solution.rx_ecef_m - RX_ECEF for s in sols])
    e3d = np.linalg.norm(errs, axis=1)
    # the first epochs settle the per-band clock/ISB estimates; hold the
    # converged half to the reference's 3D bar
    assert np.median(e3d[len(e3d) // 2:]) < 5.0, np.median(e3d)
    assert np.median(e3d) < 20.0
    # L2 band contributed to the joint fixes
    assert any(len(s.per_system_prns.get("G", [])) > 4 for s in sols)
