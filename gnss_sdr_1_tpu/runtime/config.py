"""Configuration system: reference-compatible `Block.property=value` files.

Reference parity: ConfigurationInterface with FileConfiguration (INI via
INIReader, section-less keys like `Acquisition_1C.doppler_max=5000`) and
InMemoryConfiguration (the universal test mock) —
src/core/receiver/file_configuration.{h,cc}, in_memory_configuration.{h,cc}.
Reference .conf files parse unchanged; `to_receiver_config` maps the
reference property names onto ReceiverConfig.
"""

from __future__ import annotations

from .receiver import ReceiverConfig


class InMemoryConfiguration:
    """String-keyed property store with typed getters (reference API)."""

    def __init__(self, props: dict[str, str] | None = None):
        self._props: dict[str, str] = dict(props or {})

    def set_property(self, key: str, value) -> None:
        self._props[key] = str(value)

    def property(self, key: str, default):
        """Typed getter: return type follows the default's type."""
        raw = self._props.get(key)
        if raw is None:
            return default
        if isinstance(default, bool):
            return raw.strip().lower() in ("true", "1", "yes", "on")
        if isinstance(default, int):
            return int(float(raw))
        if isinstance(default, float):
            return float(raw)
        return raw

    def keys(self):
        return self._props.keys()

    def items(self):
        return self._props.items()


class FileConfiguration(InMemoryConfiguration):
    """Parse a GNSS-SDR style .conf file: `key=value` lines, `;`/`#`
    comments, optional `[section]` headers (ignored, as in the reference's
    section-less convention)."""

    def __init__(self, path: str):
        super().__init__()
        with open(path, "r", errors="replace") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith((";", "#", "[")):
                    continue
                if "=" not in line:
                    continue
                key, _, value = line.partition("=")
                # strip trailing comments
                for c in (";", "#"):
                    if c in value:
                        value = value.split(c, 1)[0]
                self._props[key.strip()] = value.strip()


_SIGNAL_OF_IMPL = {
    # acquisition/tracking implementation names -> 2-char signal ids
    "GPS_L1_CA": "1C", "GPS_L2_M": "2S", "GPS_L5i": "L5", "GPS_L5": "L5",
    "Galileo_E1": "1B", "Galileo_E5a": "5X",
    "GLONASS_L1_CA": "1G", "GLONASS_L2_CA": "2G",
    "BEIDOU_B1I": "B1", "BEIDOU_B3I": "B3",
}


def _signal_from_impl(impl: str) -> str | None:
    for prefix, sid in _SIGNAL_OF_IMPL.items():
        if impl.startswith(prefix):
            return sid
    return None


def to_receiver_config(conf: InMemoryConfiguration) -> ReceiverConfig:
    """Map reference property names (conf/gnss-sdr_GPS_L1_ishort.conf
    conventions) onto a ReceiverConfig."""
    fs = conf.property("GNSS-SDR.internal_fs_sps",
                       conf.property("GNSS-SDR.internal_fs_hz", 4_000_000.0))
    acq_impl = conf.property("Acquisition_1C.implementation", "")
    signal_id = _signal_from_impl(acq_impl) or "1C"
    sig = f"_{signal_id}"
    n_channels = conf.property(f"Channels{sig}.count",
                               conf.property("Channels.count", 8))
    return ReceiverConfig(
        fs_hz=float(fs),
        signal_id=signal_id,
        n_channels=int(n_channels),
        doppler_max_hz=float(conf.property(f"Acquisition{sig}.doppler_max", 5000.0)),
        doppler_step_hz=float(conf.property(f"Acquisition{sig}.doppler_step", 250.0)),
        acq_threshold=float(conf.property(f"Acquisition{sig}.threshold", 2.0)),
        acq_use_cfar=conf.property(f"Acquisition{sig}.use_CFAR_algorithm", False),
        acq_dwells=int(conf.property(f"Acquisition{sig}.max_dwells", 2)),
        acq_tong=conf.property(
            f"Acquisition{sig}.implementation", "").endswith(
            "Tong_Acquisition"),
        pll_bw_hz=float(conf.property(f"Tracking{sig}.pll_bw_hz", 25.0)),
        dll_bw_hz=float(conf.property(f"Tracking{sig}.dll_bw_hz", 2.0)),
        enable_fll_pull_in=bool(conf.property(f"Tracking{sig}.enable_fll_pull_in", False)),
        # PVT corrections: the reference's PVT.iono_model/trop_model
        # (rtklib_pvt.cc config keys; values Broadcast_Klobuchar/OFF and
        # Saastamoinen/OFF) and PVT.elevation_mask
        iono_model=("off" if str(conf.property("PVT.iono_model",
                    "Broadcast_Klobuchar")).upper() == "OFF" else "broadcast"),
        trop_model=("saastamoinen" if str(conf.property(
            "PVT.trop_model", "OFF")).lower().startswith("saas") else "off"),
        elevation_mask_deg=float(conf.property("PVT.elevation_mask", 5.0)),
    )
