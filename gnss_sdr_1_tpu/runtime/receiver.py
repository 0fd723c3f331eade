"""Block-synchronous GNSS receiver pipeline.

Reference parity: ControlThread::run (control_thread.cc:239) +
GNSSFlowgraph channel management (gnss_flowgraph.cc:1058-1104): satellite
search list, acquisition -> channel assignment, tracking supervision with
satellite recycling, telemetry/observables/PVT fan-in.  The whole data plane
runs as two jitted device programs (batched PCPS + the tracking scan); the
lifecycle FSM stays host-side between blocks.
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from ..acquire import AcqConfig, PcpsAcquisition
from ..codes import tracking_replica
from ..constants import SIGNALS, SignalSpec, glonass_fdma_offset_hz
from ..observables import ChannelEpochHistory, compute_observables
from ..pvt.solver import PvtSolution, solve_pvt
from ..telemetry.decoder import LnavDecoder
from ..track import TrackConfig, TrackingEngine

log = logging.getLogger("gnss_sdr_1_tpu.receiver")


def _slice_planar(samples_dev, offset, *, length):
    """Jitted on-device segment slicer for preloaded captures (lazy jit so
    importing the module never touches a backend)."""
    import functools

    import jax

    cache = _slice_planar.__dict__
    fn = cache.get("fn")
    if fn is None:
        @functools.partial(jax.jit, static_argnames=("length",))
        def fn(s, o, *, length):
            return jax.lax.dynamic_slice(s, (o, 0), (length, 2))
        cache["fn"] = fn
    return fn(samples_dev, offset, length=length)


@dataclasses.dataclass
class ReceiverConfig:
    fs_hz: float = 4_000_000.0
    signal_id: str = "1C"
    n_channels: int = 8
    prn_search: tuple[int, ...] = tuple(range(1, 33))
    # acquisition
    doppler_max_hz: float = 5000.0
    doppler_step_hz: float = 250.0
    acq_threshold: float = 2.0
    acq_use_cfar: bool = False
    acq_dwells: int = 2
    acq_two_steps: bool = True
    # straddle code-boundary sign flips (nav bits; BeiDou NH20 flips every
    # code period — this is the reference's bit_transition_flag cure,
    # pcps_acquisition.cc set_local_code :239-273)
    acq_bit_transition: bool = False
    acq_tong: bool = False           # Tong sequential detector
    tong_init: int = 2
    tong_max: int = 10
    # acquisition strategy from the conf implementation= name, routed
    # through runtime.factory (gnss_block_factory.cc:1552-1709):
    # pcps | tong | assisted | quicksync | cccwsr | fine_doppler | 8ms | caf
    acq_strategy: str = "pcps"
    # tracking engine from Tracking_XX.implementation: dll_pll | kf
    # (GPS_L1_CA_KF_Tracking -> track.kf.KfTrackingEngine)
    track_engine: str = "dll_pll"
    doppler_step2_hz: float = 40.0
    num_doppler_bins_step2: int = 10
    # tracking
    pll_bw_hz: float = 25.0
    dll_bw_hz: float = 2.0
    pll_bw_narrow_hz: float = 12.0
    dll_bw_narrow_hz: float = 0.75
    # states 3/4: coherent extension once telemetry reports bit sync
    # (dll_pll_veml_tracking.cc:1774-1900); 0 disables the switch
    extend_correlation_symbols: int = 20
    enable_fll_pull_in: bool = False
    pull_in_time_s: float = 0.3
    early_late_space_chips: float = 0.5
    very_early_late_space_chips: float = 0.6
    # correlator strategy (Tracking_XX.correlator conf key): 'auto' picks
    # the fused Pallas chain on TPU and the exact gather path on CPU
    # (PERF.md: per-sample gathers serialize on TPU; the chunked paths are
    # the fast ones there)
    correlator: str = "auto"     # auto | gather | fft | mxu | pallas
    # per-channel satellite pinning (ChannelN.satellite=PRN, read by the
    # reference flowgraph at gnss_flowgraph.cc:1076-1090); None = dynamic
    channel_satellites: tuple = ()
    # GLONASS FDMA: ((slot, k), ...) frequency-channel numbers, k in [-7,6]
    # (the reference reads them from Channel.satellite + almanac,
    # glonass_l1_signal_processing / pcps_acquisition.cc:277-283)
    fdma_k: tuple = ()
    # pipeline
    block_ms: int = 40
    obs_interval_ms: int = 20
    # PVT.output_rate_ms (rtklib_pvt_gs output cadence): solve at this
    # rate while observables keep forming at obs_interval_ms; 0 -> solve
    # at every observables tick
    pvt_output_rate_ms: int = 0
    reacq_interval_blocks: int = 25
    # PVT corrections (PVT.iono_model / PVT.trop_model / PVT.elevation_mask
    # in the reference's conf files, applied via rtklib_pntpos)
    iono_model: str = "broadcast"    # 'off' | 'broadcast' (Klobuchar)
    trop_model: str = "off"          # 'off' | 'saastamoinen' (synthetic
    #   captures carry no troposphere; real-capture confs enable it via
    #   PVT.trop_model=Saastamoinen)
    elevation_mask_deg: float = 5.0
    pvt_weighted: bool = True
    # Hatch carrier-smoothing window in observable epochs (0 disables) —
    # Observables.enable_carrier_smoothing / smoothing_factor in the
    # reference's observables block
    carrier_smoothing_epochs: int = 25
    # chi-square residual validation + single-satellite fault exclusion
    # (rtklib_pntpos.cc valsol :660 / raim_fde :699)
    raim: bool = True
    raim_sigma_m: float = 2.5
    # PVT.positioning_mode (pvt_conf): Single is the built-in chain;
    # DGNSS/Static/Kinematic engage pvt.rtk.solve_baseline when base-station
    # observables are supplied (CLI --base_obs / library use)
    positioning_mode: str = "Single"
    # monitoring taps (GNSS-SDR.enable_monitor + Monitor.* props;
    # gnss_flowgraph.cc:680 monitor wiring, gnss_synchro_monitor decimation)
    enable_monitor: bool = False
    monitor_host: str = "127.0.0.1"
    monitor_port: int = 1234
    monitor_decimation: int = 50
    enable_pvt_monitor: bool = False
    pvt_monitor_port: int = 1111
    # telemetry watchdog: release a channel after this many symbols without
    # a decoded TOW (the reference drops after d_max_symbols_without_valid_
    # frame, gps_l1_ca_telemetry_decoder_gs.cc:364); 0 disables
    watchdog_symbols: int = 45000
    # symbol-grid compact capture readback (engine._pack_outputs_symbol):
    # once every active channel is bit-synced the device reduces prompts to
    # the symbol grid before readback (~10x less d2h — the reference's
    # one-Gnss_Synchro-per-integration cadence, gnss_synchro.h:44-81).
    # 'auto' enables it for signals whose symbol is carried directly on the
    # unwiped prompt (GPS L1 C/A); 'off' forces full-rate readback
    symbol_readback: str = "auto"

    @property
    def spec(self) -> SignalSpec:
        return SIGNALS[self.signal_id]


class Receiver:
    """Single-constellation single-band receiver (GPS L1 C/A first)."""

    def __init__(self, cfg: ReceiverConfig):
        self.cfg = cfg
        spec = cfg.spec
        fs = cfg.fs_hz
        self.samples_per_code = int(round(fs * spec.code_period_s))
        # replica carries any BOC subcarrier (Galileo E1 -> sinBOC(1,1))
        replicas = {p: tracking_replica(cfg.signal_id, p) for p in cfg.prn_search}
        self._codes = {p: r[0] for p, r in replicas.items()}
        virtual_rate, spc_code = next(iter(replicas.values()))[1:]
        is_veml = cfg.signal_id == "1B"

        # FDMA slot carrier offsets (GLONASS): per-PRN replica modulation in
        # acquisition + per-channel NCO bias in tracking
        self._fdma_offsets = {
            prn: glonass_fdma_offset_hz(cfg.signal_id, k)
            for prn, k in dict(cfg.fdma_k).items()
        } if cfg.fdma_k else {}
        # FDMA offsets that are a non-integer number of carrier cycles per
        # one-period window leave a phase jump at the circular-correlation
        # wrap (k*562.5 kHz * 1 ms = k*562.5 cycles: half-integer for odd
        # k), splitting the peak into +-500 Hz sidebands.  The two-period
        # bit_transition window keeps every kept lag wrap-free, so force it
        # (the reference searches the shifted band directly and pays the
        # same doubled window via bit_transition_flag for GLONASS confs).
        acq_bit_transition = cfg.acq_bit_transition
        if any(abs(f) % (fs / self.samples_per_code) > 1e-6
               for f in self._fdma_offsets.values()):
            acq_bit_transition = True
        # signals whose sign can flip at EVERY code-period boundary — a
        # per-period secondary code (B1I/B3I NH20, L5I NH10, E5a-I CS20) or
        # a symbol as short as the code (E1B 4 ms, L2CM 20 ms) — smear the
        # one-period correlation; the reference's cure is the same flag
        # (pcps_acquisition.cc set_local_code :239-273)
        if (spec.secondary_code_length > 0
                or spec.chips_per_symbol <= spec.code_length_chips):
            acq_bit_transition = True
        acq_cfg = AcqConfig(
            fs_hz=fs,
            samples_per_code=self.samples_per_code,
            samples_per_chip=max(1, int(round(fs / spec.code_rate_chips_s))),
            doppler_max_hz=cfg.doppler_max_hz,
            doppler_step_hz=cfg.doppler_step_hz,
            max_dwells=cfg.acq_dwells,
            bit_transition_flag=acq_bit_transition,
            use_cfar=cfg.acq_use_cfar,
            threshold=cfg.acq_threshold,
            make_two_steps=cfg.acq_two_steps,
            doppler_step2_hz=cfg.doppler_step2_hz,
            num_doppler_bins_step2=cfg.num_doppler_bins_step2,
        )
        fs_code_rate = (virtual_rate, spec.code_length_chips * spc_code)
        self._acq_cfg = acq_cfg
        self._fs_code_rate = fs_code_rate
        self._assist_acq = None
        self.acq = PcpsAcquisition(
            acq_cfg, self._codes, fs_code_rate=fs_code_rate,
            freq_offsets_by_prn=self._fdma_offsets,
        )
        # acquisition strategy dispatch (conf implementation= names routed
        # through runtime.factory; gnss_block_factory.cc:1552-1709)
        strat = cfg.acq_strategy
        if cfg.acq_tong and strat == "pcps":
            strat = "tong"
        self.acq_strategy = strat
        self._acq_tong = strat == "tong"
        if strat in ("cccwsr", "8ms", "caf"):
            from ..codes.sampling import resample_code
            sampled = {p: resample_code(
                np.asarray(self._codes[p], dtype=np.float32), fs,
                virtual_rate, self.samples_per_code)
                for p in cfg.prn_search}
        if strat == "fine_doppler":
            from ..acquire import FineDopplerAcquisition
            self.acq = FineDopplerAcquisition(self.acq)
        elif strat == "quicksync":
            from ..acquire import QuickSyncAcquisition
            self.acq = QuickSyncAcquisition(
                acq_cfg, self._codes, folding_factor=2,
                fs_code_rate=fs_code_rate)
        elif strat == "cccwsr":
            if cfg.signal_id != "1B":
                raise ValueError("CCCWSR acquisition is a Galileo E1 "
                                 "strategy (data+pilot CBOC components)")
            from ..acquire import CccwsrAcquisition
            from ..codes import galileo_e1_sinboc11, galileo_e1c_code
            pilots = {p: resample_code(
                galileo_e1_sinboc11(galileo_e1c_code(p)), fs,
                virtual_rate, self.samples_per_code)
                for p in cfg.prn_search}
            self.acq = CccwsrAcquisition(acq_cfg, sampled, pilots)
        elif strat == "8ms":
            if cfg.signal_id != "1B":
                raise ValueError("8ms acquisition is a Galileo E1 strategy")
            from ..acquire import Pcps8msAcquisition
            import dataclasses as _dc
            self.acq = Pcps8msAcquisition(
                _dc.replace(acq_cfg, sampled_ms=2), sampled)
        elif strat == "caf":
            if cfg.signal_id != "5X":
                raise ValueError("noncoherent-IQ CAF acquisition is a "
                                 "Galileo E5a strategy")
            from ..acquire import CafAcquisition
            from ..codes.galileo_e5 import galileo_e5aq_code
            from ..codes.sampling import resample_code as _rs
            pilots = {p: _rs(
                np.asarray(galileo_e5aq_code(p), dtype=np.float32), fs,
                10.23e6, self.samples_per_code) for p in cfg.prn_search}
            self.acq = CafAcquisition(
                acq_cfg, sampled, pilots,
                caf_window_hz=8.0 * cfg.doppler_step_hz)
        elif strat not in ("pcps", "tong", "assisted"):
            raise ValueError(f"unknown acquisition strategy '{strat}'")
        # bit / secondary-code period in epochs — the coherent-extension
        # alignment grid (20 ms GPS bit, NH20, CS20; NH10 on L5)
        self._sec_period = {
            "1C": 20, "B1": 20, "B3": 20, "5X": 20, "L5": 10}.get(
                cfg.signal_id)
        # in-loop secondary wipe-off tables (dll_pll_veml_tracking.cc:549-660
        # start_tracking secondary setup): NH20 for BeiDou B1I/B3I D1, CS20
        # for Galileo E5a-I, NH10 for GPS L5I — all data-carrying, so the
        # Costas discriminator stays active (sec_data)
        sec_codes = None
        sec_data = False
        if cfg.signal_id in ("B1", "B3"):
            from ..telemetry.channel_adapters import BeidouChannelDecoder
            sec_codes = np.tile(BeidouChannelDecoder._NH_AMP.astype(
                np.float32), (len(self.acq.prns), 1))
            sec_data = True
        elif cfg.signal_id == "5X":
            from ..codes.galileo_e5 import galileo_e5ai_secondary
            sec_codes = np.tile(np.asarray(
                galileo_e5ai_secondary(), dtype=np.float32),
                (len(self.acq.prns), 1))
            sec_data = True
        elif cfg.signal_id == "L5":
            from ..codes.gps_l5 import NH10
            sec_codes = np.tile(np.asarray(NH10, dtype=np.float32),
                                (len(self.acq.prns), 1))
            sec_data = True
        # correlator strategy: 'auto' -> fused Pallas chain on TPU, exact
        # gather on CPU (Tracking_XX.correlator conf key)
        correlator = cfg.correlator
        if correlator == "auto":
            import jax

            correlator = "pallas" if jax.default_backend() == "tpu" \
                else "gather"
        self.correlator = correlator
        # tracking engine selection (Tracking_XX.implementation routed
        # through runtime.factory): GPS_L1_CA_KF_Tracking -> the Kalman
        # carrier tracker (gps_l1_ca_kf_tracking_cc.h:76 — a drop-in
        # channel tracking implementation producing the same outputs)
        self.trk_kind = cfg.track_engine
        if cfg.track_engine == "kf":
            from ..track.kf import KfTrackConfig, KfTrackingEngine

            # BOC signals (Galileo E1 sinBOC) run the KF in the VIRTUAL
            # chip basis: the replica is 1 sample per half-chip at
            # virtual_rate, so code_length/chip_rate scale by spc_code and
            # the epoch duration is unchanged (round-5: lifts the r4
            # "GPS L1-class only" restriction, Weak #7)
            self.trk = KfTrackingEngine(
                KfTrackConfig(
                    fs_hz=fs,
                    code_length_chips=spec.code_length_chips * spc_code,
                    chip_rate_chips_s=virtual_rate,
                    carrier_freq_hz=spec.carrier_freq_hz,
                    n_channels=cfg.n_channels,
                    dll_bw_hz=cfg.dll_bw_hz,
                    early_late_space_chips=(
                        cfg.early_late_space_chips * spc_code),
                ),
                np.stack([self._codes[p] for p in self.acq.prns]),
            )
        elif cfg.track_engine != "dll_pll":
            raise ValueError(
                f"unknown tracking engine '{cfg.track_engine}'")
        else:
            self.trk = TrackingEngine(
                TrackConfig(
                    fs_hz=fs,
                    code_length_chips=spec.code_length_chips,
                    chip_rate_chips_s=spec.code_rate_chips_s,
                    carrier_freq_hz=spec.carrier_freq_hz,
                    n_channels=cfg.n_channels,
                    code_samples_per_chip=spc_code,
                    veml=is_veml,
                    pll_bw_hz=cfg.pll_bw_hz,
                    dll_bw_hz=cfg.dll_bw_hz,
                    pll_bw_narrow_hz=cfg.pll_bw_narrow_hz,
                    dll_bw_narrow_hz=cfg.dll_bw_narrow_hz,
                    extend_correlation_symbols=max(1, min(
                        cfg.extend_correlation_symbols,
                        self._sec_period or 10**9)),
                    enable_fll_pull_in=cfg.enable_fll_pull_in,
                    pull_in_time_s=cfg.pull_in_time_s,
                    correlator=correlator,
                    early_late_space_chips=(
                        0.15 if is_veml else cfg.early_late_space_chips),
                    very_early_late_space_chips=cfg.very_early_late_space_chips,
                    sec_data=sec_data,
                ),
                np.stack([self._codes[p] for p in self.acq.prns]),
                sec_codes=sec_codes,
            )
        self._slot_of_prn = {p: i for i, p in enumerate(self.acq.prns)}

        self.state = self.trk.init_state()
        self.channel_prn: list[int | None] = [None] * cfg.n_channels
        # host shadow of state.mode (host-written only; see _maybe_extend)
        self._mode_host = np.zeros(cfg.n_channels, dtype=np.int32)
        # consecutive acquisitions that assigned nothing while channels
        # were idle (caps the pull-in segment gating when channels
        # outnumber visible satellites); any channel release resets it
        self._empty_acq_streak = 0
        self.decoders: dict[int, LnavDecoder] = {}
        self.histories: dict[int, ChannelEpochHistory] = {}
        self.sym_count: dict[int, int] = {}
        self.last_rem: dict[int, float] = {}
        self.last_frac: dict[int, float] = {}
        self.carrier_phase_acc: dict[int, float] = {}
        self.last_carr_rem: dict[int, float] = {}
        self._ledger_prev_start: dict[int, float] = {}
        self.rx_tow_s: float | None = None
        self.rx_tow_sample: int | None = None
        self.solutions: list[PvtSolution] = []
        self.obs_epochs: list[tuple[float, dict]] = []
        self._pos = 0          # absolute sample index of next block start
        self._blocks_done = 0
        self._next_obs_sample = None
        self._no_tow_syms: dict[int, int] = {}
        self.watchdog_trips = 0
        self._acq_info: dict[int, tuple] = {}
        self._standby = False
        # symbol-readback carry: prn -> [sum_of_means, pending_epochs,
        # phase_in_symbol, start_of_first_pending] (see _harvest_symbols)
        self._sym_carry: dict[int, list] = {}
        self._smoother = None
        if cfg.carrier_smoothing_epochs > 0:
            from ..constants import SPEED_OF_LIGHT_M_S as _c
            from ..observables import CarrierSmoother

            self._smoother = CarrierSmoother(
                window=cfg.carrier_smoothing_epochs,
                wavelength_m=_c / spec.carrier_freq_hz)
        self.monitor = None
        self.pvt_monitor = None
        if cfg.enable_monitor:
            from .monitor import UdpSink

            self.monitor = UdpSink(cfg.monitor_host, cfg.monitor_port,
                                   decimation=1)
        if cfg.enable_pvt_monitor:
            from .monitor import UdpSink

            self.pvt_monitor = UdpSink(cfg.monitor_host, cfg.pvt_monitor_port)

    # ---------------- channel lifecycle ----------------

    def set_assistance(self, ephemerides: dict, rx_ecef, tow_s: float,
                       window_hz: float = 600.0) -> int:
        """A-GNSS: predicted per-satellite Doppler windows gate acquisition
        (control_thread.cc:566 assist_GNSS -> pcps_assisted_acquisition):
        a peak outside [pred - window, pred + window] is rejected as a
        sideband/false alarm, and satellites predicted below the horizon
        are skipped entirely.  Returns the number of visible predictions."""
        from .assistance import predict_visible

        self._assist = predict_visible(
            ephemerides, np.asarray(rx_ecef, dtype=np.float64), tow_s,
            carrier_freq_hz=self.cfg.spec.carrier_freq_hz)
        self._assist_window_hz = float(window_hz)
        self._assist_prns = set(self._assist)
        # NARROWED search grid (pcps_assisted_acquisition_cc.cc:188
        # get_assistance -> d_doppler_min/max, applied BEFORE the search):
        # each visible PRN's predicted Doppler folds into its stored
        # replica (the FDMA slot-offset mechanism), so one batched
        # [+-window] grid searches every satellite's own band — the FFT
        # count drops by doppler_max/window vs the cold grid
        vis = sorted(p for p in self._assist if p in self._codes)
        if vis and self.acq_strategy in ("pcps", "assisted"):
            import dataclasses as _dc

            # predicted offsets are generally a non-integer number of
            # carrier cycles per window: the two-period bit_transition
            # window keeps every kept lag wrap-free (same cure as the
            # FDMA slot offsets, see __init__)
            narrow = _dc.replace(
                self._acq_cfg,
                doppler_max_hz=max(window_hz,
                                   2.0 * self._acq_cfg.doppler_step_hz),
                bit_transition_flag=True)
            self._assist_acq = PcpsAcquisition(
                narrow, {p: self._codes[p] for p in vis},
                fs_code_rate=self._fs_code_rate,
                freq_offsets_by_prn={
                    p: self._fdma_offsets.get(p, 0.0)
                    + self._assist[p]["doppler_hz"] for p in vis})
        return len(self._assist)

    def _acquire_and_assign(self, samples_abs_offset: int, samples: np.ndarray) -> None:
        """Run acquisition on idle PRNs, assign positives to idle channels
        (gnss_flowgraph.cc apply_action satellite recycling analogue)."""
        idle_channels = [c for c, p in enumerate(self.channel_prn) if p is None]
        if not idle_channels:
            return
        assigned: list[tuple[int, int]] = []
        assist = getattr(self, "_assist", None)
        acq_prog = self._assist_acq if self._assist_acq is not None else self.acq
        if self._acq_tong:
            res = self.acq.acquire_tong(
                samples, tong_init=self.cfg.tong_init,
                tong_max=self.cfg.tong_max,
                samplestamp=samples_abs_offset)
            acq_prog = self.acq
        else:
            res = acq_prog.acquire(samples, samplestamp=samples_abs_offset)
        assisted_grid = acq_prog is self._assist_acq
        tracked = {p for p in self.channel_prn if p is not None}
        pins = self.cfg.channel_satellites
        order = np.argsort(-res.test_stat)
        dops = np.array(res.doppler_hz, dtype=np.float64)
        if assisted_grid:
            # assisted grid reports the residual vs the predicted Doppler
            dops = dops + np.array(
                [assist[p]["doppler_hz"] for p in acq_prog.prns])
        for k in order:
            prn = acq_prog.prns[k]
            if not res.positive[k] or prn in tracked:
                continue
            if assist is not None and not assisted_grid:
                pred = assist.get(prn)
                if pred is None:
                    continue          # predicted below the horizon
                if abs(dops[k] - pred["doppler_hz"]) > \
                        self._assist_window_hz:
                    log.info("PRN %d acq doppler %.0f outside assisted "
                             "window around %.0f — rejected", prn,
                             dops[k], pred["doppler_hz"])
                    continue
            if not idle_channels:
                break
            # pinned channels only accept their satellite, and get it
            # preferentially (ChannelN.satellite, gnss_flowgraph.cc:1076-1090)
            ch = next((c for c in idle_channels
                       if c < len(pins) and pins[c] == prn), None)
            if ch is None:
                ch = next((c for c in idle_channels
                           if c >= len(pins) or pins[c] is None), None)
            if ch is None:
                continue
            idle_channels.remove(ch)
            self.channel_prn[ch] = prn
            if self.trk_kind == "kf":
                # the KF seeds its Doppler prior from the acq grid step
                # (gps_l1_ca_kf_tracking_cc.cc:276-279)
                self.state = self.trk.activate_channel(
                    self.state, ch, self._slot_of_prn[prn],
                    float(res.delay_samples[k]), float(dops[k]),
                    samples_abs_offset, self._pos,
                    doppler_step_hz=self.cfg.doppler_step_hz,
                )
            else:
                self.state = self.trk.activate_channel(
                    self.state, ch, self._slot_of_prn[prn],
                    float(res.delay_samples[k]), float(dops[k]),
                    samples_abs_offset, self._pos,
                    carr_offset_hz=self._fdma_offsets.get(prn, 0.0),
                )
            # telemetry decoders per signal: LNAV (1C), I/NAV (1B);
            # CNAV/GNAV/DNAV channel wrappers follow the same interface
            if self.cfg.signal_id == "1C":
                self.decoders[prn] = LnavDecoder(prn)
            elif self.cfg.signal_id == "1B":
                from ..telemetry.channel_adapters import GalileoChannelDecoder

                self.decoders[prn] = GalileoChannelDecoder(prn)
            elif self.cfg.signal_id == "5X":
                from ..telemetry.channel_adapters import (
                    GalileoE5aChannelDecoder)

                self.decoders[prn] = GalileoE5aChannelDecoder(prn)
            elif self.cfg.signal_id in ("1G", "2G"):
                from ..telemetry.channel_adapters import GlonassChannelDecoder

                self.decoders[prn] = GlonassChannelDecoder(prn)
            elif self.cfg.signal_id in ("B1", "B3"):
                from ..telemetry.channel_adapters import BeidouChannelDecoder

                self.decoders[prn] = BeidouChannelDecoder(prn)
            elif self.cfg.signal_id == "2S":
                from ..telemetry.channel_adapters import GpsL2ChannelDecoder

                self.decoders[prn] = GpsL2ChannelDecoder(prn)
            elif self.cfg.signal_id == "L5":
                from ..telemetry.channel_adapters import GpsL5ChannelDecoder

                self.decoders[prn] = GpsL5ChannelDecoder(prn)
            self._mode_host[ch] = 0
            self.histories[prn] = ChannelEpochHistory()
            self.sym_count[prn] = 0
            assigned.append((ch, prn))
            self.carrier_phase_acc.pop(prn, None)
            self.last_carr_rem.pop(prn, None)
            self._ledger_prev_start.pop(prn, None)
            self._no_tow_syms[prn] = 0
            self._acq_info[prn] = (float(res.delay_samples[k]),
                                   float(dops[k]),
                                   int(res.samplestamp))
            log.info("ch %d <- PRN %d (delay %.1f, doppler %.0f, stat %.1f)",
                     ch, prn, res.delay_samples[k], dops[k],
                     res.test_stat[k])
        if assigned:
            self._empty_acq_streak = 0
            # fractional code phase at each new channel's first epoch start
            # (sub-sample pseudorange resolution in the observables) — ONE
            # device readback for the whole batch, not one per channel (the
            # dev tunnel charges ~27 ms latency per transfer)
            rems = np.asarray(self.state.rem_code_phase_samples)
            for ch, prn in assigned:
                self.last_rem[prn] = float(rems[ch])
                self.last_frac[prn] = self.last_rem[prn]
        else:
            self._empty_acq_streak += 1

    def _harvest(self, outs, block_offset_abs: int, decim: int = 1) -> None:
        """Stream tracking epochs into telemetry decoders + histories.

        `decim` > 1: the loop-state fields (rem_carr/doppler/cn0) of `outs`
        are exact only at epochs k % decim == decim-1 (the capture path's
        compact packing, engine.capture_decim); prompts/starts stay
        full-rate for telemetry, and observables history points land on
        the decimated grid (decim * 1 ms spacing, well inside the 20 ms
        interpolation gate of A.10)."""
        from ..utils.planar import from_planar_np

        valid = np.asarray(outs.valid)            # [E, C]
        starts = np.asarray(outs.start)
        corr = from_planar_np(np.asarray(outs.correlators))   # [E, C, K]
        dops = np.asarray(outs.carrier_doppler_hz)
        lens = np.asarray(outs.cur_len)
        cn0s = np.asarray(outs.cn0_dbhz)
        active = np.asarray(outs.active)
        p_idx = getattr(self.trk.cfg, "prompt_index", 1)
        for ch, prn in enumerate(self.channel_prn):
            if prn is None:
                continue
            v = valid[:, ch]
            if not v.any():
                if not bool(active[-1, ch]):
                    log.info("ch %d PRN %d lost lock — releasing", ch, prn)
                    self.channel_prn[ch] = None
                    self._empty_acq_streak = 0
                continue
            # leaving symbol mode: complete the decoder's epoch stream first
            if self._sym_carry.get(prn, (0.0, 0))[1]:
                self._flush_sym_carry(prn)
            prompts = corr[v, ch, p_idx]
            ep_starts = starts[v, ch] + block_offset_abs
            ep_dops = dops[v, ch]
            # code-period boundary = integer start + fractional code phase
            # AT that start (the device outputs rem at the NEXT start, so
            # shift by one epoch, carrying across segments).
            #
            # The device wraps rem into [0,1) and realizes the floor in the
            # NEXT epoch length (A.6), so at each rollover exactly one epoch
            # pairs a wrapped rem with a start that hasn't absorbed the wrap
            # yet — a ±1-sample (≈75 m) pseudorange spike.  Reconstruct the
            # pre-floor fraction: frac_j = rem_j − round(rem_j − rem_{j−1})
            # (the true drift is ≪ 0.5 sample/epoch), which pairs exactly
            # with start_{j+1}.
            rems_next = np.asarray(
                outs.rem_code_phase_samples, dtype=np.float64)[v, ch]
            prev_rem = self.last_rem.get(prn, float(rems_next[0]))
            ext = np.concatenate([[prev_rem], rems_next])
            fracs = ext[1:] - np.round(np.diff(ext))
            rems_at = np.concatenate(
                [[self.last_frac.get(prn, prev_rem)], fracs[:-1]])
            if len(rems_next):
                self.last_rem[prn] = float(rems_next[-1])
                self.last_frac[prn] = float(fracs[-1])
            dec = self.decoders.get(prn)
            base_sym = self.sym_count[prn]
            # accumulated carrier phase = the device NCO ledger unwrapped in
            # host float64 (gnss_synchro.h:61-80 Carrier_phase_rads): the
            # Doppler x epoch-length product supplies the integer cycles,
            # and the device's wrapped rem_carr_phase_rad output pins the
            # fractional phase exactly to the NCO recursion — the phase the
            # correlator actually applied, not a host re-integration
            ep_lens = lens[v, ch].astype(np.float64)
            rems_carr = np.asarray(
                outs.rem_carr_phase_rad, dtype=np.float64)[v, ch]
            ep_cn0 = cn0s[v, ch]
            nv = len(prompts)
            if decim <= 1:
                acc0 = self.carrier_phase_acc.get(prn, 0.0)
                prev_carr = self.last_carr_rem.get(
                    prn, float(rems_carr[0]) if len(rems_carr) else 0.0)
                # step applied between consecutive ledger values covers the
                # NEXT epoch (engine A.6 note): pair dopp_k with len_{k+1}
                lens_next = np.concatenate(
                    [ep_lens[1:], ep_lens[-1:]]) if len(ep_lens) else ep_lens
                est = (2.0 * np.pi * ep_dops.astype(np.float64)
                       * lens_next / self.cfg.fs_hz)
                prevs = np.concatenate(
                    [[prev_carr], rems_carr[:-1]]) if len(rems_carr) \
                    else rems_carr
                resid = rems_carr - prevs - est
                deltas = est + (np.mod(resid + np.pi, 2.0 * np.pi) - np.pi)
                acc_series = acc0 + np.cumsum(deltas)
                if len(acc_series):
                    self.carrier_phase_acc[prn] = float(acc_series[-1])
                    self.last_carr_rem[prn] = float(rems_carr[-1])
                if dec is not None:
                    dec.push(prompts.real, ep_starts)
                    hist = self.histories[prn]
                    for k in range(nv):
                        tow = dec.tow_at_symbol(base_sym + k)
                        if tow is not None:
                            hist.push(
                                float(ep_starts[k]) + float(rems_at[k]),
                                tow, float(ep_dops[k]),
                                float(acc_series[k]), float(ep_cn0[k]))
            else:
                # decimated grid: history/ledger points at valid epochs
                # m = decim, 2*decim, ... whose entering state is exact at
                # upsampled index m-1 ((m-1) % decim == decim-1); `valid`
                # is a prefix per segment (start strictly increases), so
                # valid-sequence indices == buffer indices
                D = decim
                push_m = np.arange(D, nv, D)
                acc = self.carrier_phase_acc.get(prn, 0.0)
                prev_carr = self.last_carr_rem.get(prn)
                prev_s = self._ledger_prev_start.get(prn)
                acc_series = np.zeros(len(push_m))
                for j, m in enumerate(push_m):
                    carr_m = float(rems_carr[m - 1])
                    dop_m = float(ep_dops[m - 1])
                    s_m = float(ep_starts[m])
                    if prev_s is not None and prev_carr is not None:
                        est = (2.0 * np.pi * dop_m * (s_m - prev_s)
                               / self.cfg.fs_hz)
                        resid = carr_m - prev_carr - est
                        acc += est + (np.mod(resid + np.pi, 2.0 * np.pi)
                                      - np.pi)
                    prev_s, prev_carr = s_m, carr_m
                    acc_series[j] = acc
                self.carrier_phase_acc[prn] = acc
                if prev_carr is not None:
                    self.last_carr_rem[prn] = prev_carr
                if prev_s is not None:
                    self._ledger_prev_start[prn] = prev_s
                if dec is not None:
                    dec.push(prompts.real, ep_starts)
                    hist = self.histories[prn]
                    for j, m in enumerate(push_m):
                        tow = dec.tow_at_symbol(base_sym + int(m))
                        if tow is not None:
                            hist.push(
                                float(ep_starts[m]) + float(rems_at[m]),
                                tow, float(ep_dops[m - 1]),
                                float(acc_series[j]),
                                float(ep_cn0[m - 1]))
                # monitor display series (held between grid points)
                if len(push_m):
                    idx = np.minimum(np.searchsorted(
                        push_m, np.arange(nv), side="right"),
                        len(push_m) - 1)
                    acc_series = acc_series[idx]
                else:
                    acc_series = np.zeros(nv)
            self.sym_count[prn] = base_sym + len(prompts)
            # telemetry watchdog: no decoded TOW for watchdog_symbols
            # epochs -> recycle the satellite (the reference's telemetry
            # timeout, gps_l1_ca_telemetry_decoder_gs.cc:364)
            wd = self.cfg.watchdog_symbols
            if dec is not None and wd > 0:
                if dec.tow_at_symbol(self.sym_count[prn] - 1) is None:
                    self._no_tow_syms[prn] = (
                        self._no_tow_syms.get(prn, 0) + len(prompts))
                    if self._no_tow_syms[prn] > wd:
                        log.info("ch %d PRN %d telemetry watchdog "
                                 "(%d symbols, no frame) — releasing",
                                 ch, prn, self._no_tow_syms[prn])
                        self.state = self.trk.deactivate_channel(
                            self.state, ch)
                        self.channel_prn[ch] = None
                        self._empty_acq_streak = 0
                        self._no_tow_syms[prn] = 0
                        self.watchdog_trips += 1
                        continue
                else:
                    self._no_tow_syms[prn] = 0
            if self.monitor is not None and len(prompts):
                self._monitor_tap(ch, prn, prompts, ep_starts, ep_dops,
                                  ep_cn0, acc_series)
            if not bool(active[-1, ch]):
                log.info("ch %d PRN %d lost lock — releasing", ch, prn)
                self.channel_prn[ch] = None
                self._empty_acq_streak = 0

    # ---------------- symbol-grid harvest (compact readback) ----------

    def _pull_in_done(self) -> bool:
        """True once every active channel is through pull-in — the
        steady-state criterion that lets the capture loop use its full
        amortization window.  Signals whose decoder reports bit/secondary
        sync (1C bit sync; B1/5X/L5 secondary sync) use that; decoders
        without a sync notion (symbol == epoch: 1B, 2S, GLONASS) count as
        pulled in after one second of surviving epochs."""
        any_active = False
        for prn in self.channel_prn:
            if prn is None:
                continue
            any_active = True
            dec = self.decoders.get(prn)
            if dec is None:
                return False
            if hasattr(dec, "bit_offset") or hasattr(dec, "sec_sync_offset"):
                if getattr(dec, "bit_offset", None) is None \
                        and getattr(dec, "sec_sync_offset", None) is None:
                    return False
            elif self.sym_count.get(prn, 0) < 1000:
                return False
        return any_active

    def _symbol_offsets(self):
        """Per-channel symbol-boundary offsets (in [1, N]) for the compact
        capture readback, or None when any active channel can't run on the
        symbol grid yet (no bit sync, unsupported signal, KF engine, or
        monitor tap wanting per-epoch series)."""
        cfg = self.cfg
        if (cfg.symbol_readback != "auto" or self.trk_kind != "dll_pll"
                or cfg.signal_id != "1C" or self.monitor is not None):
            return None
        N = self._sec_period
        if not N:
            return None
        offs = np.full(cfg.n_channels, N, dtype=np.int32)
        any_active = False
        for ch, prn in enumerate(self.channel_prn):
            if prn is None:
                continue
            any_active = True
            dec = self.decoders.get(prn)
            bit0 = getattr(dec, "bit_offset", None) if dec else None
            if bit0 is None:
                return None
            offs[ch] = ((bit0 - self.sym_count[prn] - 1) % N) + 1
        return offs if any_active else None

    def _flush_sym_carry(self, prn) -> None:
        """Emit a pending partial symbol before leaving symbol mode so the
        decoder's epoch indexing stays gap-free."""
        carry = self._sym_carry.get(prn)
        if not carry or carry[1] == 0:
            return
        dec = self.decoders.get(prn)
        if dec is not None:
            pend = carry[1]
            vals = np.full(pend, carry[0])
            st0 = int(carry[3] if carry[3] is not None else 0)
            sts = st0 + np.arange(pend, dtype=np.int64) * self.trk._t0_int
            dec.push(vals, sts)
        self._sym_carry[prn] = [0.0, 0, carry[2], None]

    def _harvest_symbols(self, souts, block_offset_abs: int,
                         sym_off) -> None:
        """Harvest a SymbolOutputs segment (engine._pack_outputs_symbol).

        Decoders receive one synthesized epoch batch per completed symbol
        (constant value = the symbol's prompt mean — bit-sign exact, since
        every epoch of a symbol carries the same bit); observables history
        points land on the symbol grid (20 ms — exactly the A.10 tick), with
        the same entering-state m-1 pairing and ledger recursion as the
        decimated full-rate path."""
        N = self._sec_period
        t0 = self.trk._t0_int
        fs = self.cfg.fs_hz
        vcount = np.asarray(souts.vcount)
        means_i = np.asarray(souts.mean_i, dtype=np.float64)
        starts = np.asarray(souts.start).astype(np.int64) + block_offset_abs
        fracs = np.asarray(souts.frac, dtype=np.float64)
        carrs = np.asarray(souts.rem_carr_phase_rad, dtype=np.float64)
        dops = np.asarray(souts.carrier_doppler_hz, dtype=np.float64)
        cn0s = np.asarray(souts.cn0_dbhz, dtype=np.float64)
        S = vcount.shape[0]
        for ch, prn in enumerate(self.channel_prn):
            if prn is None:
                continue
            nv = int(souts.n_valid[ch])
            if nv == 0:
                if not bool(souts.active[ch]):
                    log.info("ch %d PRN %d lost lock — releasing", ch, prn)
                    self.channel_prn[ch] = None
                    self._empty_acq_streak = 0
                continue
            dec = self.decoders.get(prn)
            base_sym = self.sym_count[prn]
            b0 = int(sym_off[ch])
            carry = self._sym_carry.setdefault(
                prn, [0.0, 0, (N - b0) % N, None])
            if carry[2] != (N - b0) % N:
                # phase slip (mode switch / reacquisition): resync
                self._flush_sym_carry(prn)
                carry = self._sym_carry[prn]
                carry[2] = (N - b0) % N
            hist = self.histories[prn]
            acc = self.carrier_phase_acc.get(prn, 0.0)
            prev_carr = self.last_carr_rem.get(prn)
            prev_s = self._ledger_prev_start.get(prn)
            # one batched decoder push per segment (per-symbol pushes made
            # the decoder re-scan its whole stream per symbol — O(n^2))
            emit_v: list[np.ndarray] = []
            emit_s: list[np.ndarray] = []
            for s in range(S):
                k = int(vcount[s, ch])
                if k == 0:
                    if s > 0:
                        break           # valid slots form a prefix
                    continue
                if s >= 1:
                    s_m = float(starts[s, ch])
                    carr_m = float(carrs[s, ch])
                    dop_m = float(dops[s, ch])
                    if prev_s is not None and prev_carr is not None:
                        est = 2.0 * np.pi * dop_m * (s_m - prev_s) / fs
                        resid = carr_m - prev_carr - est
                        acc += est + (np.mod(resid + np.pi, 2.0 * np.pi)
                                      - np.pi)
                    prev_s, prev_carr = s_m, carr_m
                    if dec is not None:
                        e_s = b0 + (s - 1) * N
                        tow = dec.tow_at_symbol(base_sym + e_s)
                        if tow is not None:
                            hist.push(s_m + float(fracs[s, ch]), tow,
                                      dop_m, acc, float(cn0s[s, ch]))
                if dec is not None:
                    if carry[1] == 0:
                        carry[3] = int(starts[s, ch])
                    carry[0] += float(means_i[s, ch])
                    carry[1] += k
                    carry[2] += k
                    if carry[2] >= N:
                        pend = carry[1]
                        st0 = int(carry[3])
                        emit_v.append(np.full(pend, carry[0]))
                        emit_s.append(
                            st0 + np.arange(pend, dtype=np.int64) * t0)
                        carry[0], carry[1], carry[2], carry[3] = \
                            0.0, 0, 0, None
            if dec is not None and emit_v:
                dec.push(np.concatenate(emit_v), np.concatenate(emit_s))
            self.carrier_phase_acc[prn] = acc
            if prev_carr is not None:
                self.last_carr_rem[prn] = prev_carr
            if prev_s is not None:
                self._ledger_prev_start[prn] = prev_s
            self.sym_count[prn] = base_sym + nv
            wd = self.cfg.watchdog_symbols
            if dec is not None and wd > 0:
                if dec.tow_at_symbol(self.sym_count[prn] - 1) is None:
                    self._no_tow_syms[prn] = (
                        self._no_tow_syms.get(prn, 0) + nv)
                    if self._no_tow_syms[prn] > wd:
                        log.info("ch %d PRN %d telemetry watchdog "
                                 "(%d symbols, no frame) — releasing",
                                 ch, prn, self._no_tow_syms[prn])
                        self.state = self.trk.deactivate_channel(
                            self.state, ch)
                        self.channel_prn[ch] = None
                        self._empty_acq_streak = 0
                        self._no_tow_syms[prn] = 0
                        self.watchdog_trips += 1
                        continue
                else:
                    self._no_tow_syms[prn] = 0
            if not bool(souts.active[ch]):
                log.info("ch %d PRN %d lost lock — releasing", ch, prn)
                self.channel_prn[ch] = None
                self._empty_acq_streak = 0

    def _monitor_tap(self, ch, prn, prompts, ep_starts, ep_dops, ep_cn0,
                     acc_series) -> None:
        """Stream decimated Gnss_Synchro records (gnss_synchro_monitor
        analogue: one record per channel per monitor_decimation epochs)."""
        from .monitor import GnssSynchro

        spec = self.cfg.spec
        dec = self.decoders.get(prn)
        step = max(1, self.cfg.monitor_decimation)
        recs = []
        for k in range(0, len(prompts), step):
            sym = self.sym_count[prn] - len(prompts) + k
            tow = dec.tow_at_symbol(sym) if dec is not None else None
            acq = self._acq_info.get(prn, (0.0, 0.0, 0))
            recs.append(GnssSynchro(
                system=spec.system[0], signal=spec.signal_id, prn=prn,
                channel_id=ch,
                acq_delay_samples=acq[0], acq_doppler_hz=acq[1],
                acq_samplestamp_samples=acq[2], flag_valid_acquisition=True,
                prompt_i=float(prompts[k].real),
                prompt_q=float(prompts[k].imag),
                cn0_db_hz=float(ep_cn0[k]),
                carrier_doppler_hz=float(ep_dops[k]),
                carrier_phase_rads=float(acc_series[k]),
                code_phase_samples=float(ep_starts[k] % max(
                    1, self.samples_per_code)),
                tracking_sample_counter=int(ep_starts[k]),
                flag_valid_symbol_output=True,
                tow_at_current_symbol_ms=0.0 if tow is None else tow * 1e3,
                flag_valid_word=tow is not None,
            ))
        if recs:
            self.monitor.send_synchro(recs)

    # ---------------- telecommand target (TcpCmdInterface contract) ------

    def status(self) -> str:
        """One-line receiver state for the `status` telecommand."""
        n_track = sum(1 for p in self.channel_prn if p is not None)
        n_eph = sum(1 for d in self.decoders.values()
                    if d.ephemeris_complete)
        last = self.solutions[-1] if self.solutions else None
        pos = (f"lat {last.lat_deg:.5f} lon {last.lon_deg:.5f} "
               f"h {last.height_m:.1f}" if last else "no fix")
        return (f"channels {n_track}/{self.cfg.n_channels} tracking, "
                f"{n_eph} ephemerides, {len(self.solutions)} fixes, {pos}")

    def standby(self) -> None:
        self._standby = True

    def reset(self) -> None:
        self._standby = False

    def cold_start(self) -> None:
        """Drop all channels, decoders and fixes (control_thread.cc
        cold-start path)."""
        for ch in range(self.cfg.n_channels):
            if self.channel_prn[ch] is not None:
                self.state = self.trk.deactivate_channel(self.state, ch)
            self.channel_prn[ch] = None
            self._empty_acq_streak = 0
        self.decoders.clear()
        self.histories.clear()
        self.solutions.clear()
        self.obs_epochs.clear()
        self.rx_tow_s = None
        self._next_obs_sample = None

    def warm_start(self, lat, lon, h, utc: str) -> None:
        """Store an a-priori position for assisted acquisition."""
        from ..pvt.geodesy import llh_to_ecef

        self.apriori_ecef = llh_to_ecef(np.radians(lat), np.radians(lon), h)

    hot_start = warm_start

    def _kf_track_segment(self, seg: np.ndarray, span: int):
        """Segment tracking through the KF engine (block loop — the KF
        engine closes its filter every epoch and has no chunked capture
        program).  Returns (state, TrackOutputs-shaped numpy outputs with
        segment-relative epoch starts)."""
        import jax

        from ..track.engine import TrackOutputs
        from ..utils.planar import to_planar

        base = int(round(self.cfg.fs_hz * self.cfg.block_ms * 1e-3))
        nmax = self.trk.cfg.epoch_samples_max
        seg_p = to_planar(np.asarray(seg, dtype=np.complex64)) \
            if np.iscomplexobj(seg) else np.asarray(seg)
        st = self.state
        pos = 0
        pieces = []
        while pos + base <= span:
            st, outs = self.trk.track_block(
                seg_p[pos : pos + base + nmax], st, base)
            host = jax.tree_util.tree_map(np.asarray, outs)
            host = host._replace(start=host.start + pos)
            pieces.append(host)
            pos += base
        cat = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs), *pieces)
        outs = TrackOutputs(
            valid=cat.valid, start=cat.start, cur_len=cat.cur_len,
            correlators=cat.correlators,
            carrier_doppler_hz=cat.carrier_doppler_hz,
            code_freq_delta=cat.code_freq_delta,
            rem_code_phase_samples=cat.rem_code_phase_samples,
            rem_carr_phase_rad=cat.rem_carr_phase_rad,
            cn0_dbhz=cat.cn0_dbhz, active=cat.active,
        )
        return st, outs

    def _maybe_extend(self) -> None:
        """State 2 -> 3/4 switch once telemetry reports bit / secondary
        sync: coherent extension over extend_correlation_symbols epochs
        aligned to each channel's bit grid, with the narrow loop bandwidths
        (dll_pll_veml_tracking.cc:1774-1900).  For signals with a
        data-channel secondary code (B1I NH20, E5a-I CS20) the switch also
        enables the engine's in-loop wipe-off at the host-synced phase."""
        if self.trk_kind != "dll_pll":
            return          # the KF tracker has no extended/narrow states
        n = self.trk.cfg.extend_correlation_symbols
        sig = self.cfg.signal_id
        period = self._sec_period
        if n <= 1 or period is None or period % n != 0:
            return
        # state.mode is host-written only (activate_channel / enable_extended)
        # — the host shadow avoids a per-segment device sync through the
        # tunnel (~27 ms/transfer)
        mode = self._mode_host
        for ch, prn in enumerate(self.channel_prn):
            if prn is None or mode[ch] != 0:
                continue
            dec = self.decoders.get(prn)
            if sig == "1C":
                bit0 = getattr(dec, "bit_offset", None)
                sec_phase = None
            else:
                bit0 = getattr(dec, "sec_sync_offset", None)
                if bit0 is not None:
                    # secondary-chip index of the NEXT epoch the device
                    # processes (harvested epochs == sym_count)
                    sec_phase = (self.sym_count[prn] - bit0) % period
            if bit0 is None:
                continue
            e = (bit0 - self.sym_count[prn]) % period
            self.state = self.trk.enable_extended(
                self.state, ch, e,
                sec_phase=sec_phase if sig != "1C" else None)
            self._mode_host[ch] = 1
            log.info("ch %d PRN %d -> extended coherent (%d ms, boundary in "
                     "%d epochs)", ch, prn, n, e)

    # ---------------- observables + PVT ----------------

    def load_ephemerides(self, ephemerides: dict) -> None:
        """Hot start: pre-load broadcast ephemerides (A-GNSS XML /
        telecommand hotstart, control_thread.cc:566 assist_GNSS) so PVT can
        fix as soon as telemetry TOW-syncs, without waiting the ~18-30 s
        subframe collection."""
        self.assist_ephemerides = dict(ephemerides)

    def _eph_for(self, prn: int):
        dec = self.decoders.get(prn)
        if dec is not None and dec.ephemeris_complete:
            return dec.ephemeris
        return getattr(self, "assist_ephemerides", {}).get(prn)

    def _observables_and_pvt(self) -> None:
        cfg = self.cfg
        tick = int(round(cfg.fs_hz * cfg.obs_interval_ms * 1e-3))
        ready_hist = {
            p: h for p, h in self.histories.items()
            if p in self.decoders and self._eph_for(p) is not None
            and len(h.start_samples) >= 2
        }
        if len(ready_hist) < 4:
            return
        if self._next_obs_sample is None:
            earliest = max(h.start_samples[0] for h in ready_hist.values())
            self._next_obs_sample = ((earliest // tick) + 1) * tick
        # process all ticks fully covered by every ready history
        covered = min(h.start_samples[-1] for h in ready_hist.values())
        while self._next_obs_sample <= covered:
            rx_sample = self._next_obs_sample
            if self.rx_tow_s is None:
                rx_tow, obs = compute_observables(ready_hist, rx_sample, cfg.fs_hz, None)
                if obs:
                    self.rx_tow_s = rx_tow
                    self.rx_tow_sample = rx_sample
            else:
                rx_tow = self.rx_tow_s + (rx_sample - self.rx_tow_sample) / cfg.fs_hz
                _, obs = compute_observables(ready_hist, rx_sample, cfg.fs_hz, rx_tow)
            if obs:
                self.obs_epochs.append((rx_tow, obs))
            # PVT.output_rate_ms: solve at the configured cadence while
            # observables (and the Hatch smoother state) keep the full
            # obs_interval rate (rtklib_pvt_gs output_rate_ms)
            pvt_decim = max(1, (cfg.pvt_output_rate_ms or 0)
                            // cfg.obs_interval_ms)
            solve_now = (rx_sample // tick) % pvt_decim == 0
            if len(obs) >= 4:
                prs = {p: o.pseudorange_m for p, o in obs.items()}
                if self._smoother is not None:
                    prs = {p: self._smoother.smooth(
                        p, o.pseudorange_m, o.carrier_phase_cycles)
                        for p, o in obs.items()}
            if len(obs) >= 4 and solve_now:
                ephs = {p: self._eph_for(p) for p in obs}
                iono = None
                if cfg.iono_model == "broadcast":
                    for p in obs:
                        dec_iono = getattr(self.decoders[p], "iono", None)
                        if dec_iono is not None and dec_iono.valid:
                            iono = dec_iono
                            break
                sol = solve_pvt(
                    ephs,
                    prs,
                    rx_tow,
                    dopplers_hz={p: o.doppler_hz for p, o in obs.items()},
                    carrier_freq_hz=cfg.spec.carrier_freq_hz,
                    iono=iono,
                    apply_tropo=cfg.trop_model == "saastamoinen",
                    el_mask_deg=cfg.elevation_mask_deg,
                    weighted=cfg.pvt_weighted,
                    raim=cfg.raim,
                    raim_sigma_m=cfg.raim_sigma_m,
                )
                if sol.valid:
                    self.solutions.append(sol)
                    if self.pvt_monitor is not None:
                        self.pvt_monitor.send_pvt(sol)
            self._next_obs_sample += tick

    def solve_ppp_batch(self, sp3=None):
        """PPP over the accumulated observable epochs, selected by
        PVT.positioning_mode=PPP_Static/PPP_Kinematic (the reference's
        rtklib_ppp.cc pppos() chain behind rtklib_solver.cc:491) —
        run after process() when the mode asks for it.

        `sp3`: optional precise products (pvt.precise.Sp3Product or a path
        to an SP3 file, conf key PVT.sp3_file) — switches the orbit/clock
        source to interpolated precise values (rtklib EPHOPT_PREC)."""
        from ..pvt.ppp import PppConfig, PppObs, solve_ppp

        if isinstance(sp3, str):
            from ..pvt.precise import read_sp3

            sp3 = read_sp3(sp3)

        ephs = {p: d.ephemeris for p, d in self.decoders.items()
                if d.ephemeris_complete}
        iono = None
        if self.cfg.iono_model == "broadcast":
            for d in self.decoders.values():
                di = getattr(d, "iono", None)
                if di is not None and di.valid:
                    iono = di
                    break
        epochs = [
            (tow, {p: PppObs(pseudorange_m=o.pseudorange_m,
                             carrier_phase_cycles=o.carrier_phase_cycles,
                             cn0_dbhz=o.cn0_dbhz)
                   for p, o in obs.items()})
            for tow, obs in self.obs_epochs]
        return solve_ppp(epochs, ephs, PppConfig(
            mode=self.cfg.positioning_mode,
            f1_hz=self.cfg.spec.carrier_freq_hz,
            iono=iono,
            trop_model=self.cfg.trop_model,
            el_mask_deg=max(self.cfg.elevation_mask_deg, 7.0),
            precise=sp3))

    def _scale_for(self, samples) -> float:
        """Unit-RMS ingest normalization (computed once, checkpointed):
        bounds prompt magnitudes so the compact capture packing's f16
        prompt fields never overflow on high-amplitude captures (ishort
        +-32767); every acquisition/CN0/lock statistic is scale-invariant."""
        scale = getattr(self, "_ingest_scale", None)
        if scale is None:
            head = np.asarray(samples[: min(len(samples), 1 << 18)])
            rms = float(np.sqrt(np.mean(np.abs(head) ** 2)))
            scale = 1.0 / rms if rms > 0 else 1.0
            self._ingest_scale = scale
        return scale

    # ---------------- main loop ----------------

    def preload(self, samples: np.ndarray) -> None:
        """Upload the whole capture to device HBM once (the production
        ingest-DMA pattern); process(samples) then slices tracking segments
        on device instead of re-uploading per segment — removes the per-
        segment h2d from the steady-state loop (PERF.md: the dev tunnel's
        ~44 MB/s h2d would otherwise bound the receiver)."""
        import jax.numpy as jnp

        from ..utils.planar import to_planar

        self._samples_dev = (jnp.asarray(to_planar(np.asarray(samples)))
                             * np.float32(self._scale_for(samples)))
        self._samples_dev.block_until_ready()

    def process(self, samples: np.ndarray) -> list[PvtSolution]:
        """Run the receiver over a full capture (complex64 at fs).

        Tracking runs in multi-block device segments (track_capture — one
        host round-trip per reacq interval); the channel FSM, telemetry,
        observables and PVT run on host between segments.
        """
        import jax.numpy as jnp

        from ..utils.planar import to_planar

        cfg = self.cfg
        base = int(round(cfg.fs_hz * cfg.block_ms * 1e-3))
        nmax = self.trk.cfg.epoch_samples_max
        total = len(samples)
        seg_blocks = max(1, cfg.reacq_interval_blocks)
        # absolute sample stamps continue across process() calls so a
        # checkpointed receiver resumes mid-capture with a consistent
        # RX-clock timeline (checkpoint()/resume_from())
        abs_base = getattr(self, "_abs_base", 0)
        self._pos = 0
        while self._pos + base + nmax <= total:
            if self._standby:
                break
            need = self.acq.cfg.fft_size * max(1, cfg.acq_dwells)
            if self._pos + need <= total:
                # acquisition/activation run in process-call-relative
                # sample coordinates (the tracking segment frame)
                self._acquire_and_assign(
                    self._pos, samples[self._pos : self._pos + need])
            # long segments amortize per-dispatch latency, but they also set
            # the channel-FSM cadence (re-acquisition, lock-loss detection).
            # Keep segments short through pull-in — an idle channel with
            # satellites still acquirable, or any active channel not yet
            # through pull-in — so satellites (re)acquire at the reference's
            # channel-FSM latency, not once per amortization window
            # (gnss_flowgraph.cc applies acquisition results as they
            # arrive, independent of output cadence).  Steady state gets the
            # full window; so does a receiver with more channels than
            # visible satellites (after several consecutive empty
            # acquisitions the idle channels stop holding segments short).
            seg_now = seg_blocks
            idle_wants_acq = any(p is None for p in self.channel_prn) \
                and self._empty_acq_streak < 5
            if idle_wants_acq or not self._pull_in_done():
                seg_now = min(seg_blocks, 25)
            n_blocks = min(seg_now, (total - self._pos - nmax) // base)
            if n_blocks < 1:
                break
            span = n_blocks * base
            seg = samples[self._pos : self._pos + span + nmax]
            if self.trk_kind == "kf":
                self.state, outs = self._kf_track_segment(seg, span)
                self._harvest(outs, abs_base + self._pos)
            else:
                sdev = getattr(self, "_samples_dev", None)
                if sdev is not None and sdev.shape[0] >= self._pos + span + nmax:
                    seg_dev = _slice_planar(
                        sdev, jnp.int32(self._pos), length=span + nmax)
                else:
                    seg_dev = jnp.asarray(
                        to_planar(seg) * np.float32(self._scale_for(samples)))
                sym_off = self._symbol_offsets()
                if sym_off is not None:
                    self.state, souts = self.trk.track_capture_symbols(
                        seg_dev, self.state, span, sym_off,
                        self._sec_period)
                    self._harvest_symbols(souts, abs_base + self._pos,
                                          sym_off)
                else:
                    self.state, outs = self.trk.track_capture(
                        seg_dev, self.state, span)
                    self._harvest(outs, abs_base + self._pos,
                                  decim=self.trk.capture_decim)
            self._maybe_extend()
            self._observables_and_pvt()
            self._pos += span
            self._blocks_done += n_blocks
        self._abs_base = abs_base + self._pos
        return self.solutions

    def process_stream(self, blocks, segment_s: float = 1.0,
                       raw_format: str | None = None) -> list[PvtSolution]:
        """Real-time streaming pipeline: double-buffered device segments.

        `blocks` yields (offset, chunk) like FileSignalSource.blocks() or
        io.network sources — complex64 chunks, or RAW interleaved integer
        items when `raw_format` names an io.formats entry (ishort/ibyte/
        cshort/cbyte): raw ints ship over the host->device link at 1/4-1/8
        the planar-float32 width and unpack on device (the reference
        overlaps I/O and compute with per-block threads, SURVEY §3.1; here
        segment k+1's dispatch overlaps segment k's readback+harvest).

        The channel FSM runs one segment behind the device (acquisition
        assignment is applied at dispatch; extension/lock-release on
        harvest) — the same class of latency as the reference's
        acquisition worker-thread handoff."""
        import jax
        import jax.numpy as jnp

        from ..io.formats import FORMATS, convert_to_complex64
        from ..utils.planar import to_planar

        if self.trk_kind != "dll_pll":
            raise ValueError("process_stream supports the DLL/PLL engine")
        cfg = self.cfg
        base = int(round(cfg.fs_hz * cfg.block_ms * 1e-3))
        span = max(1, int(round(segment_s / (cfg.block_ms * 1e-3)))) * base
        nmax = self.trk.cfg.epoch_samples_max
        n_epochs = span // (self.trk._t0_int - 2) + 2
        abs_base = getattr(self, "_abs_base", 0)
        fmt = FORMATS[raw_format] if raw_format is not None else None
        ipc = fmt.items_per_sample if fmt is not None else 1
        spi = fmt.samples_per_item if fmt is not None else 1
        if fmt is not None:
            if fmt.name == "2bits_cpx":
                # nibble-packed 2-bit I/Q, 2 samples/byte (LabSat/NSR
                # class): 1/8 the planar-f32 link width, unpacked on
                # device with the io.formats bit layout (MS nibble first,
                # nibble = Q1 Q0 I1 I0)
                @jax.jit
                def unpack_dev(raw, scale):
                    b = raw.astype(jnp.int32)
                    nibs = jnp.stack(
                        [(b >> 4) & 0xF, b & 0xF], axis=1).reshape(-1)

                    def s2(v):
                        return jnp.where(v >= 2, v - 4, v).astype(
                            jnp.float32)

                    return scale * jnp.stack(
                        [s2(nibs & 0x3), s2((nibs >> 2) & 0x3)], axis=-1)
            elif fmt.samples_per_item != 1 or ipc != 2:
                raise ValueError(
                    "raw streaming supports interleaved I/Q integer "
                    "formats (ishort/ibyte/cshort/cbyte) and 2bits_cpx")
            else:
                @jax.jit
                def unpack_dev(raw, scale):
                    return scale * raw.reshape(-1, 2).astype(jnp.float32)

        buf_parts: list[np.ndarray] = []
        buf_len = 0                     # samples buffered
        consumed = 0                    # samples dispatched (stream-relative)
        pending: list[tuple] = []
        reacq_countdown = 0

        def harvest_oldest():
            packed, seg_start = pending.pop(0)
            outs = self.trk._unpack_outputs(packed)
            self._harvest(outs, abs_base + seg_start,
                          decim=self.trk.capture_decim)
            self._maybe_extend()
            self._observables_and_pvt()

        def n_items(n_samples: int) -> int:
            return (n_samples * ipc + spi - 1) // spi

        if (span * ipc) % spi:
            raise ValueError("segment span must align to whole raw items")
        need_samps = span + nmax
        for _, chunk in blocks:
            chunk = np.asarray(chunk)
            buf_parts.append(chunk)
            buf_len += len(chunk) * spi // ipc
            while buf_len >= need_samps and not self._standby:
                buf = np.concatenate(buf_parts) if len(buf_parts) > 1 \
                    else buf_parts[0]
                # acquisition on the segment head (idle channels only)
                if reacq_countdown <= 0:
                    need = self.acq.cfg.fft_size * max(1, cfg.acq_dwells)
                    if buf_len >= need:
                        head = buf[: n_items(need)]
                        xc = convert_to_complex64(head, fmt)[:need] \
                            if fmt is not None else head
                        self._pos = consumed
                        self._acquire_and_assign(consumed, xc)
                    reacq_countdown = max(1, cfg.reacq_interval_blocks
                                          // max(1, span // base))
                reacq_countdown -= 1
                seg = buf[: n_items(need_samps)]
                if fmt is not None:
                    if getattr(self, "_ingest_scale", None) is None:
                        self._scale_for(convert_to_complex64(
                            buf[: n_items(min(buf_len, 1 << 18))], fmt))
                    seg_dev = unpack_dev(
                        jnp.asarray(seg),
                        np.float32(self._ingest_scale))[: need_samps]
                else:
                    seg_dev = jnp.asarray(
                        to_planar(np.ascontiguousarray(seg))
                        * np.float32(self._scale_for(seg)))
                self.state, packed = self.trk._capture_fn(
                    seg_dev, self.state, jnp.int32(span),
                    jnp.int32(n_epochs), n_epochs_cap=n_epochs)
                self.state = self.trk.rebase(self.state, span)
                pending.append((packed, consumed))
                buf_parts = [buf[span * ipc // spi:]]
                buf_len -= span
                consumed += span
                self._blocks_done += span // base
                # harvest the PREVIOUS segment while this one computes
                if len(pending) > 1:
                    harvest_oldest()
        while pending:
            harvest_oldest()
        self._abs_base = abs_base + consumed
        self._pos = 0
        return self.solutions

    # ---------------- checkpoint / resume ----------------

    _CKPT_FIELDS = (
        "channel_prn", "decoders", "histories", "sym_count", "last_rem",
        "last_frac", "carrier_phase_acc", "last_carr_rem", "rx_tow_s",
        "rx_tow_sample", "solutions", "obs_epochs", "_blocks_done",
        "_next_obs_sample", "_standby", "_abs_base", "_no_tow_syms",
        "_acq_info", "_ledger_prev_start", "_ingest_scale", "_smoother",
        "_sym_carry", "_mode_host",
    )

    def checkpoint(self, path: str) -> None:
        """Snapshot the complete receiver state — device tracking scan
        state, per-channel decoder FSMs, observables histories, RX clock,
        solutions — so a later resume_from() continues the run exactly
        (SURVEY.md §5 checkpoint/resume; the reference has no analogue,
        its state lives in live GNU Radio block instances)."""
        import pickle

        import jax

        blob = {
            "version": 1,
            "cfg": self.cfg,
            "track_state": jax.tree.map(np.asarray, self.state),
        }
        for name in self._CKPT_FIELDS:
            blob[name] = getattr(self, name, None)
        with open(path, "wb") as f:
            pickle.dump(blob, f)

    @classmethod
    def resume_from(cls, path: str) -> "Receiver":
        """Rebuild a Receiver from a checkpoint(); feed the remaining
        samples to process() and the run continues where it left off."""
        import pickle

        import jax.numpy as jnp

        with open(path, "rb") as f:
            blob = pickle.load(f)
        if blob.get("version") != 1:
            raise ValueError(f"unsupported checkpoint version: "
                             f"{blob.get('version')}")
        rx = cls(blob["cfg"])
        import jax

        rx.state = jax.tree.map(jnp.asarray, blob["track_state"])
        for name in cls._CKPT_FIELDS:
            if blob.get(name) is not None:
                setattr(rx, name, blob[name])
        if blob.get("_mode_host") is None:
            # checkpoint predates the host mode shadow: recover it from the
            # device state once, else _maybe_extend would re-extend
            # already-extended channels (resetting their coherent windows)
            rx._mode_host = np.asarray(blob["track_state"].mode,
                                       dtype=np.int32).copy()
        return rx
