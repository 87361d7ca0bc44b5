"""SDR device layer: the framework's equivalent of the reference's L0
ingest (rx_sdrplay / rx_airspy / rx_plutosdr, SURVEY.md §2.1).

The reference couples its device thread to the demodulator through the
`signal_estimate` struct (dvbt2_demodulator.h:42-52): the demodulator asks
the hardware for coarse retunes, AGC gain steps, resampler corrections and
resets, and the device applies them between read blocks
(rx_sdrplay.cpp:158-197, 230-279).  This module reproduces that control
plane TPU-side:

  - `SignalEstimate`  — the feedback struct,
  - `SDRDevice`       — get/init/start/read_block/apply/stop interface,
  - `FileDevice`      — replays recorded captures at device rate,
  - `SimulatedDevice` — a modulated signal behind a hardware model
    (LO offset, clock ppm, gain); retune/AGC feedback acts on the model
    exactly like stepping a real LO/attenuator, so the closed-loop
    acquisition state machine can be exercised without hardware,
  - `SdrplayDevice` / `AirspyDevice` / `PlutoDevice` — ctypes binding
    points for the vendor libraries the reference uses; they raise with
    instructions when the shared library is absent (no SDR hardware in
    the TPU environment; the native ingest library
    (native/ingest.cpp) provides the int16 conversion + ring buffer).

Streaming consumption is in `StreamingReceiver` below: blocks -> elastic
buffer -> acquisition -> block decode -> TS sink, with feedback applied
between blocks (the reference's 7-thread pipeline collapsed into a loop
around the batched receiver).
"""
from __future__ import annotations

import ctypes.util
from dataclasses import dataclass, field

import numpy as np

from ..dvbt2.params import SAMPLE_RATE


@dataclass
class SignalEstimate:
    """Demodulator -> device feedback (dvbt2_demodulator.h:42-52)."""
    correct_resample: float = 0.0     # fractional sample-rate correction
    coarse_freq_offset: float = 0.0   # Hz; retune request
    gain_offset: float = 0.0          # dB; AGC step request
    signal_level: float = 0.0         # measured input level 0..1
    change_frequency: bool = False
    change_gain: bool = False
    reset: bool = False


class SDRDevice:
    """get/init/start/stop + blockwise read, like rx_sdrplay.h:34-48."""

    sample_rate: float = SAMPLE_RATE

    def init(self, frequency_hz: float, gain_db: float = 0.0) -> None:
        raise NotImplementedError

    def start(self) -> None:
        pass

    def read_block(self, n: int) -> np.ndarray | None:
        """Next n samples as complex64 (None = end of stream)."""
        raise NotImplementedError

    def apply(self, est: SignalEstimate) -> None:
        """Apply demodulator feedback (retune / AGC / reset)."""

    def stop(self) -> None:
        pass


class FileDevice(SDRDevice):
    """Replays a recorded capture; retune requests become a digital NCO
    shift (the recorded LO cannot move, but the correction is exact)."""

    def __init__(self, path: str, fmt: str | None = None,
                 sample_rate: float = SAMPLE_RATE):
        from . import iq as iqio
        self.samples = iqio.read_iq(path, fmt)
        self.sample_rate = sample_rate
        self.pos = 0
        self._freq_shift = 0.0
        self._gain = 1.0

    def init(self, frequency_hz: float, gain_db: float = 0.0) -> None:
        self.pos = 0
        self._gain = 10.0 ** (gain_db / 20.0)

    def read_block(self, n: int) -> np.ndarray | None:
        if self.pos >= len(self.samples):
            return None
        x = self.samples[self.pos:self.pos + n]
        idx = np.arange(self.pos, self.pos + len(x))
        self.pos += len(x)
        if self._freq_shift:
            x = x * np.exp(-2j * np.pi * self._freq_shift * idx
                           / self.sample_rate)
        return (x * self._gain).astype(np.complex64)

    def apply(self, est: SignalEstimate) -> None:
        if est.change_frequency:
            self._freq_shift += est.coarse_freq_offset
        if est.change_gain:
            self._gain *= 10.0 ** (est.gain_offset / 20.0)
        if est.reset:
            self.pos = 0


class SimulatedDevice(SDRDevice):
    """A transmit waveform behind a simple hardware model: LO offset,
    sample-clock ppm, analog gain, noise.  Feedback steps the model the
    way the reference steps real hardware (rx_sdrplay.cpp:158-197)."""

    def __init__(self, samples: np.ndarray, lo_offset_hz: float = 0.0,
                 clock_ppm: float = 0.0, gain_db: float = 0.0,
                 snr_db: float | None = None, seed: int = 0,
                 sample_rate: float = SAMPLE_RATE):
        self.base = np.asarray(samples, dtype=np.complex64)
        self.lo_offset_hz = lo_offset_hz
        self.clock_ppm = clock_ppm
        self.gain_db = gain_db
        self.snr_db = snr_db
        self.seed = seed
        self.sample_rate = sample_rate
        self.pos = 0
        self._stream: np.ndarray | None = None
        self.retunes = 0
        self.gain_steps = 0

    def _render(self) -> None:
        from ..rx import frontend
        x = self.base
        if self.clock_ppm:
            x = frontend.sinc_resample(x, 1.0 + self.clock_ppm * 1e-6)
        if self.lo_offset_hz:
            n = np.arange(len(x))
            x = x * np.exp(2j * np.pi * self.lo_offset_hz * n
                           / self.sample_rate)
        x = x * np.float32(10.0 ** (self.gain_db / 20.0))
        if self.snr_db is not None:
            rng = np.random.default_rng(self.seed)
            power = float(np.mean(np.abs(x) ** 2))
            nv = power / (10.0 ** (self.snr_db / 10.0))
            x = x + (rng.normal(0, np.sqrt(nv / 2), len(x))
                     + 1j * rng.normal(0, np.sqrt(nv / 2), len(x)))
        self._stream = x.astype(np.complex64)

    def init(self, frequency_hz: float, gain_db: float = 0.0) -> None:
        self.pos = 0
        self._render()

    def read_block(self, n: int) -> np.ndarray | None:
        if self._stream is None:
            self._render()
        if self.pos >= len(self._stream):
            return None
        x = self._stream[self.pos:self.pos + n]
        self.pos += len(x)
        return x

    def apply(self, est: SignalEstimate) -> None:
        changed = False
        if est.change_frequency:
            # retune the LO: the offset seen at baseband shrinks
            self.lo_offset_hz -= est.coarse_freq_offset
            self.retunes += 1
            changed = True
        if est.change_gain:
            self.gain_db += est.gain_offset
            self.gain_steps += 1
            changed = True
        if est.reset:
            changed = True
        if changed:
            self.pos = 0
            self._render()


def _vendor_device(name: str, libnames: list[str]):
    class _Vendor(SDRDevice):
        f"""{name} front-end binding point."""

        def __init__(self, serial: str | None = None):
            self.lib = None
            for ln in libnames:
                path = ctypes.util.find_library(ln)
                if path:
                    self.lib = ctypes.CDLL(path)
                    break
            if self.lib is None:
                raise RuntimeError(
                    f"{name} vendor library not found (tried {libnames}); "
                    "attach the SDR and install its driver, or use "
                    "FileDevice/SimulatedDevice. The native ingest ring "
                    "(sdr_receiver_dvb_t2_tpu/native) handles the int16 "
                    "stream once the driver delivers blocks.")

    _Vendor.__name__ = f"{name}Device"
    return _Vendor


SdrplayDevice = _vendor_device("Sdrplay", ["mirsdrapi-rsp", "sdrplay_api"])
AirspyDevice = _vendor_device("Airspy", ["airspy"])
PlutoDevice = _vendor_device("Pluto", ["iio", "plutosdr"])

DEVICES = {"file": FileDevice, "sim": SimulatedDevice,
           "sdrplay": SdrplayDevice, "airspy": AirspyDevice,
           "plutosdr": PlutoDevice}


@dataclass
class StreamStats:
    blocks: int = 0
    retune_requests: int = 0
    frames_decoded: int = 0
    ts_bytes: int = 0
    snr_db: list = field(default_factory=list)


class StreamingReceiver:
    """Blockwise closed-loop receive: device blocks -> elastic buffer ->
    acquire/decode -> TS sink, demodulator feedback applied between
    blocks (the reference's device<->demod control plane,
    rx_sdrplay.cpp:230-279, collapsed around the batched receiver)."""

    def __init__(self, device: SDRDevice, receiver=None,
                 block_frames: int = 4, max_retunes: int = 3):
        from ..rx.receiver import T2Receiver
        self.device = device
        self.receiver = receiver or T2Receiver()
        self.block_frames = block_frames
        self.max_retunes = max_retunes

    RETUNE_THRESHOLD_HZ = 20e3

    def run(self, ts_sink=None, max_blocks: int | None = None
            ) -> StreamStats:
        stats = StreamStats()
        dev = self.device
        dev.start()
        # acquisition block: enough for P1 + a few frames at any mode
        acq_len = int(dev.sample_rate * 0.6)
        buf = dev.read_block(acq_len)
        retunes = 0
        while buf is not None:
            if max_blocks is not None and stats.blocks >= max_blocks:
                break
            stats.blocks += 1
            res = self.receiver.receive(buf)
            stats.frames_decoded += res.stats.frames_decoded
            stats.snr_db.extend(res.stats.snr_db)
            if len(res.ts) and ts_sink is not None:
                ts_sink(res.ts)
            stats.ts_bytes += len(res.ts)
            if (abs(res.stats.cfo_hz) > self.RETUNE_THRESHOLD_HZ
                    and retunes < self.max_retunes):
                # a digital NCO absorbs the offset within a block, but the
                # reference centers the hardware LO whenever the coarse
                # offset is large (rx_sdrplay.cpp:163-176) -- same here so
                # subsequent blocks sit mid-passband
                est = SignalEstimate(coarse_freq_offset=res.stats.cfo_hz,
                                     change_frequency=True)
                dev.apply(est)
                retunes += 1
                stats.retune_requests += 1
            buf = dev.read_block(acq_len)
        dev.stop()
        return stats
