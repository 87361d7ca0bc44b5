"""Vendor SDR binding tests (io/vendor.py) against mock driver libraries.

No SDR hardware exists in CI, so each test builds the corresponding fake
vendor library (tests/fake_drivers/*.c — same prototypes as the real
mir_sdr / libairspy APIs, serving an int16 capture file and modelling
gain/retune) and points the bindings at it via T2_MIR_SDR_LIB /
T2_AIRSPY_LIB.  What this proves: argument marshalling, the blocking
ReadPacket loop / async callback chain, int16 conversion scales, and the
closed retune+AGC feedback semantics (SetRf absolute stepping, SetGr gain
reduction) — the behaviors of rx_sdrplay.cpp:88-291 and
rx_airspy.cpp:55-110, 209-277."""
import ctypes
import os
import pathlib
import subprocess

import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2.params import SAMPLE_RATE
from sdr_receiver_dvb_t2_tpu.io import devices
from sdr_receiver_dvb_t2_tpu.rx import frontend

from tests.test_streaming import _waveform

_SRC = pathlib.Path(__file__).parent / "fake_drivers"


@pytest.fixture(scope="module")
def fake_libs(tmp_path_factory):
    d = tmp_path_factory.mktemp("fakedrv")
    libs = {}
    for name in ("fake_mir_sdr", "fake_airspy", "fake_plutosdr"):
        out = d / f"lib{name}.so"
        cmd = ["gcc", "-O2", "-shared", "-fPIC", "-o", str(out),
               str(_SRC / f"{name}.c"), "-lm", "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except FileNotFoundError:
            subprocess.run(["g++", "-x", "c"] + cmd[1:],
                           check=True, capture_output=True)
        libs[name] = str(out)
    return libs


def _write_capture(path, samples, device_rate, lsb_rms,
                   lo_offset_hz=0.0) -> np.ndarray:
    """Elementary-rate waveform -> device-rate interleaved int16 capture
    (the raw stream a real front end would deliver)."""
    x = np.asarray(samples, np.complex64)
    x = x / np.sqrt(np.mean(np.abs(x) ** 2))
    xr = frontend.sinc_resample(x, SAMPLE_RATE / device_rate)
    if lo_offset_hz:
        t = np.arange(len(xr)) / device_rate
        xr = xr * np.exp(2j * np.pi * lo_offset_hz * t)
    i16 = np.empty(2 * len(xr), np.int16)
    i16[0::2] = np.clip(np.round(xr.real * lsb_rms), -32768, 32767)
    i16[1::2] = np.clip(np.round(xr.imag * lsb_rms), -32768, 32767)
    i16.tofile(path)
    return i16


def _stream(dev, **kw):
    got = []
    kw.setdefault("acq_seconds", 0.025)
    kw.setdefault("block_seconds", 0.007)
    sr = devices.StreamingReceiver(dev, **kw)
    st = sr.run(ts_sink=got.append)
    ts = np.concatenate(got) if got else np.zeros(0, np.uint8)
    return st, ts


def test_sdrplay_streaming_decode_with_agc(fake_libs, tmp_path,
                                           monkeypatch):
    """The full mir_sdr read loop under StreamingReceiver (through the
    native ring, like the reference's device thread): a cold capture
    (-12 dB) served by the mock driver is pulled up by the AGC loop via
    mir_sdr_SetGr and decodes TS bit-exact."""
    flat, samples, p = _waveform(6)
    cap = tmp_path / "cap.ci16"
    # 10-bit ADC full scale = 512 LSB; RMS 120 => level ~ -12.6 dB, below
    # the AGC deadband, so the loop MUST step gain for a healthy level
    _write_capture(cap, samples, 9.2e6, lsb_rms=120.0)
    monkeypatch.setenv("FAKE_MIR_SDR_CAPTURE", str(cap))
    monkeypatch.setenv("T2_MIR_SDR_LIB", fake_libs["fake_mir_sdr"])
    dev = devices.DEVICES["sdrplay"]()
    assert dev.api_version > 0
    dev.init(frequency_hz=600e6, gain_db=40)
    st, ts = _stream(dev, use_ring=True)
    fake = ctypes.CDLL(fake_libs["fake_mir_sdr"])
    fake.fake_mir_get_gr.restype = ctypes.c_int
    fake.fake_mir_get_dc_ctl.restype = ctypes.c_int
    fake.fake_mir_get_iq_ctl.restype = ctypes.c_int
    fake.fake_mir_get_uninits.restype = ctypes.c_int
    fake.fake_mir_get_released.restype = ctypes.c_int
    # AGC stepped hardware gain: gain reduction decreased from the init 40
    assert st.gain_steps >= 1
    assert fake.fake_mir_get_gr() < 40
    # the framework does its own DC/IQ: the API's control must be OFF
    assert fake.fake_mir_get_dc_ctl() == 0
    assert fake.fake_mir_get_iq_ctl() == 0
    # teardown reached mir_sdr_Uninit + ReleaseDeviceIdx
    assert fake.fake_mir_get_uninits() >= 1
    assert fake.fake_mir_get_released() == 1
    assert st.frames_decoded >= 4
    assert len(ts) >= 10 * 188
    pos = bytes(flat).find(bytes(ts[:4 * 188]))
    assert pos >= 0 and pos % 188 == 0
    np.testing.assert_array_equal(ts, flat[pos:pos + len(ts)])


def test_sdrplay_retune_loop_closes(fake_libs, tmp_path, monkeypatch):
    """A 30 kHz LO error baked into the capture triggers the retune path:
    the binding must step mir_sdr_SetRf to the absolute corrected RF and
    the mock radio's shifted baseband must then decode."""
    flat, samples, p = _waveform(10)
    cap = tmp_path / "cap.ci16"
    _write_capture(cap, samples, 9.2e6, lsb_rms=180.0, lo_offset_hz=30e3)
    monkeypatch.setenv("FAKE_MIR_SDR_CAPTURE", str(cap))
    monkeypatch.setenv("T2_MIR_SDR_LIB", fake_libs["fake_mir_sdr"])
    dev = devices.DEVICES["sdrplay"]()
    dev.init(frequency_hz=600e6, gain_db=40)
    st, ts = _stream(dev, agc=False)
    fake = ctypes.CDLL(fake_libs["fake_mir_sdr"])
    fake.fake_mir_get_rf.restype = ctypes.c_double
    assert st.retune_requests >= 1
    # LO centered on the discovered offset (rx_sdrplay.cpp:163-176)
    assert abs(fake.fake_mir_get_rf() - (600e6 + 30e3)) < 500.0
    assert abs(dev.rf_hz - fake.fake_mir_get_rf()) < 1e-6
    # frames decoded on BOTH sides of the retune (pending is dropped at
    # the retune, so the total is less than 10 but spans the splice)
    assert st.frames_decoded >= 5
    assert len(ts) >= 8 * 188
    # the last packets come from the post-retune lock: still bit-exact
    tail = bytes(np.asarray(ts[-4 * 188:], np.uint8))
    assert bytes(flat).find(tail) >= 0


def test_airspy_streaming_decode(fake_libs, tmp_path, monkeypatch):
    """The async libairspy callback chain at 10 Msps: transfers land in
    the native SPSC ring from a C->Python trampoline, the streaming
    receiver resamples 10 -> 9.142857 Msps and decodes TS bit-exact."""
    flat, samples, p = _waveform(6)
    cap = tmp_path / "cap.ci16"
    _write_capture(cap, samples, 10.0e6, lsb_rms=600.0)
    monkeypatch.setenv("FAKE_AIRSPY_CAPTURE", str(cap))
    monkeypatch.setenv("T2_AIRSPY_LIB", fake_libs["fake_airspy"])
    dev = devices.DEVICES["airspy"]()
    dev.init(frequency_hz=600e6, gain_db=14)
    st, ts = _stream(dev, agc=False)
    fake = ctypes.CDLL(fake_libs["fake_airspy"])
    fake.fake_airspy_get_freq.restype = ctypes.c_uint32
    fake.fake_airspy_get_gain.restype = ctypes.c_int
    fake.fake_airspy_get_sample_type.restype = ctypes.c_int
    fake.fake_airspy_get_samplerate.restype = ctypes.c_double
    assert fake.fake_airspy_get_sample_type() == 2      # INT16_IQ
    assert fake.fake_airspy_get_samplerate() == 10.0e6
    assert fake.fake_airspy_get_freq() == 600_000_000
    assert fake.fake_airspy_get_gain() == 14
    assert st.frames_decoded >= 5
    assert st.ts_errors == 0
    assert len(ts) >= 10 * 188
    np.testing.assert_array_equal(ts, flat[:len(ts)])
    assert dev.overruns == 0 and dev.dropped_samples == 0
    dev.stop()


def test_pluto_streaming_decode(fake_libs, tmp_path, monkeypatch):
    """The custom hi-speed libusb Pluto driver chain: PLANAR int16
    transfers (separate i/q arrays, unlike AirSpy) interleaved by the
    trampoline into the native ring, with the reference's mandatory init
    order honored (rfbw before sample rate, both buffer channels + the
    bufstream enabled before start_rx — the fake refuses to stream
    otherwise, mirroring rx_plutosdr.cpp:91-128)."""
    flat, samples, p = _waveform(6)
    cap = tmp_path / "cap.ci16"
    # 12-bit ADC full scale = 2048 LSB
    _write_capture(cap, samples, 9.2e6, lsb_rms=500.0)
    monkeypatch.setenv("FAKE_PLUTOSDR_CAPTURE", str(cap))
    monkeypatch.setenv("T2_PLUTOSDR_LIB", fake_libs["fake_plutosdr"])
    dev = devices.DEVICES["plutosdr"]()
    dev.init(frequency_hz=600e6, gain_db=30)
    assert dev.serial == "FAKEPLUTO001" and dev.len_out == 16384
    st, ts = _stream(dev, agc=False)
    fake = ctypes.CDLL(fake_libs["fake_plutosdr"])
    fake.fake_pluto_get_rxlo.restype = ctypes.c_double
    fake.fake_pluto_get_gain_mdb.restype = ctypes.c_uint32
    fake.fake_pluto_get_rfbw.restype = ctypes.c_uint32
    fake.fake_pluto_get_samplerate.restype = ctypes.c_double
    fake.fake_pluto_get_gainctl_manual.restype = ctypes.c_int
    fake.fake_pluto_get_bufstream.restype = ctypes.c_int
    fake.fake_pluto_get_closes.restype = ctypes.c_int
    fake.fake_pluto_is_streaming.restype = ctypes.c_int
    assert fake.fake_pluto_get_rfbw() == 8_000_000
    assert fake.fake_pluto_get_samplerate() == 9.2e6
    assert fake.fake_pluto_get_rxlo() == 600e6
    assert fake.fake_pluto_get_gainctl_manual() == 1
    assert fake.fake_pluto_get_gain_mdb() == 30_000
    assert st.frames_decoded >= 4
    assert len(ts) >= 10 * 188
    np.testing.assert_array_equal(ts, flat[:len(ts)])
    dev.stop()
    assert fake.fake_pluto_get_closes() >= 1
    assert fake.fake_pluto_is_streaming() == 0


def test_pluto_retune_and_gain_feedback(fake_libs, tmp_path, monkeypatch):
    """A 25 kHz LO error triggers the retune path: the binding steps
    plutosdr_set_rxlo to the absolute corrected LO (rx_plutosdr.cpp:182)
    and the shifted baseband decodes; a gain SignalEstimate lands in
    plutosdr_set_gain_mdb (millidB) clamped to the AD9361 range."""
    flat, samples, p = _waveform(10)
    cap = tmp_path / "cap.ci16"
    _write_capture(cap, samples, 9.2e6, lsb_rms=500.0, lo_offset_hz=25e3)
    monkeypatch.setenv("FAKE_PLUTOSDR_CAPTURE", str(cap))
    monkeypatch.setenv("T2_PLUTOSDR_LIB", fake_libs["fake_plutosdr"])
    # pace the pump near the CI consumer's (far-below-real-time) speed so
    # the retune-flush backlog models the hardware relationship; see the
    # pump comment in fake_plutosdr.c
    monkeypatch.setenv("FAKE_PLUTOSDR_RATE_SPS", "200000")
    dev = devices.DEVICES["plutosdr"]()
    dev.init(frequency_hz=600e6, gain_db=30)
    st, ts = _stream(dev, agc=False)
    fake = ctypes.CDLL(fake_libs["fake_plutosdr"])
    fake.fake_pluto_get_rxlo.restype = ctypes.c_double
    fake.fake_pluto_get_gain_mdb.restype = ctypes.c_uint32
    assert st.retune_requests >= 1
    assert abs(fake.fake_pluto_get_rxlo() - (600e6 + 25e3)) < 500.0
    assert abs(dev.rf_hz - fake.fake_pluto_get_rxlo()) < 1e-6
    assert st.frames_decoded >= 5
    tail = bytes(np.asarray(ts[-4 * 188:], np.uint8))
    assert bytes(flat).find(tail) >= 0
    # gain semantics: positive offset RAISES gain (not mir_sdr reduction)
    dev.apply(devices.SignalEstimate(gain_offset=6.0, change_gain=True))
    assert dev.gain_db == 36 and fake.fake_pluto_get_gain_mdb() == 36_000
    dev.apply(devices.SignalEstimate(gain_offset=100.0, change_gain=True))
    assert dev.gain_db == dev.GAIN_MAX_DB
    dev.stop()


def test_sdrplay_gain_semantics(fake_libs, tmp_path, monkeypatch):
    """mir_sdr gain is REDUCTION: a +6 dB gain request must LOWER gRdB by
    6 (the reference's `gain_db -= signal->gain_offset`)."""
    flat, samples, p = _waveform(2)
    cap = tmp_path / "cap.ci16"
    _write_capture(cap, samples, 9.2e6, lsb_rms=180.0)
    monkeypatch.setenv("FAKE_MIR_SDR_CAPTURE", str(cap))
    monkeypatch.setenv("T2_MIR_SDR_LIB", fake_libs["fake_mir_sdr"])
    dev = devices.DEVICES["sdrplay"]()
    dev.init(frequency_hz=600e6, gain_db=40)
    dev.apply(devices.SignalEstimate(gain_offset=6.0, change_gain=True))
    fake = ctypes.CDLL(fake_libs["fake_mir_sdr"])
    fake.fake_mir_get_gr.restype = ctypes.c_int
    assert dev.gr_db == 34 and fake.fake_mir_get_gr() == 34
    # clamped at the hardware floor
    dev.apply(devices.SignalEstimate(gain_offset=100.0, change_gain=True))
    assert dev.gr_db == dev.GR_MIN
    dev.stop()
