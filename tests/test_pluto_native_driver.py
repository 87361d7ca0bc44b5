"""The NATIVE Pluto hi-speed host driver
(native/pluto/plutosdr_hi_speed_rx.c) driven end to end against a fake
libusb stack (tests/fake_drivers/fake_libusb.c) — the re-provided
equivalent of the reference's src/libplutosdr/plutosdr_hi_speed_rx.c
(osmoplutosdr-derived, 719 lines), written from scratch on the public
libusb-1.0 synchronous ABI.

Covers: enumeration by VID/PID, open + interface claim, the control
protocol in the reference's MANDATORY order (rfbw before sample rate,
rx_plutosdr.cpp:104-120), gain in milli-dB, planar int16 sample delivery
through the async callback into the existing PlutoDevice binding, a
paced capture decoding BIT-EXACT TS through the streaming receiver, and
clean stop/close."""
import ctypes
import os
import pathlib
import subprocess

import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.io import vendor

from tests.test_streaming import _waveform
from tests.test_vendor import _write_capture

_SRC = pathlib.Path(__file__).parent / "fake_drivers"
_DRV = (pathlib.Path(__file__).parent.parent / "sdr_receiver_dvb_t2_tpu"
        / "native" / "pluto" / "plutosdr_hi_speed_rx.c")


@pytest.fixture(scope="module")
def libs(tmp_path_factory):
    d = tmp_path_factory.mktemp("plutonative")
    out = {}
    for name, src, extra in (
            ("fake_libusb", _SRC / "fake_libusb.c", []),
            ("plutosdr_hi_speed_rx", _DRV, ["-ldl"])):
        so = d / f"lib{name}.so"
        cmd = ["gcc", "-O2", "-shared", "-fPIC", "-o", str(so), str(src),
               "-lpthread"] + extra
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except FileNotFoundError:
            subprocess.run(["g++", "-x", "c"] + cmd[1:], check=True,
                           capture_output=True)
        out[name] = str(so)
    return out


def test_driver_control_protocol_and_ramp(libs, tmp_path, monkeypatch):
    """Open/configure/stream against the fake USB stack: the control
    transcript shows the mandatory init order, and the planar callback
    delivers the fake's deterministic ramp bit-exactly."""
    tr = tmp_path / "usb.txt"
    monkeypatch.setenv("T2_LIBUSB_PATH", libs["fake_libusb"])
    monkeypatch.setenv("FAKE_LIBUSB_TRANSCRIPT", str(tr))
    monkeypatch.delenv("FAKE_LIBUSB_CAPTURE", raising=False)
    monkeypatch.delenv("FAKE_LIBUSB_RATE_SPS", raising=False)

    dev = vendor.PlutoDevice(lib_path=libs["plutosdr_hi_speed_rx"])
    dev.init(frequency_hz=650e6, gain_db=40)
    assert dev.serial == "FAKEPLUTO-0001"
    assert dev.len_out == 65536

    x = dev.read_block(200000)
    assert x is not None and len(x) == 200000
    # the fake serves i = (m*7) % 4001 - 2000, q = (m*13) % 4001 - 2000,
    # scaled by 1/2048 (12-bit full scale) in the binding
    m = np.arange(200000, dtype=np.int64)
    exp_i = ((m * 7) % 4001 - 2000) / 2048.0
    exp_q = ((m * 13) % 4001 - 2000) / 2048.0
    np.testing.assert_allclose(x.real, exp_i, atol=1e-7)
    np.testing.assert_allclose(x.imag, exp_q, atol=1e-7)
    dev.stop()

    lines = tr.read_text().strip().splitlines()
    ctrl = [ln for ln in lines if ln.startswith("ctrl ")]
    reqs = [int(ln.split()[1], 16) for ln in ctrl]
    # mandatory order: rfbw (0x10) BEFORE sample rate (0x11); then LO,
    # manual gain control, gain, both channel enables, bufstream
    assert reqs[:2] == [0x10, 0x11]
    assert reqs[2:] == [0x12, 0x13, 0x14, 0x15, 0x15, 0x16]
    # payload checks: rfbw 8 MHz, rate 9.2 Msps, LO 650 MHz, 40000 mdB
    def payload(i):
        return bytes.fromhex(ctrl[i].split()[-1])
    assert int.from_bytes(payload(0), "little") == 8_000_000
    assert int.from_bytes(payload(1), "little") == 9_200_000
    assert int.from_bytes(payload(2), "little") == 650_000_000
    assert int.from_bytes(payload(4), "little") == 40_000
    assert "claim 0" in lines[1]
    assert lines[-1] == "close"


def test_driver_streams_capture_to_bitexact_ts(libs, tmp_path,
                                               monkeypatch):
    """A modulated capture served through the fake USB bulk endpoint at
    the device rate decodes to bit-exact TS via the streaming receiver —
    the full native-driver ingest path (usb -> planar callback -> ring ->
    corrector chain -> receiver)."""
    from sdr_receiver_dvb_t2_tpu.io import devices
    flat, samples, p = _waveform(4)
    cap = tmp_path / "cap.bin"
    _write_capture(cap, samples, 9.2e6, lsb_rms=300.0)

    monkeypatch.setenv("T2_LIBUSB_PATH", libs["fake_libusb"])
    monkeypatch.setenv("FAKE_LIBUSB_TRANSCRIPT", str(tmp_path / "t.txt"))
    monkeypatch.setenv("FAKE_LIBUSB_CAPTURE", str(cap))
    monkeypatch.setenv("FAKE_LIBUSB_RATE_SPS", "20e6")  # fast CI pacing

    dev = vendor.PlutoDevice(lib_path=libs["plutosdr_hi_speed_rx"],
                             stall_timeout=1.0)
    dev.init(frequency_hz=650e6, gain_db=40)
    got = []
    sr = devices.StreamingReceiver(dev, agc=False, acq_seconds=0.025,
                                   block_seconds=0.007)
    st = sr.run(ts_sink=got.append)
    dev.stop()
    ts = np.concatenate(got) if got else np.zeros(0, np.uint8)
    assert st.frames_decoded >= 3
    assert st.ts_errors == 0
    np.testing.assert_array_equal(ts, flat[:len(ts)])
