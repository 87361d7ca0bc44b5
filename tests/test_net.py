"""Network IQ ingest (io/net.py): int16 TCP streaming + upstream control
commands — the remote-radio front end standing in for the reference's
PlutoSDR USB path (rx_plutosdr.cpp / plutosdr_hi_speed_rx.c).  The server
side wraps a SimulatedDevice so the full closed loop (AGC / retune over the
socket) is exercised hardware-free."""
import numpy as np

from sdr_receiver_dvb_t2_tpu.io.devices import (SignalEstimate,
                                                SimulatedDevice,
                                                StreamingReceiver)
from sdr_receiver_dvb_t2_tpu.io.net import SCALE, IQStreamServer, NetworkDevice
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator

from tests.test_e2e import make_ts, small_config


def _waveform(n_frames=2, seed=0):
    p, plp = small_config()
    mod = T2Modulator(p, [plp])
    ts = make_ts(mod.packets_needed(n_frames) + 4, seed=seed)
    out = mod.modulate(ts.reshape(-1), n_frames)
    return ts.reshape(-1), out.samples


def test_network_roundtrip_int16_quantized():
    """Samples survive the TCP hop bit-exactly at int16 resolution."""
    rng = np.random.default_rng(0)
    x = (rng.normal(0, 0.3, 20000)
         + 1j * rng.normal(0, 0.3, 20000)).astype(np.complex64)
    sim = SimulatedDevice(x, snr_db=None)
    srv = IQStreamServer(sim, block=4096)
    dev = NetworkDevice(port=srv.port, timeout=120.0)
    try:
        dev.init(frequency_hz=0.0)
        got = []
        while True:
            b = dev.read_block(8192)
            if b is None or len(b) == 0:
                break
            got.append(b)
            if sum(len(g) for g in got) >= len(x):
                break
        y = np.concatenate(got)[:len(x)]
        sim._render()
        want = sim._stream[:len(y)]
        # int16 quantization at full scale SCALE: half-LSB per component
        assert np.max(np.abs(y - want)) <= 0.75 / SCALE
    finally:
        dev.stop()
        srv.close()


def test_network_commands_reach_device():
    sim = SimulatedDevice(np.zeros(65536, np.complex64), lo_offset_hz=1000.0)
    srv = IQStreamServer(sim, block=4096)
    dev = NetworkDevice(port=srv.port, timeout=120.0)
    try:
        dev.init(frequency_hz=0.0)
        dev.read_block(1024)   # ensure the serve loop is running
        dev.apply(SignalEstimate(coarse_freq_offset=500.0,
                                 change_frequency=True))
        dev.apply(SignalEstimate(gain_offset=-6.0, change_gain=True))
        # drain until the command has been applied between blocks
        import time
        for _ in range(100):
            if sim.retunes and sim.gain_steps:
                break
            dev.read_block(1024)
            time.sleep(0.02)
        assert sim.retunes >= 1 and abs(sim.lo_offset_hz - 500.0) < 1e-6
        assert sim.gain_steps >= 1 and abs(sim.gain_db + 6.0) < 1e-6
    finally:
        dev.stop()
        srv.close()


def test_read_block_preserves_iq_framing_across_partial_reads():
    """A recv that ends mid-sample must buffer the leftover bytes: dropping
    them would byte-shift every subsequent sample (I/Q framing corrupted
    for the rest of the stream)."""
    import socket
    import threading

    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]
    samples = np.arange(1, 9, dtype="<i2").tobytes()   # 4 samples = 16 B

    def serve():
        conn, _ = lsock.accept()
        conn.sendall(samples[:6])        # 1.5 samples
        import time
        time.sleep(0.5)                  # force a recv timeout mid-sample
        conn.sendall(samples[6:])
        time.sleep(0.5)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    dev = NetworkDevice(port=port, timeout=0.2, max_stall=10.0)
    try:
        dev.init(frequency_hz=0.0)
        got = []
        while True:
            b = dev.read_block(4)
            if b is None:
                break
            got.append(b)
        y = np.concatenate(got)
        want = np.arange(1, 9, dtype=np.float32) / SCALE
        np.testing.assert_allclose(
            np.stack([y.real, y.imag], -1).reshape(-1), want, atol=1e-7)
    finally:
        dev.stop()
        t.join(timeout=2.0)
        lsock.close()


def test_read_block_raises_on_stall_instead_of_fake_eof():
    """A silent link is a stall, not end-of-stream: read_block must raise
    TimeoutError after max_stall rather than returning None (which would
    silently end the reception)."""
    import socket

    lsock = socket.socket()
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    dev = NetworkDevice(port=lsock.getsockname()[1], timeout=0.1,
                        max_stall=0.3)
    try:
        dev.init(frequency_hz=0.0)
        import pytest
        with pytest.raises(TimeoutError):
            dev.read_block(16)
    finally:
        dev.stop()
        lsock.close()


def test_init_frequency_is_absolute_tune_not_retune_offset():
    """init(frequency_hz=600 MHz) must NOT be applied as a 600 MHz retune
    step on the remote device (the FREQ command is an offset; absolute
    tuning travels as TUNE)."""
    sim = SimulatedDevice(np.zeros(65536, np.complex64), lo_offset_hz=1000.0)
    srv = IQStreamServer(sim, block=4096)
    dev = NetworkDevice(port=srv.port, timeout=120.0)
    try:
        dev.init(frequency_hz=600e6)
        import time
        for _ in range(100):
            if any(c.startswith("TUNE") for c in srv.commands):
                break
            dev.read_block(1024)
            time.sleep(0.02)
        assert any(c.startswith("TUNE") for c in srv.commands)
        # the sim has no native tune(): the first TUNE records the baseline
        # only — the LO offset must be untouched (no bogus retune step)
        assert sim.retunes == 0
        assert abs(sim.lo_offset_hz - 1000.0) < 1e-9
        assert srv._abs_freq == 600e6
    finally:
        dev.stop()
        srv.close()


def test_streaming_receiver_over_network_decodes_and_retunes():
    """Full product loop across the socket: StreamingReceiver drives a
    remote SimulatedDevice with a 30 kHz LO error; the retune command
    crosses the network, the remote LO steps, and the TS comes out
    bit-exact."""
    flat, samples = _waveform(n_frames=3, seed=7)
    sim = SimulatedDevice(samples, lo_offset_hz=30e3, snr_db=28.0)
    srv = IQStreamServer(sim, block=65536)
    dev = NetworkDevice(port=srv.port, timeout=120.0)
    try:
        dev.init(frequency_hz=0.0)
        sr = StreamingReceiver(dev, block_seconds=0.25, agc=False,
                               acq_seconds=0.2)
        chunks = []
        st = sr.run(ts_sink=lambda b: chunks.append(b))
        got = (np.concatenate(chunks) if chunks else np.zeros(0, np.uint8))
        assert st.frames_decoded >= 2
        assert st.ts_errors == 0
        assert len(got) > 0
        np.testing.assert_array_equal(got, flat[:len(got)])
        # the 30 kHz offset exceeds RETUNE_THRESHOLD_HZ: the FREQ command
        # must have crossed the socket and stepped the remote LO.  The
        # command is sent just before run() returns and the server applies
        # it asynchronously (its post-EOF loop keeps draining feedback),
        # so wait with a deadline instead of racing srv.close() — this was
        # the one nondeterministic failure in the round-2 suite.
        import time
        deadline = time.time() + 15.0
        while time.time() < deadline and sim.retunes < 1:
            time.sleep(0.02)
        assert st.retune_requests >= 1 and sim.retunes >= 1
        assert abs(sim.lo_offset_hz) < 1e3
        assert any(c.startswith("FREQ") for c in srv.commands)
    finally:
        dev.stop()
        srv.close()


def test_t2radio_cli_daemon_serves_capture(tmp_path):
    """The `t2radio` radio-side daemon as a real subprocess: serves a file
    capture over the wire protocol; `NetworkDevice` (the t2rx tcp://
    ingest) connects and the stream decodes TS bit-exact through the full
    streaming receiver."""
    import re
    import subprocess
    import sys

    flat, samples = _waveform(n_frames=3, seed=3)
    cap = tmp_path / "cap.cf32"
    samples.astype(np.complex64).tofile(cap)
    proc = subprocess.Popen(
        [sys.executable, "-m", "sdr_receiver_dvb_t2_tpu.io.net",
         "--device", "file", "--input", str(cap), "--host", "127.0.0.1",
         "--port", "0", "--max-seconds", "120"],
        stdout=subprocess.PIPE, text=True)
    try:
        line = proc.stdout.readline()
        m = re.search(r":(\d+) \(", line)
        assert m, f"no port announced: {line!r}"
        port = int(m.group(1))
        dev = NetworkDevice(port=port, timeout=120.0)
        dev.init(frequency_hz=0.0)
        sr = StreamingReceiver(dev, block_seconds=0.25, agc=False,
                               acq_seconds=0.2)
        chunks = []
        st = sr.run(ts_sink=chunks.append)
        got = (np.concatenate(chunks) if chunks else np.zeros(0, np.uint8))
        assert st.frames_decoded >= 2
        assert st.ts_errors == 0
        np.testing.assert_array_equal(got, flat[:len(got)])
        dev.stop()
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_vendor_rate_announced_and_converted():
    """A device-rate stream (sdrplay 9.2 Msps) over the wire: the server
    announces its native rate in the stream header, NetworkDevice adopts
    it, and the streaming receiver's rate conversion engages — the full
    t2radio --device sdrplay topology, hardware-free."""
    from sdr_receiver_dvb_t2_tpu.rx import frontend

    flat, samples = _waveform(n_frames=3, seed=5)
    x92 = frontend.sinc_resample(samples.astype(np.complex64),
                                 9.142857e6 / 9.2e6)
    sim = SimulatedDevice(x92, snr_db=30.0, sample_rate=9.2e6)
    srv = IQStreamServer(sim, block=65536)
    dev = NetworkDevice(port=srv.port, timeout=120.0)
    try:
        dev.init(frequency_hz=0.0)
        assert dev.sample_rate == 9.2e6   # announced by the header
        sr = StreamingReceiver(dev, block_seconds=0.25, agc=False,
                               acq_seconds=0.2)
        chunks = []
        st = sr.run(ts_sink=chunks.append)
        got = (np.concatenate(chunks) if chunks else np.zeros(0, np.uint8))
        assert st.frames_decoded >= 2
        assert st.ts_errors == 0
        np.testing.assert_array_equal(got, flat[:len(got)])
    finally:
        dev.stop()
        srv.close()


def test_server_reaccepts_after_client_disconnect():
    """Daemon semantics: a second client can connect after the first
    disconnects mid-stream (the serve loop re-accepts; only device EOF or
    close() ends it)."""
    rng = np.random.default_rng(3)
    x = (rng.normal(0, 0.3, 400000)
         + 1j * rng.normal(0, 0.3, 400000)).astype(np.complex64)
    sim = SimulatedDevice(x, snr_db=None)
    srv = IQStreamServer(sim, block=4096)
    try:
        d1 = NetworkDevice(port=srv.port, timeout=30.0)
        d1.init(frequency_hz=0.0)
        b1 = d1.read_block(8192)
        assert b1 is not None and len(b1) == 8192
        d1.stop()                     # client 1 walks away mid-stream
        d2 = NetworkDevice(port=srv.port, timeout=30.0)
        d2.init(frequency_hz=0.0)     # must connect again
        b2 = d2.read_block(8192)
        assert b2 is not None and len(b2) == 8192
        d2.stop()
    finally:
        srv.close()
