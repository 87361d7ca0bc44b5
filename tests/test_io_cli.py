"""IQ file formats, TS sinks, and the t2tx/t2rx CLI mains."""
import os
import socket
import threading

import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.io import iq as iqio
from sdr_receiver_dvb_t2_tpu.io import ts_io


def test_iq_roundtrip_cf32(tmp_path):
    x = (np.random.default_rng(0).normal(size=1000)
         + 1j * np.random.default_rng(1).normal(size=1000)
         ).astype(np.complex64)
    p = str(tmp_path / "a.cf32")
    iqio.write_iq(p, x)
    y = iqio.read_iq(p)
    np.testing.assert_array_equal(x, y)


def test_iq_roundtrip_ci16(tmp_path):
    x = (np.random.default_rng(0).normal(size=1000)
         + 1j * np.random.default_rng(1).normal(size=1000)
         ).astype(np.complex64)
    p = str(tmp_path / "a.ci16")
    iqio.write_iq(p, x)
    y = iqio.read_iq(p)
    assert y.shape == x.shape
    # int16 quantization: correlation stays ~1
    c = np.vdot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y))
    assert abs(c) > 0.999


def test_udp_sink_datagrams():
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.bind(("127.0.0.1", 0))
    port = rx_sock.getsockname()[1]
    rx_sock.settimeout(5)
    data = np.arange(188 * 15 % 256, dtype=np.uint8)
    data = np.resize(data, 188 * 15)
    sink = ts_io.UDPSink("127.0.0.1", port)
    sink.write(data)
    sink.close()
    got = b""
    while len(got) < len(data):
        d, _ = rx_sock.recvfrom(4096)
        got += d
    assert got == data.tobytes()
    rx_sock.close()


def test_open_sink_parsing(tmp_path):
    s = ts_io.open_sink("udp://127.0.0.1:9999")
    assert isinstance(s, ts_io.UDPSink) and s.addr == ("127.0.0.1", 9999)
    s.close()
    s = ts_io.open_sink(str(tmp_path / "x.ts"))
    assert isinstance(s, ts_io.FileSink)
    s.close()


def test_cli_tx_rx_roundtrip(tmp_path):
    from sdr_receiver_dvb_t2_tpu.rx.cli import main as rx_main
    from sdr_receiver_dvb_t2_tpu.tx.cli import main as tx_main
    rng = np.random.default_rng(2)
    ts = rng.integers(0, 256, (120, 188)).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    ts_path = str(tmp_path / "in.ts")
    ts.tofile(ts_path)
    iq_path = str(tmp_path / "sig.cf32")
    out_path = str(tmp_path / "out.ts")
    rc = tx_main([ts_path, iq_path, "--fft", "8k", "--guard", "1/32",
                  "--pp", "1", "--mod", "16qam", "--rate", "1/2",
                  "--short-fec", "--blocks", "3", "--n-data", "9",
                  "--frames", "1"])
    assert rc == 0
    rc = rx_main([iq_path, "--out", out_path])
    assert rc == 0
    got = np.fromfile(out_path, np.uint8)
    assert len(got) >= 188
    np.testing.assert_array_equal(got, ts.reshape(-1)[:len(got)])


def test_cli_streaming_mode(tmp_path):
    from sdr_receiver_dvb_t2_tpu.rx.cli import main as rx_main
    from sdr_receiver_dvb_t2_tpu.tx.cli import main as tx_main
    rng = np.random.default_rng(3)
    ts = rng.integers(0, 256, (120, 188)).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    ts_path = str(tmp_path / "in.ts")
    ts.tofile(ts_path)
    iq_path = str(tmp_path / "sig.cf32")
    out_path = str(tmp_path / "out.ts")
    rc = tx_main([ts_path, iq_path, "--fft", "8k", "--guard", "1/32",
                  "--pp", "1", "--mod", "16qam", "--rate", "1/2",
                  "--short-fec", "--blocks", "3", "--n-data", "9",
                  "--frames", "2"])
    assert rc == 0
    rc = rx_main([iq_path, "--out", out_path, "--stream"])
    assert rc == 0
    got = np.fromfile(out_path, np.uint8)
    assert len(got) >= 188
    np.testing.assert_array_equal(got, ts.reshape(-1)[:len(got)])
