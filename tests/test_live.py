"""Live dashboard (utils/live.py): rendering sanity and the streaming-loop
on_block hook — the CLI-era equivalent of the reference GUI's live panels
(main_window.cpp:393-441)."""
import io

import numpy as np

from sdr_receiver_dvb_t2_tpu.io.devices import (SimulatedDevice,
                                                StreamingReceiver)
from sdr_receiver_dvb_t2_tpu.utils.live import (LiveDashboard,
                                                render_constellation)
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator

from tests.test_e2e import make_ts, small_config


def test_render_constellation_density():
    # 4 QPSK clusters land in 4 distinct quadrant cells
    rng = np.random.default_rng(0)
    pts = (np.repeat([1 + 1j, 1 - 1j, -1 + 1j, -1 - 1j], 256)
           + 0.05 * (rng.normal(size=1024) + 1j * rng.normal(size=1024)))
    rows = render_constellation(pts, rows=8, cols=16)
    assert len(rows) == 8 and all(len(r) == 16 for r in rows)
    ink = [(r, c) for r, line in enumerate(rows)
           for c, ch in enumerate(line) if ch != " "]
    assert len(ink) >= 4
    quads = {(r < 4, c < 8) for r, c in ink}
    assert len(quads) == 4
    # empty input renders a blank grid, no crash
    blank = render_constellation(None)
    assert all(set(r) == {" "} for r in blank)


def test_dashboard_streams_and_redraws():
    p, plp = small_config()
    mod = T2Modulator(p, [plp])
    ts = make_ts(mod.packets_needed(2) + 4, seed=1)
    out = mod.modulate(ts.reshape(-1), 2)
    dev = SimulatedDevice(out.samples, snr_db=30.0)
    dev.init(0.0)
    buf = io.StringIO()
    dash = LiveDashboard(out=buf, interval=0.0)
    sr = StreamingReceiver(dev, agc=False, acq_seconds=0.01)
    st = sr.run(on_block=dash.update)
    dash.close()
    text = buf.getvalue()
    assert st.frames_decoded >= 1
    assert "LOCKED" in text and "8K" in text
    assert "SNR" in text and "TS packets" in text
    assert "data cells" in text          # constellation label from the tap
    # in-place redraw uses ANSI erase-line
    assert "\x1b[2K" in text


def test_render_spectrum_peak_and_nan_safety():
    """The live spectrum pane (reference input spectrograph,
    main_window.cpp:393-441): a strong tone fills its column tallest;
    NaN/short input renders blank without crashing."""
    from sdr_receiver_dvb_t2_tpu.utils.live import render_spectrum
    n = 8192
    t = np.arange(n)
    # tone at +fs/4 -> after fftshift it sits at ~3/4 across the pane
    x = (np.exp(2j * np.pi * 0.25 * t)
         + 0.01 * (np.random.default_rng(0).normal(size=n)
                   + 1j * np.random.default_rng(1).normal(size=n))
         ).astype(np.complex64)
    rows = render_spectrum(x, rows=6, cols=56)
    assert len(rows) == 6 and all(len(r) == 56 for r in rows)
    # the tone's column reaches the TOP row, and it is in the right half
    top_cols = [c for c, ch in enumerate(rows[0]) if ch == "#"]
    assert top_cols, rows
    assert all(50 * 56 // 100 < c for c in top_cols), top_cols
    # blank / NaN / short inputs
    assert all(set(r) == {" "} for r in render_spectrum(None))
    assert all(set(r) == {" "} for r in render_spectrum(np.zeros(16)))
    bad = np.full(4096, np.nan + 1j * np.nan, np.complex64)
    render_spectrum(bad)  # must not raise


def test_dashboard_shows_spectrum_pane():
    """--live shows input spectrum + constellation simultaneously
    (VERDICT r4 next #7)."""
    p, plp = small_config()
    mod = T2Modulator(p, [plp])
    ts = make_ts(mod.packets_needed(2) + 4, seed=1)
    out = mod.modulate(ts.reshape(-1), 2)
    dev = SimulatedDevice(out.samples, snr_db=30.0)
    dev.init(0.0)
    buf = io.StringIO()
    dash = LiveDashboard(out=buf, interval=0.0)
    sr = StreamingReceiver(dev, agc=False, acq_seconds=0.01)
    st = sr.run(on_block=dash.update)
    dash.close()
    text = buf.getvalue()
    assert st.frames_decoded >= 1
    assert "input spectrum" in text
    assert "data cells" in text          # constellation pane still there
    # the OFDM block occupies most of the band: some spectrum ink exists
    import re
    plain = re.sub(r"\x1b\[[0-9;]*[A-Za-z]", "", text)
    spec_rows = [ln for ln in plain.splitlines()
                 if ln.strip().startswith("|") and ln.strip().endswith("|")]
    assert any("#" in ln for ln in spec_rows)
