"""Device layer: signal_estimate control plane + streaming receive loop
(the reference's L0 ingest + device<->demod feedback, SURVEY.md §2.1)."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.io import devices
from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    PLPParams, T2Params)
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator


def _waveform(n_frames=3):
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=3,
                    time_il_length=1)
    mod = T2Modulator(p, [plp])
    rng = np.random.default_rng(21)
    ts = rng.integers(0, 256, (mod.packets_needed(n_frames) + 4, 188)
                      ).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    out = mod.modulate(ts.reshape(-1), n_frames)
    return ts.reshape(-1), out.samples


def test_simulated_device_retune_control_plane():
    """Large LO offset: the streaming loop decodes (digital correction),
    requests a hardware retune, and the device's LO offset collapses --
    the reference's coarse_freq_offset feedback (rx_sdrplay.cpp:163-176)."""
    flat, samples = _waveform()
    dev = devices.SimulatedDevice(samples, lo_offset_hz=60e3, snr_db=30)
    sr = devices.StreamingReceiver(dev)
    got = []
    stats = sr.run(ts_sink=got.append, max_blocks=1)
    assert stats.retune_requests == 1
    assert abs(dev.lo_offset_hz) < 200.0
    assert stats.frames_decoded >= 2
    ts = np.concatenate(got) if got else np.zeros(0, np.uint8)
    np.testing.assert_array_equal(ts, flat[:len(ts)])
    # second pass after the retune: no further retune needed
    dev.pos = 0
    stats2 = sr.run(ts_sink=got.append, max_blocks=1)
    assert stats2.retune_requests == 0
    assert stats2.frames_decoded >= 2


def test_file_device_roundtrip(tmp_path):
    from sdr_receiver_dvb_t2_tpu.io import iq as iqio
    flat, samples = _waveform()
    path = str(tmp_path / "cap.cf32")
    iqio.write_iq(path, samples)
    dev = devices.FileDevice(path)
    dev.init(frequency_hz=626e6)
    sr = devices.StreamingReceiver(dev)
    got = []
    stats = sr.run(ts_sink=got.append)
    assert stats.frames_decoded >= 2
    ts = np.concatenate(got)
    np.testing.assert_array_equal(ts, flat[:len(ts)])


def test_vendor_device_raises_without_library(monkeypatch):
    monkeypatch.delenv("T2_MIR_SDR_LIB", raising=False)
    from sdr_receiver_dvb_t2_tpu.io import vendor
    with pytest.raises(RuntimeError, match="vendor library"):
        vendor.SdrplayDevice()


def test_signal_estimate_gain_step():
    flat, samples = _waveform()
    dev = devices.SimulatedDevice(samples, gain_db=0.0)
    dev.init(626e6)
    dev.apply(devices.SignalEstimate(gain_offset=-6.0, change_gain=True))
    assert dev.gain_steps == 1 and dev.gain_db == -6.0
