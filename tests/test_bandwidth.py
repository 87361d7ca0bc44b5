"""Channel-bandwidth generalization (EN 302 755 elementary periods).

The reference application is hardwired to the 8 MHz elementary rate of
9.142857 Msps (`/root/reference/src/DVB_T2/dvbt2_definition.h:29-31`); here
every bandwidth the standard defines (1.7/5/6/7/8/10 MHz) is a first-class
mode: the sample-domain demod is bandwidth-invariant, and the Hz boundaries
(CFO reporting/derotation, retune feedback, front-end resampling) scale by
the declared elementary rate.  1.7 MHz is the T2-Lite mobile/audio channel
raster, so this composes with the T2-Lite profile support."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    Bandwidth, CodeRate, Constellation, FECFrame, FFTMode, GuardInterval,
    PilotPattern, PLPParams, SAMPLE_RATE, T2Params)
from sdr_receiver_dvb_t2_tpu.io import devices
from sdr_receiver_dvb_t2_tpu.rx import frontend
from sdr_receiver_dvb_t2_tpu.rx.receiver import T2Receiver
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator


def test_bandwidth_rates():
    assert Bandwidth.BW_8.t_period == pytest.approx(7 / 64 * 1e-6)
    assert Bandwidth.BW_8.sample_rate == pytest.approx(SAMPLE_RATE)
    assert Bandwidth.BW_1_7.sample_rate == pytest.approx(131 / 71 * 1e6)
    assert Bandwidth.BW_5.sample_rate == pytest.approx(40 / 7 * 1e6)
    assert Bandwidth.BW_10.sample_rate == pytest.approx(80 / 7 * 1e6)
    assert Bandwidth.from_mhz(1.7) is Bandwidth.BW_1_7
    assert Bandwidth.from_rate(9.14e6) is Bandwidth.BW_8
    assert Bandwidth.from_rate(5.0e6) is None   # a device rate, not a BW
    with pytest.raises(ValueError):
        Bandwidth.from_mhz(3.0)
    # the sample-domain mode structure is bandwidth-invariant: only the
    # seconds<->samples scale changes
    import dataclasses
    p8 = T2Params(fft_mode=FFTMode.FFT_8K, n_data=9,
                  pilot_pattern=PilotPattern.PP1,
                  guard=GuardInterval.GI_1_32, extended_carrier=False)
    p17 = dataclasses.replace(p8, bandwidth=Bandwidth.BW_1_7)
    assert p17.frame_samples == p8.frame_samples
    assert p17.sample_rate == pytest.approx(131 / 71 * 1e6)
    assert p8.sample_rate == pytest.approx(SAMPLE_RATE)


def _waveform(n_frames=3, seed=7, bandwidth=Bandwidth.BW_8):
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9, bandwidth=bandwidth)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=3,
                    time_il_length=1)
    mod = T2Modulator(p, [plp])
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 256, (mod.packets_needed(n_frames) + 4, 188)
                      ).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    out = mod.modulate(ts.reshape(-1), n_frames)
    return ts.reshape(-1), out.samples, p


def test_one_shot_1p7mhz_reports_true_hz_cfo():
    """A 1.7 MHz channel with a true +180 Hz LO error: the receiver built
    with the lite elementary rate decodes bit-exact and reports the CFO in
    TRUE Hz (an 8 MHz-assuming receiver would report ~892 Hz)."""
    flat, samples, _ = _waveform(3, bandwidth=Bandwidth.BW_1_7)
    fs = Bandwidth.BW_1_7.sample_rate
    cfo_true = 180.0
    n = np.arange(len(samples))
    x = (samples * np.exp(2j * np.pi * cfo_true * n / fs)
         ).astype(np.complex64)
    rx = T2Receiver(fs=fs)
    res = rx.receive(x)
    assert res.stats.frames_decoded == 3
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])
    assert len(res.ts) > 0
    assert res.stats.cfo_hz == pytest.approx(cfo_true, abs=20.0)
    # the discovered mode carries the declared bandwidth
    assert res.params.bandwidth is Bandwidth.BW_1_7


def test_streaming_5mhz_lo_offset_closed_loop():
    """Streaming at the 5 MHz elementary rate (5.714 Msps): the CFO loop
    measures/corrects a 150 Hz LO offset in true Hz against a device
    mixing at the 5 MHz rate."""
    flat, samples, _ = _waveform(6, bandwidth=Bandwidth.BW_5)
    fs = Bandwidth.BW_5.sample_rate
    dev = devices.SimulatedDevice(samples, lo_offset_hz=150.0, snr_db=32,
                                  sample_rate=fs)
    rx = T2Receiver(fs=fs)
    got = []
    sr = devices.StreamingReceiver(dev, rx, acq_seconds=0.045,
                                   block_seconds=0.012)
    st = sr.run(ts_sink=got.append)
    ts = np.concatenate(got) if got else np.zeros(0, np.uint8)
    assert st.frames_decoded >= 5
    assert st.ts_errors == 0
    np.testing.assert_array_equal(ts, flat[:len(ts)])
    assert len(ts) > 0
    # total CFO state (NCO + retunes) ~ the true LO offset, in true Hz
    assert st.cfo_hz == pytest.approx(150.0, abs=25.0)


def test_device_capture_resampled_to_lite_rate():
    """A 4 Msps device capture of a 1.7 MHz channel: device_to_elementary
    resamples to the lite elementary rate (not 9.14 Msps) and the stream
    decodes."""
    flat, samples, _ = _waveform(3, bandwidth=Bandwidth.BW_1_7)
    fs = Bandwidth.BW_1_7.sample_rate
    dev_rate = 4.0e6
    # synthesize the device capture: upsample the elementary-rate stream
    x_dev = frontend.farrow_resample(samples.astype(np.complex64),
                                     fs / dev_rate)
    x = frontend.device_to_elementary(x_dev, dev_rate, target_rate=fs)
    res = T2Receiver(fs=fs).receive(x)
    assert res.stats.frames_decoded >= 2
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])
    assert len(res.ts) > 0


def test_lite_mux_at_1p7mhz_both_services():
    """The flagship narrow-band story: a base + T2-Lite FEF multiplex on
    the 1.7 MHz mobile raster with a real 60 Hz LO error.  Both services
    decode bit-exact from the same capture with receivers declared at the
    lite elementary rate; the base receiver reports the CFO in true Hz."""
    import dataclasses
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import Preamble
    from sdr_receiver_dvb_t2_tpu.tx import mux as txmux

    fs = Bandwidth.BW_1_7.sample_rate
    base_p0 = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                       pilot_pattern=PilotPattern.PP1,
                       extended_carrier=False, n_data=9,
                       bandwidth=Bandwidth.BW_1_7)
    lite_p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                      pilot_pattern=PilotPattern.PP1,
                      extended_carrier=False, n_data=4,
                      preamble=Preamble.T2_LITE_SISO,
                      bandwidth=Bandwidth.BW_1_7,
                      fef=(0, 2 * base_p0.frame_samples, 1))
    base_p = dataclasses.replace(
        base_p0, fef=(0, lite_p.frame_samples, 2))
    plp_b = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                      fec_frame=FECFrame.SHORT, num_blocks_max=3,
                      time_il_length=1)
    plp_l = PLPParams(constellation=Constellation.QPSK, rate=CodeRate.C1_2,
                      fec_frame=FECFrame.SHORT, rotated=False,
                      num_blocks_max=1, time_il_length=1)
    m = txmux.BaseLiteMux(base_p, [plp_b], lite_p, [plp_l])

    def mk_ts(mod, n_frames, seed):
        rng = np.random.default_rng(seed)
        ts = rng.integers(0, 256, (mod.packets_needed(n_frames) + 4, 188)
                          ).astype(np.uint8)
        ts[:, 0] = 0x47
        ts[:, 1] &= 0x7F
        return ts.reshape(-1)

    n_base = 4
    ts_base = mk_ts(m.base_mod, n_base, 31)
    ts_lite = mk_ts(m.lite_mod, m.lite_frames_for(n_base), 32)
    samples, _, _ = m.modulate(ts_base, ts_lite, n_base)
    # real captures do not end exactly on the frame grid: pad the tail so
    # the spurious sub-ppm SCO resample the CFO induces cannot push the
    # final lite frame (the last thing in the mux) past the buffer end
    samples = np.concatenate([samples, np.zeros(4096, samples.dtype)])
    n = np.arange(len(samples))
    x = (samples * np.exp(2j * np.pi * 60.0 * n / fs)).astype(np.complex64)

    res_b = T2Receiver(fs=fs).receive(x)
    assert res_b.stats.frames_decoded == n_base
    np.testing.assert_array_equal(res_b.ts, ts_base[:len(res_b.ts)])
    assert len(res_b.ts) > 0
    assert res_b.stats.cfo_hz == pytest.approx(60.0, abs=15.0)

    res_l = T2Receiver(profile="lite", fs=fs).receive(x)
    assert res_l.stats.frames_decoded == m.lite_frames_for(n_base)
    np.testing.assert_array_equal(res_l.ts, ts_lite[:len(res_l.ts)])
    assert len(res_l.ts) > 0


def test_streaming_wide_device_narrow_bandwidth_decimates():
    """A 10 Msps front end feeding a 1.7 MHz channel (ratio 5.4): the
    streaming chain inserts per-octave anti-aliased decimators ahead of
    the interpolator (an unfiltered 5.4x resample would fold wideband
    noise into the channel).  Decodes bit-exact at 24 dB in-channel SNR."""
    flat, samples, _ = _waveform(5, bandwidth=Bandwidth.BW_1_7)
    fs = Bandwidth.BW_1_7.sample_rate
    dev_rate = 10.0e6
    x_dev = frontend.farrow_resample(samples.astype(np.complex64),
                                     fs / dev_rate)
    # wideband noise at the device rate: the out-of-band part must be
    # filtered out, not folded in (in-channel SNR stays ~24 dB)
    rng = np.random.default_rng(4)
    nv = 10.0 ** (-24.0 / 10.0) * (dev_rate / fs)
    x_dev = (x_dev * np.sqrt(dev_rate / fs)  # keep in-channel level
             + (rng.normal(0, np.sqrt(nv / 2), len(x_dev))
                + 1j * rng.normal(0, np.sqrt(nv / 2), len(x_dev)))
             ).astype(np.complex64)
    dev = devices.SimulatedDevice(x_dev, sample_rate=dev_rate)
    rx = T2Receiver(fs=fs)
    got = []
    sr = devices.StreamingReceiver(dev, rx, agc=False, acq_seconds=0.06,
                                   block_seconds=0.012)
    st = sr.run(ts_sink=got.append)
    ts = np.concatenate(got) if got else np.zeros(0, np.uint8)
    assert st.frames_decoded >= 4
    assert st.ts_errors == 0
    np.testing.assert_array_equal(ts, flat[:len(ts)])
    assert len(ts) > 0


def test_stream_cli_file_bandwidth(tmp_path):
    """t2rx --stream --bandwidth 1.7 on a lite-rate capture: the
    FileDevice must take the declared rate (a 9.14 Msps default would
    resample the capture to mush)."""
    from sdr_receiver_dvb_t2_tpu.rx import cli as rxcli
    flat, samples, _ = _waveform(5, bandwidth=Bandwidth.BW_1_7)
    cap = tmp_path / "cap17.cf32"
    samples.astype(np.complex64).tofile(cap)
    out = tmp_path / "out.ts"
    rc = rxcli.main([str(cap), "--stream", "--bandwidth", "1.7",
                     "--platform", "cpu", "--no-agc",
                     "--out", str(out)])
    assert rc == 0
    got = np.fromfile(out, np.uint8)
    assert len(got) > 0
    np.testing.assert_array_equal(got, flat[:len(got)])
