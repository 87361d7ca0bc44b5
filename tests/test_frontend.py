"""Front-end tests: resampler fidelity and full device-rate e2e decode."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    PLPParams, SAMPLE_RATE, T2Params)
from sdr_receiver_dvb_t2_tpu.rx import frontend as fe
from sdr_receiver_dvb_t2_tpu.rx.receiver import T2Receiver
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator


def test_farrow_resample_tone_fidelity():
    """A pure tone resampled 9.2 -> 9.142857 Msps keeps frequency & SNR."""
    fs_in = 9.2e6
    f0 = 0.7e6
    n = 40000
    t = np.arange(n) / fs_in
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    y = fe.farrow_resample(x, fs_in / SAMPLE_RATE)
    t2 = np.arange(len(y)) / SAMPLE_RATE
    ref = np.exp(2j * np.pi * f0 * t2)
    err = y[100:-100] - ref[100:len(y) - 100]
    snr = 10 * np.log10(1.0 / np.mean(np.abs(err) ** 2))
    assert snr > 50, snr


def test_dc_and_iq_imbalance_estimation():
    rng = np.random.default_rng(0)
    clean = (rng.normal(size=50000) + 1j * rng.normal(size=50000)
             ).astype(np.complex64)
    g_true, c_true = 1.1, 0.06
    i, q = np.real(clean), np.imag(clean)
    # impose amplitude imbalance and quadrature leakage, plus DC
    dirty = (i + 1j * (q / g_true + c_true * i)) + (0.2 - 0.1j)
    x, dc = fe.remove_dc(dirty)
    assert abs(dc - (0.2 - 0.1j)) < 0.02
    g, c = fe.estimate_iq_imbalance(x)
    fixed = fe.correct_iq_imbalance(x, g, c)
    g2, c2 = fe.estimate_iq_imbalance(fixed)
    assert abs(g2 - 1.0) < 0.01 and abs(c2) < 0.01


def test_fir_decimate_passband():
    fs = 2 * SAMPLE_RATE
    f0 = 1.0e6
    t = np.arange(60000) / fs
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    y = fe.fir_decimate(x, 2)
    # power preserved in passband
    assert abs(np.mean(np.abs(y) ** 2) - 1.0) < 0.01


def test_e2e_from_device_rate_capture():
    """Modulate at elementary rate, pretend the SDR sampled it at 9.2 Msps,
    run the front end + receiver: TS must still be bit-exact."""
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=3,
                    time_il_length=1)
    mod = T2Modulator(p, [plp])
    rng = np.random.default_rng(5)
    ts = rng.integers(0, 256, (mod.packets_needed(1) + 4, 188)
                      ).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    out = mod.modulate(ts.reshape(-1), 1)
    # simulate a 9.2 Msps capture of the 9.142857 Msps signal:
    # resample up by 9.2/9.142857 (device samples more often); the capture
    # has trailing silence as a real recording would
    padded = np.concatenate(
        [out.samples, np.zeros(4096, np.complex64)])
    capture = fe.farrow_resample(padded, SAMPLE_RATE / 9.2e6)
    # front end back to elementary rate
    x = fe.device_to_elementary(capture, 9.2e6)
    res = T2Receiver().receive(x)
    got = res.ts
    flat = ts.reshape(-1)
    assert len(got) > 0
    np.testing.assert_array_equal(got, flat[:len(got)])


@pytest.mark.parametrize("sco_ppm", [10, 60, -120])
def test_e2e_sample_clock_offset(sco_ppm):
    """Captures with a wrong sample clock: measured via pilot-slope timing
    drift, corrected with one windowed-sinc resample, TS bit-exact."""
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=3,
                    time_il_length=1)
    mod = T2Modulator(p, [plp])
    rng = np.random.default_rng(7)
    ts = rng.integers(0, 256, (mod.packets_needed(3) + 4, 188)
                      ).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    out = mod.modulate(ts.reshape(-1), 3)
    y = fe.sinc_resample(
        np.concatenate([out.samples, np.zeros(8192, np.complex64)]),
        1.0 + sco_ppm * 1e-6)
    res = T2Receiver().receive(y)
    got = res.ts
    assert res.stats.frames_decoded >= 2
    assert abs(res.stats.sco_ppm + sco_ppm) < 5
    np.testing.assert_array_equal(got, ts.reshape(-1)[:len(got)])


def test_sinc_resampler_band_edge_quality():
    fs = SAMPLE_RATE
    t = np.arange(50000) / fs
    x = np.exp(2j * np.pi * 3.8e6 * t).astype(np.complex64)
    ratio = 1.0 + 60e-6
    y = fe.sinc_resample(x, ratio)
    tk = (np.arange(len(y)) * ratio + 12) / fs
    ref = np.exp(2j * np.pi * 3.8e6 * tk)
    err = y[100:-100] - ref[100:len(y) - 100]
    snr = 10 * np.log10(1.0 / np.mean(np.abs(err) ** 2))
    assert snr > 35, snr
