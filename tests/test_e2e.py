"""End-to-end golden tests: TS -> modulator -> channel -> receiver -> TS.

This is the north-star gate from SURVEY.md §7 step 4: bit-exact TS recovery
through the complete chain, under impairments inside the operating envelope.
Small FFT/short-FEC configs keep CI fast; the 32K headline mode is exercised
by bench.py on hardware.
"""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    PLPParams, T2Params)
from sdr_receiver_dvb_t2_tpu.rx.receiver import T2Receiver
from sdr_receiver_dvb_t2_tpu.tx.modulator import (T2Modulator, apply_cfo,
                                                  awgn)


def make_ts(n, seed=0):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 256, (n, 188)).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    return ts


def small_config(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                 rotated=True, hem=False, n_data=9):
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=n_data)
    plp = PLPParams(constellation=constellation, rate=rate,
                    fec_frame=FECFrame.SHORT, rotated=rotated,
                    num_blocks_max=3, time_il_length=1)
    return p, plp


def run_loopback(p, plp, n_frames=2, channel=None, hem=False, seed=0,
                 receiver=None):
    mod = T2Modulator(p, [plp], hem=hem)
    ts = make_ts(mod.packets_needed(n_frames) + 4, seed=seed)
    out = mod.modulate(ts.reshape(-1), n_frames)
    y = out.samples if channel is None else channel(out.samples)
    res = (receiver or T2Receiver()).receive(y)
    return ts.reshape(-1), res


def test_e2e_noiseless_bit_exact():
    p, plp = small_config()
    flat, res = run_loopback(p, plp)
    assert res.stats.frames_decoded == 2
    got = res.ts
    assert len(got) >= 20 * 188
    np.testing.assert_array_equal(got, flat[:len(got)])
    assert res.stats.ts_errors == 0


def test_e2e_awgn_20db_bit_exact():
    p, plp = small_config()
    flat, res = run_loopback(p, plp, channel=lambda s: awgn(s, 20, seed=1))
    assert res.stats.frames_decoded == 2
    got = res.ts
    assert len(got) > 0
    np.testing.assert_array_equal(got, flat[:len(got)])
    # SNR estimate should be in the right ballpark
    assert 15 < np.mean(res.stats.snr_db) < 26


def test_e2e_cfo_corrected():
    p, plp = small_config()
    flat, res = run_loopback(
        p, plp, channel=lambda s: awgn(apply_cfo(s, 2000.0), 22, seed=2))
    assert res.stats.frames_decoded >= 1
    assert abs(res.stats.cfo_hz - 2000.0) < 50
    got = res.ts
    np.testing.assert_array_equal(got, flat[:len(got)])


def test_e2e_hem_mode():
    p, plp = small_config()
    flat, res = run_loopback(p, plp, hem=True)
    got = res.ts
    assert len(got) > 0
    np.testing.assert_array_equal(got, flat[:len(got)])


def test_e2e_qpsk_nonrotated():
    p, plp = small_config(constellation=Constellation.QPSK, rotated=False)
    flat, res = run_loopback(p, plp)
    got = res.ts
    np.testing.assert_array_equal(got, flat[:len(got)])


def test_e2e_qam64():
    p, plp = small_config(constellation=Constellation.QAM64,
                          rate=CodeRate.C2_3)
    flat, res = run_loopback(p, plp, n_frames=1)
    got = res.ts
    assert len(got) > 0
    np.testing.assert_array_equal(got, flat[:len(got)])


def test_e2e_qam256_normal_fec():
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=11)
    plp = PLPParams(constellation=Constellation.QAM256, rate=CodeRate.C2_3,
                    fec_frame=FECFrame.NORMAL, num_blocks_max=1,
                    time_il_length=1)
    flat, res = run_loopback(p, plp, n_frames=1)
    got = res.ts
    assert len(got) > 0
    np.testing.assert_array_equal(got, flat[:len(got)])


def test_e2e_1k_fft():
    p = T2Params(fft_mode=FFTMode.FFT_1K, guard=GuardInterval.GI_1_16,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=60)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=2,
                    time_il_length=1)
    flat, res = run_loopback(p, plp, n_frames=1)
    got = res.ts
    assert len(got) > 0
    np.testing.assert_array_equal(got, flat[:len(got)])


def test_e2e_multi_ti_blocks():
    p, plp0 = small_config()
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=3,
                    time_il_length=2)  # 3 FEC blocks over 2 TI blocks: 1+2
    flat, res = run_loopback(p, plp)
    got = res.ts
    assert len(got) > 0
    np.testing.assert_array_equal(got, flat[:len(got)])


def test_e2e_two_plps():
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plps = [PLPParams(plp_id=0, constellation=Constellation.QAM16,
                      rate=CodeRate.C1_2, fec_frame=FECFrame.SHORT,
                      num_blocks_max=2, time_il_length=1),
            PLPParams(plp_id=1, constellation=Constellation.QPSK,
                      rate=CodeRate.C1_2, fec_frame=FECFrame.SHORT,
                      rotated=False, num_blocks_max=1, time_il_length=1)]
    mod = T2Modulator(p, plps)
    ts = make_ts(mod.packets_needed(1) + 6, seed=3)
    out = mod.modulate(ts.reshape(-1), 1)
    # PLP filter: decode only PLP 1
    res = T2Receiver(plp_filter=1).receive(out.samples)
    assert res.stats.frames_decoded == 1
    got = res.ts
    assert len(got) > 0
    # PLP1's packets are a contiguous later chunk of the source TS
    flat = ts.reshape(-1, 188)
    src = {p_.tobytes() for p_ in flat}
    for pkt in res.ts.reshape(-1, 188):
        assert pkt.tobytes() in src


def test_no_signal_returns_empty():
    """Noise-only capture: the receiver reports no frames (the reference
    pops its bad_signal dialog and stops, main_window.cpp:323-331)."""
    rng = np.random.default_rng(9)
    noise = (rng.normal(size=300000)
             + 1j * rng.normal(size=300000)).astype(np.complex64)
    res = T2Receiver().receive(noise)
    assert res.stats.frames_decoded == 0
    assert len(res.ts) == 0


def test_e2e_16k_fft():
    p = T2Params(fft_mode=FFTMode.FFT_16K, guard=GuardInterval.GI_1_16,
                 pilot_pattern=PilotPattern.PP3, extended_carrier=False,
                 n_data=5)
    plp = PLPParams(constellation=Constellation.QAM64, rate=CodeRate.C3_4,
                    fec_frame=FECFrame.SHORT, num_blocks_max=3,
                    time_il_length=1)
    flat, res = run_loopback(p, plp, n_frames=1)
    got = res.ts
    assert len(got) > 0
    np.testing.assert_array_equal(got, flat[:len(got)])


def test_e2e_miso_bit_exact():
    """MISO loopback: two TX groups over distinct frequency-selective
    channels summed at one RX antenna; dual channel estimation from the
    inverted-pilot subsets + Alamouti pair decode recovers the TS.
    Exceeds the reference, which is SISO-only (README.md:17-23)."""
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
    assert out.samples2 is not None

    # group 1: mild 2-tap channel; group 2: attenuated, rotated, delayed
    def ch(x, taps):
        return np.convolve(x, taps)[:len(x)].astype(np.complex64)

    y = (ch(out.samples, [1.0, 0.08j])
         + ch(out.samples2, [0.0, 0.0, 0.6 * np.exp(0.7j), -0.05]))
    y = awgn(y, 28, seed=3)
    res = T2Receiver().receive(y)
    assert res.params is not None and res.params.miso
    assert res.stats.frames_decoded == 2
    got = res.ts
    assert len(got) > 0
    flat = ts.reshape(-1)
    np.testing.assert_array_equal(got, flat[:len(got)])


def test_e2e_tr_papr_reduction():
    """Tone-reservation PAPR: peak power drops measurably and the receiver
    (which skips reserved tones) still recovers the TS bit-exact."""
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import PAPR
    import dataclasses
    p, plp = small_config()
    p_tr = dataclasses.replace(p, papr=PAPR.TR)
    mod_tr = T2Modulator(p_tr, [plp])
    ts = make_ts(mod_tr.packets_needed(1) + 4, seed=11)
    out_tr = mod_tr.modulate(ts.reshape(-1), 1)

    def papr_db(x):
        pk = np.max(np.abs(x) ** 2)
        return 10 * np.log10(pk / np.mean(np.abs(x) ** 2))

    # same content without the TR cancellation values
    import sdr_receiver_dvb_t2_tpu.tx.ofdm as txofdm
    orig = txofdm.tr_papr_reduce
    try:
        txofdm.tr_papr_reduce = lambda p, spec, sym, idx, **kw: sym
        out_off = T2Modulator(p_tr, [plp]).modulate(ts.reshape(-1), 1)
    finally:
        txofdm.tr_papr_reduce = orig
    body = slice(2048, None)
    assert papr_db(out_tr.samples[body]) < papr_db(out_off.samples[body]) - 1.0

    res = T2Receiver().receive(out_tr.samples)
    assert res.stats.frames_decoded == 1
    flat = ts.reshape(-1)
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])


def test_e2e_l1_repetition_survives_corrupt_p2():
    """L1 repetition (clause 7.2.3.1): each frame carries the next frame's
    dynamic block.  Corrupt the middle frame's P2 region so its L1-post CRC
    fails; the receiver continues that frame from the previous frame's
    dyn_next instead of resetting (the reference resets the whole chain,
    dvbt2_demodulator.cpp:418-425)."""
    p, plp = small_config()
    mod = T2Modulator(p, [plp], l1_repetition=True)
    ts = make_ts(mod.packets_needed(3) + 4, seed=13)
    out = mod.modulate(ts.reshape(-1), 3)
    assert out.l1pre.l1_repetition_flag == 1
    y = out.samples.copy()
    # clobber frame 1's P2 symbols (after its P1)
    f1 = p.frame_samples
    rng = np.random.default_rng(5)
    n_p2_samples = p.n_p2 * p.symbol_size
    seg = slice(f1 + 2048, f1 + 2048 + n_p2_samples)
    y[seg] += (rng.normal(0, 3.0, n_p2_samples)
               + 1j * rng.normal(0, 3.0, n_p2_samples)).astype(np.complex64)
    res = T2Receiver().receive(y)
    assert res.stats.l1_failures >= 1
    assert res.stats.frames_decoded == 3
    # frame 0's packets must still be bit-exact at the head of the stream
    flat = ts.reshape(-1)
    n_check = 10 * 188
    np.testing.assert_array_equal(res.ts[:n_check], flat[:n_check])


def test_e2e_l1_repetition_clean_roundtrip():
    p, plp = small_config()
    mod = T2Modulator(p, [plp], l1_repetition=True)
    ts = make_ts(mod.packets_needed(2) + 4, seed=14)
    out = mod.modulate(ts.reshape(-1), 2)
    res = T2Receiver().receive(out.samples)
    assert res.stats.frames_decoded == 2
    assert res.l1post is not None and res.l1post.dyn_next is not None
    flat = ts.reshape(-1)
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])


def test_e2e_ace_papr_reduction():
    """ACE (clause 9.6.1): clip-and-filter with extend-outward projection
    on data cells. Peak power drops and the receiver stays bit-exact (the
    extension only increases LLR confidence on outer points)."""
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import PAPR
    import dataclasses
    p, plp = small_config(constellation=Constellation.QAM16, rotated=False)
    p_ace = dataclasses.replace(p, papr=PAPR.ACE)
    mod = T2Modulator(p_ace, [plp])
    ts = make_ts(mod.packets_needed(1) + 4, seed=17)
    out_ace = mod.modulate(ts.reshape(-1), 1)
    mod0 = T2Modulator(p, [plp])
    out0 = mod0.modulate(ts.reshape(-1), 1)

    def papr_db(x):
        return 10 * np.log10(np.max(np.abs(x) ** 2)
                             / np.mean(np.abs(x) ** 2))

    body = slice(2048, None)
    assert papr_db(out_ace.samples[body]) < papr_db(out0.samples[body]) - 0.4

    res = T2Receiver().receive(awgn(out_ace.samples, 25, seed=4))
    assert res.stats.frames_decoded == 1
    flat = ts.reshape(-1)
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])


def test_e2e_type2_plps_sub_sliced():
    """Type-2 PLPs: each interleaving frame's cells split into SUB_SLICES
    round-robin sub-slices interleaved with the other type-2 PLPs
    (clause 8.3.6.3); the receiver re-gathers them via SUB_SLICE_INTERVAL.
    Mirrors the reference's multi-PLP slice switching
    (time_deinterleaver.cpp:354-366)."""
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
    assert out.l1post_frames[0].sub_slices_per_frame == 3
    assert out.l1post_frames[0].dyn.sub_slice_interval > 0
    flat = ts.reshape(-1, 188)
    src = {pkt.tobytes() for pkt in flat}
    for pid in (0, 1, 2):
        res = T2Receiver(plp_filter=pid).receive(out.samples)
        assert res.stats.frames_decoded == 2, pid
        assert len(res.ts) >= 188, pid
        assert res.stats.ts_errors == 0, pid
        for pkt in res.ts.reshape(-1, 188):
            assert pkt.tobytes() in src


# EN 302 755 table-54/55-legal mode combos covering EVERY pilot pattern,
# extended-carrier operation, and MISO on a PP != 1 pattern — the modes
# where per-PP amplitude/CP-set bugs hide (pilot_generator.cpp:376-2166,
# dvbt2_definition.cpp:161-648).  PP1/PP3 are covered by the tests above.
_PP_MATRIX = [
    ("pp2_16k", FFTMode.FFT_16K, GuardInterval.GI_1_8, PilotPattern.PP2,
     False, False, 6),
    ("pp4_8k", FFTMode.FFT_8K, GuardInterval.GI_1_32, PilotPattern.PP4,
     False, False, 9),
    ("pp4_8k_ext", FFTMode.FFT_8K, GuardInterval.GI_1_32, PilotPattern.PP4,
     True, False, 9),
    ("pp5_16k", FFTMode.FFT_16K, GuardInterval.GI_1_16, PilotPattern.PP5,
     False, False, 6),
    ("pp6_32k", FFTMode.FFT_32K, GuardInterval.GI_1_32, PilotPattern.PP6,
     False, False, 4),
    ("pp6_32k_ext", FFTMode.FFT_32K, GuardInterval.GI_1_32,
     PilotPattern.PP6, True, False, 4),
    ("pp7_8k", FFTMode.FFT_8K, GuardInterval.GI_1_128, PilotPattern.PP7,
     False, False, 9),
    ("pp8_8k", FFTMode.FFT_8K, GuardInterval.GI_1_16, PilotPattern.PP8,
     False, False, 18),
    ("pp2_8k_miso", FFTMode.FFT_8K, GuardInterval.GI_1_8, PilotPattern.PP2,
     False, True, 9),
]


@pytest.mark.parametrize("name,fft,gi,pp,ext,miso,n_data", _PP_MATRIX,
                         ids=[c[0] for c in _PP_MATRIX])
def test_e2e_pilot_pattern_matrix(name, fft, gi, pp, ext, miso, n_data):
    """Blind-acquisition loopback (mode scan included) across the full
    pilot-pattern set, extended carriers and MISO on PP2: TS bit-exact."""
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import Preamble
    p = T2Params(fft_mode=fft, guard=gi, pilot_pattern=pp,
                 extended_carrier=ext, n_data=n_data, miso=miso,
                 preamble=Preamble.T2_MISO if miso else Preamble.T2_SISO)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=2,
                    time_il_length=1)
    flat, res = run_loopback(p, plp, n_frames=1)
    assert res.stats.frames_decoded == 1
    assert res.stats.ts_errors == 0
    assert res.params.pilot_pattern == pp
    assert res.params.extended_carrier == ext
    assert res.params.miso == miso
    assert len(res.ts) >= 4 * 188
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])


@pytest.mark.parametrize("fft_mode,gi,pp,n_data", [
    (FFTMode.FFT_2K, GuardInterval.GI_1_16, PilotPattern.PP3, 16),
    (FFTMode.FFT_4K, GuardInterval.GI_1_16, PilotPattern.PP3, 10),
])
def test_e2e_2k_4k_fft(fft_mode, gi, pp, n_data):
    """2K and 4K FFT modes end-to-end (completing 1K..32K coverage)."""
    p = T2Params(fft_mode=fft_mode, guard=gi, pilot_pattern=pp,
                 extended_carrier=False, n_data=n_data)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=2,
                    time_il_length=1)
    flat, res = run_loopback(p, plp, n_frames=1)
    assert res.stats.frames_decoded == 1
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])


def test_e2e_siso_multipath_channel():
    """Frequency-selective SISO channel inside the GI: the pilot-aided
    one-tap equalizer recovers the TS bit-exact (the reference's
    operating scenario for terrestrial echoes)."""
    p, plp = small_config()
    rng = np.random.default_rng(31)

    def ch(x):
        taps = np.zeros(40, np.complex64)
        taps[0] = 1.0
        taps[7] = 0.35 * np.exp(1.1j)
        taps[23] = 0.2 * np.exp(-2.3j)
        y = np.convolve(x, taps)[:len(x)].astype(np.complex64)
        return awgn(y, 27, seed=6)

    flat, res = run_loopback(p, plp, n_frames=2, channel=ch)
    assert res.stats.frames_decoded == 2
    assert res.stats.ts_errors == 0
    np.testing.assert_array_equal(res.ts, flat[:len(res.ts)])
