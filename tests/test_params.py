"""Mode-math golden tests vs. the ETSI tables hard-coded in the reference
(`dvbt2_definition.cpp:20-648`)."""
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    CodeRate, FECFrame, FFTMode, GuardInterval, PilotPattern, T2Params,
    fec_params)


def test_p2_params_per_fft_mode():
    # dvbt2_definition.cpp:20-91 (SISO column)
    expect = {
        FFTMode.FFT_1K: (16, 558), FFTMode.FFT_2K: (8, 1118),
        FFTMode.FFT_4K: (4, 2236), FFTMode.FFT_8K: (2, 4472),
        FFTMode.FFT_16K: (1, 8944), FFTMode.FFT_32K: (1, 22432),
    }
    for mode, (n_p2, c_p2) in expect.items():
        p = T2Params(fft_mode=mode, guard=GuardInterval.GI_1_32,
                     pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                     miso=False)
        assert p.n_p2 == n_p2
        assert p.c_p2 == c_p2


def test_p2_params_miso():
    expect = {FFTMode.FFT_32K: 17612, FFTMode.FFT_16K: 8814,
              FFTMode.FFT_8K: 4398}
    for mode, c_p2 in expect.items():
        p = T2Params(fft_mode=mode, guard=GuardInterval.GI_1_32,
                     pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                     miso=True)
        assert p.c_p2 == c_p2


def test_k_total_normal_and_extended():
    # dvbt2_definition.cpp:93-159
    cases = {
        FFTMode.FFT_1K: (853, 853), FFTMode.FFT_2K: (1705, 1705),
        FFTMode.FFT_4K: (3409, 3409), FFTMode.FFT_8K: (6817, 6913),
        FFTMode.FFT_16K: (13633, 13921), FFTMode.FFT_32K: (27265, 27841),
    }
    for mode, (norm, ext) in cases.items():
        assert T2Params(fft_mode=mode, extended_carrier=False,
                        pilot_pattern=PilotPattern.PP1,
                        guard=GuardInterval.GI_1_32).k_total == norm
        assert T2Params(fft_mode=mode, extended_carrier=True,
                        pilot_pattern=PilotPattern.PP1,
                        guard=GuardInterval.GI_1_32).k_total == ext


def test_c_data_32k_headline_mode():
    # 32K extended PP7: c_data = 27404 (dvbt2_definition.cpp 32K ext table)
    p = T2Params()  # defaults: 32K, GI_1_128, PP7, extended
    assert p.c_data == 27404
    assert p.n_fc == 0  # GI_1_128+PP7 SISO has no frame-closing symbol
    assert p.guard_size == 256
    assert p.symbol_size == 33024


def test_c_data_16k():
    p = T2Params(fft_mode=FFTMode.FFT_16K, guard=GuardInterval.GI_1_16,
                 pilot_pattern=PilotPattern.PP3, extended_carrier=False)
    assert p.c_data == 12988
    assert p.n_fc == 11360
    assert p.c_fc == 7845


def test_fc_suppressed_combos():
    # (GI 1/32, PP4), (GI 1/16, PP2), (GI 19/256, PP2) SISO: no FC symbol
    for gi, pp in [(GuardInterval.GI_1_32, PilotPattern.PP4),
                   (GuardInterval.GI_1_16, PilotPattern.PP2),
                   (GuardInterval.GI_19_256, PilotPattern.PP2)]:
        p = T2Params(fft_mode=FFTMode.FFT_8K, guard=gi, pilot_pattern=pp,
                     extended_carrier=False)
        assert p.n_fc == 0 and not p.has_fc


def test_fec_params_table6a():
    f = fec_params(FECFrame.NORMAL, CodeRate.C2_3)
    assert (f.n_ldpc, f.k_ldpc, f.k_bch, f.q_ldpc) == (64800, 43200, 43040, 60)
    assert f.t_bch == 10
    f = fec_params(FECFrame.NORMAL, CodeRate.C1_2)
    assert (f.k_ldpc, f.k_bch, f.q_ldpc, f.t_bch) == (32400, 32208, 90, 12)
    f = fec_params(FECFrame.SHORT, CodeRate.C1_4)
    assert (f.n_ldpc, f.k_ldpc, f.k_bch, f.q_ldpc) == (16200, 3240, 3072, 36)
    assert f.t_bch == 12


def test_frame_geometry():
    p = T2Params(n_data=59)
    assert p.len_frame == 60  # n_p2=1 + 59
    assert p.frame_samples == 2048 + 60 * 33024


def test_hashable_static_arg():
    assert hash(T2Params()) == hash(T2Params())
    assert T2Params() == T2Params()
