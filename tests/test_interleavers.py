"""Interleaver address-map structural tests. Full behavioral verification
happens in the TX->RX loopback tests (the interleave/deinterleave pair must be
identity); here we pin the structural invariants each map must satisfy."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2 import interleavers as il
from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    T2Params, fec_params)


def _is_perm(a, n):
    return a.shape == (n,) and np.array_equal(np.sort(a), np.arange(n))


@pytest.mark.parametrize("mode,pp,gi", [
    (FFTMode.FFT_32K, PilotPattern.PP7, GuardInterval.GI_1_128),
    (FFTMode.FFT_16K, PilotPattern.PP3, GuardInterval.GI_1_16),
    (FFTMode.FFT_8K, PilotPattern.PP1, GuardInterval.GI_1_32),
    (FFTMode.FFT_2K, PilotPattern.PP1, GuardInterval.GI_1_32),
    (FFTMode.FFT_1K, PilotPattern.PP1, GuardInterval.GI_1_32),
])
def test_frequency_interleaver_is_permutation(mode, pp, gi):
    p = T2Params(fft_mode=mode, pilot_pattern=pp, guard=gi,
                 extended_carrier=(mode == FFTMode.FFT_32K))
    for kind in ("p2", "data") + (("fc",) if p.has_fc else ()):
        h_even, h_odd = il.fi_tx(p, kind)
        n = {"p2": p.c_p2, "data": p.c_data, "fc": p.n_fc}[kind]
        assert _is_perm(h_even, n)
        assert _is_perm(h_odd, n)
        inv_e, inv_o = il.fi_rx(p, kind)
        np.testing.assert_array_equal(h_even[inv_e], np.arange(n))
        np.testing.assert_array_equal(h_odd[inv_o], np.arange(n))


def test_fi_32k_single_sequence_property():
    # 32K uses one sequence: H_even = inverse(H_odd)
    p = T2Params()
    h_even, h_odd = il.fi_tx(p, "data")
    np.testing.assert_array_equal(h_odd[h_even], np.arange(len(h_even)))


@pytest.mark.parametrize("cells", [64800 // 8, 64800 // 6, 16200 // 2])
def test_cell_interleaver_perms(cells):
    perm = il.cell_interleaver_perm(cells, 4)
    assert perm.shape == (4, cells)
    for r in range(4):
        assert _is_perm(perm[r], cells)
    # shift-0 block equals the base sequence; different blocks differ
    assert not np.array_equal(perm[0], perm[1])


def test_cell_interleaver_shifts_bit_reversed():
    shifts = il.cell_interleaver_shifts(8100, 5)
    assert len(np.unique(shifts)) == 5
    assert (shifts < 8100).all()


def test_time_interleaver_roundtrip():
    cells_per_fec, n_fec = 8100, 3
    order = il.time_interleaver_perm(cells_per_fec, n_fec)
    assert _is_perm(order, cells_per_fec * n_fec)
    x = np.arange(cells_per_fec * n_fec)
    tx = x[order]
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order), dtype=np.int32)
    np.testing.assert_array_equal(tx[inv], x)


def test_q_delay_roundtrip():
    cells_per_fec, n_fec = 100, 3
    rng = np.random.default_rng(0)
    x = (rng.normal(size=n_fec * cells_per_fec)
         + 1j * rng.normal(size=n_fec * cells_per_fec)).astype(np.complex64)
    tx = il.q_delay_tx(x, cells_per_fec)
    ridx, qidx = il.q_delay_rx_indices(cells_per_fec, n_fec)
    rx = tx.real[ridx] + 1j * tx.imag[qidx]
    np.testing.assert_allclose(rx, x, rtol=1e-6)


@pytest.mark.parametrize("frame,rate", [(FECFrame.NORMAL, CodeRate.C1_2),
                                        (FECFrame.SHORT, CodeRate.C3_5)])
def test_parity_interleaver_is_permutation(frame, rate):
    fec = fec_params(frame, rate)
    perm = il.parity_interleaver_perm(fec.n_ldpc, fec.k_ldpc, fec.q_ldpc)
    assert _is_perm(perm, fec.n_ldpc)
    # data part untouched
    np.testing.assert_array_equal(perm[:fec.k_ldpc], np.arange(fec.k_ldpc))


@pytest.mark.parametrize("c,frame,rate", [
    (Constellation.QAM256, FECFrame.NORMAL, CodeRate.C2_3),
    (Constellation.QAM256, FECFrame.NORMAL, CodeRate.C3_5),
    (Constellation.QAM64, FECFrame.NORMAL, CodeRate.C3_4),
    (Constellation.QAM16, FECFrame.SHORT, CodeRate.C1_2),
    (Constellation.QPSK, FECFrame.NORMAL, CodeRate.C1_2),
])
def test_bit_interleaver_is_permutation(c, frame, rate):
    fec = fec_params(frame, rate)
    addr = il.bit_interleaver_perm(c, frame, rate)
    assert _is_perm(addr, fec.n_ldpc)
