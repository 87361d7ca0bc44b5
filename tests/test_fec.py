"""LDPC + BCH codec tests on synthetic codewords (SURVEY.md §4 test plan)."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2 import bch, ldpc
from sdr_receiver_dvb_t2_tpu.dvbt2.params import CodeRate, FECFrame, fec_params

RNG = np.random.default_rng(42)

ALL_CODES = [(FECFrame.NORMAL, r) for r in
             (CodeRate.C1_2, CodeRate.C3_5, CodeRate.C2_3, CodeRate.C3_4,
              CodeRate.C4_5, CodeRate.C5_6)] + \
            [(FECFrame.SHORT, r) for r in
             (CodeRate.C1_4, CodeRate.C1_2, CodeRate.C3_5, CodeRate.C2_3,
              CodeRate.C3_4, CodeRate.C4_5, CodeRate.C5_6)]


@pytest.mark.parametrize("frame,rate", ALL_CODES)
def test_ldpc_encode_valid_codeword(frame, rate):
    code = ldpc.get_code(frame, rate)
    fec = fec_params(frame, rate)
    assert code.n == fec.n_ldpc and code.k == fec.k_ldpc and code.q == fec.q_ldpc
    info = RNG.integers(0, 2, code.k).astype(np.uint8)
    cw = ldpc.encode(code, info)
    assert ldpc.check_syndrome(code, cw)
    # flipping any bit must break at least one check
    bad = cw.copy()
    bad[int(RNG.integers(code.n))] ^= 1
    assert not ldpc.check_syndrome(code, bad)


@pytest.mark.parametrize("frame,rate", [(FECFrame.SHORT, CodeRate.C1_2),
                                        (FECFrame.NORMAL, CodeRate.C2_3)])
def test_ldpc_minsum_decodes_noisy(frame, rate):
    code = ldpc.get_code(frame, rate)
    info = RNG.integers(0, 2, code.k).astype(np.uint8)
    cw = ldpc.encode(code, info)
    tx = 1.0 - 2.0 * cw.astype(np.float64)
    # moderately noisy channel well inside the code's operating point
    llr = 4.0 * tx + RNG.normal(0, 1.0, code.n)
    hard, conv = ldpc.decode_minsum_np(code, llr, iters=40)
    assert conv
    np.testing.assert_array_equal(hard, cw)


@pytest.mark.parametrize("frame,rate", [(FECFrame.NORMAL, CodeRate.C1_2),
                                        (FECFrame.NORMAL, CodeRate.C2_3),
                                        (FECFrame.SHORT, CodeRate.C3_5)])
def test_bch_roundtrip_and_correction(frame, rate):
    fec = fec_params(frame, rate)
    t = fec.t_bch
    info = RNG.integers(0, 2, fec.k_bch).astype(np.uint8)
    enc = bch.encode(frame, info, t)
    assert enc.shape[-1] == fec.n_bch == fec.k_ldpc
    assert not bch.syndromes(frame, enc, t).any()
    # correct exactly t errors
    corrupted = enc.copy()
    pos = RNG.choice(len(enc), t, replace=False)
    corrupted[pos] ^= 1
    dec, nfixed = bch.decode(frame, corrupted, t)
    assert nfixed == t
    np.testing.assert_array_equal(dec, enc)
    # t+2 errors: flagged uncorrectable (miscorrection astronomically unlikely
    # for this seed) — never silently wrong
    corrupted = enc.copy()
    pos = RNG.choice(len(enc), t + 2, replace=False)
    corrupted[pos] ^= 1
    _, nfixed = bch.decode(frame, corrupted, t)
    assert nfixed == -1


def test_bch_matches_polynomial_division():
    """Parity equals the remainder of x^parity * m(x) mod g(x) computed with a
    direct bit-serial LFSR (independent of the table-driven encoder)."""
    frame = FECFrame.SHORT
    f = bch.field(frame, 12)
    info = RNG.integers(0, 2, 3072).astype(np.uint8)
    enc = bch.encode(frame, info, 12)
    rem = 0
    mask = (1 << f.parity) - 1
    gen_low = f.gen_poly & mask
    for b in info:
        top = (rem >> (f.parity - 1)) & 1
        rem = ((rem << 1) & mask)
        if top ^ int(b):
            rem ^= gen_low
    expect = np.array([(rem >> (f.parity - 1 - i)) & 1
                       for i in range(f.parity)], dtype=np.uint8)
    np.testing.assert_array_equal(enc[3072:], expect)
