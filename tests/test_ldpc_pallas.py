"""QC layered LDPC decoder tests: layout transforms, XLA reference version,
and the Pallas kernel in interpreter mode (hardware path measured by bench)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sdr_receiver_dvb_t2_tpu.dvbt2 import ldpc as ldpcmod
from sdr_receiver_dvb_t2_tpu.dvbt2.params import CodeRate, FECFrame
from sdr_receiver_dvb_t2_tpu.ops import ldpc as jldpc
from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas as qc

RNG = np.random.default_rng(3)


def _noisy(frame, rate, b, snr_scale=3.0):
    code = ldpcmod.get_code(frame, rate)
    info = RNG.integers(0, 2, (b, code.k)).astype(np.uint8)
    cw = ldpcmod.encode(code, info)
    llr = (snr_scale * (1 - 2.0 * cw)
           + RNG.normal(0, 1.0, (b, code.n))).astype(np.float32)
    return code, cw, llr


@pytest.mark.parametrize("frame,rate", [(FECFrame.SHORT, CodeRate.C1_2),
                                        (FECFrame.NORMAL, CodeRate.C2_3),
                                        (FECFrame.SHORT, CodeRate.C3_5)])
def test_qc_layout_roundtrip(frame, rate):
    code, cw, llr = _noisy(frame, rate, 4)
    tab = qc.qc_tables(frame, rate)
    ti, tp = qc.llrs_to_qc(tab, llr)
    bits = qc.qc_to_bits(tab, ti, tp)
    np.testing.assert_array_equal(bits, (llr < 0).astype(np.uint8))


def test_qc_tables_cover_all_edges():
    tab = qc.qc_tables(FECFrame.SHORT, CodeRate.C1_2)
    code = ldpcmod.get_code(FECFrame.SHORT, CodeRate.C1_2)
    # total info edges must match the code construction
    assert int(tab.layer_deg.sum()) * 360 == len(code.acc_bit)


def test_xla_layered_decodes():
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 4)
    tab = qc.qc_tables(frame, rate)
    ti, tp = qc.llrs_to_qc(tab, llr)
    dec = qc.build_layered_decoder(frame, rate, iters=8)
    ti2, tp2 = dec(jnp.asarray(ti), jnp.asarray(tp))
    hard = qc.qc_to_bits(tab, np.asarray(ti2), np.asarray(tp2))
    assert jldpc.syndrome_ok(code, hard).all()
    np.testing.assert_array_equal(hard, cw)


def test_pallas_kernel_interpret_matches():
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8)
    tab = qc.qc_tables(frame, rate)
    ti, tp = qc.llrs_to_qc(tab, llr)
    dec = qc.make_pallas_layered(frame, rate, iters=8, batch=8,
                                 interpret=True)
    ti2, tp2 = dec(jnp.asarray(ti), jnp.asarray(tp))
    hard = qc.qc_to_bits(tab, np.asarray(ti2), np.asarray(tp2))
    assert jldpc.syndrome_ok(code, hard).all()
    np.testing.assert_array_equal(hard, cw)


@pytest.mark.parametrize("frame,rate", [(FECFrame.SHORT, CodeRate.C1_2),
                                        (FECFrame.SHORT, CodeRate.C3_4)])
def test_pallas_vmem_kernel_interpret_matches(frame, rate):
    code, cw, llr = _noisy(frame, rate, 8)
    tab = qc.qc_tables(frame, rate)
    ti, tp = qc.llrs_to_qc(tab, llr)
    dec = qc.make_pallas_layered_vmem(frame, rate, iters=8, batch=8,
                                      interpret=True)
    ti2, tp2 = dec(jnp.asarray(ti), jnp.asarray(tp))
    hard = qc.qc_to_bits(tab, np.asarray(ti2), np.asarray(tp2))
    assert jldpc.syndrome_ok(code, hard).all()
    np.testing.assert_array_equal(hard, cw)


def test_pallas_vmem_matches_xla_reference_exactly():
    """The VMEM-resident kernel implements the exact layered schedule of
    `build_layered_decoder`: at float32 message storage the totals agree
    bit-for-bit after several iterations.  (The HBM-streamed kernel cannot
    be checked this way in interpret mode: it persists c2v messages across
    iterations via input_output_aliases, which interpret mode does not
    honor -- on hardware the buffers are donated and shared.)"""
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8, snr_scale=1.4)
    tab = qc.qc_tables(frame, rate)
    ti, tp = qc.llrs_to_qc(tab, llr)
    dx = qc.build_layered_decoder(frame, rate, iters=5)
    d2 = qc.make_pallas_layered_vmem(frame, rate, iters=5, batch=8,
                                     interpret=True, dtype=jnp.float32)
    ti1, tp1 = dx(jnp.asarray(ti), jnp.asarray(tp))
    ti2, tp2 = d2(jnp.asarray(ti), jnp.asarray(tp))
    np.testing.assert_array_equal(np.asarray(ti1), np.asarray(ti2))
    np.testing.assert_array_equal(np.asarray(tp1), np.asarray(tp2))


def test_pallas_kernel_flags_garbage():
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code = ldpcmod.get_code(frame, rate)
    tab = qc.qc_tables(frame, rate)
    llr = RNG.normal(0, 1.0, (8, code.n)).astype(np.float32)
    ti, tp = qc.llrs_to_qc(tab, llr)
    dec = qc.make_pallas_layered(frame, rate, iters=4, batch=8,
                                 interpret=True)
    ti2, tp2 = dec(jnp.asarray(ti), jnp.asarray(tp))
    hard = qc.qc_to_bits(tab, np.asarray(ti2), np.asarray(tp2))
    assert not jldpc.syndrome_ok(code, hard).any()


def test_qc_syndrome_ok_xla():
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 6, snr_scale=20.0)  # clean
    tab = qc.qc_tables(frame, rate)
    ti, tp = qc.llrs_to_qc(tab, llr)
    ok = np.asarray(qc.qc_syndrome_ok(frame, rate,
                                      jnp.asarray(ti), jnp.asarray(tp)))
    ref = jldpc.syndrome_ok(code, (llr < 0).astype(np.uint8))
    np.testing.assert_array_equal(ok, ref)
    # flip one bit of lane 0 -> its syndrome must fail
    llr2 = llr.copy()
    llr2[0, 5] *= -1.0
    ti2, tp2 = qc.llrs_to_qc(tab, llr2)
    ok2 = np.asarray(qc.qc_syndrome_ok(frame, rate,
                                       jnp.asarray(ti2), jnp.asarray(tp2)))
    assert not ok2[0] and ok2[1:].all()


def test_adaptive_decoder_early_exit():
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8, snr_scale=4.0)
    dec = qc.make_adaptive_decoder_nb(frame, rate, max_iters=12, chunk=2,
                                      batch=8, interpret=True,
                                      dtype=jnp.float32)
    bits, it = dec(jnp.asarray(llr.T))
    bits = np.asarray(bits)
    np.testing.assert_array_equal(bits.T, cw)
    assert int(it) < 12  # clean batch exits early
    # garbage input: runs to max_iters
    rng = np.random.default_rng(9)
    garbage = rng.normal(0, 1, llr.T.shape).astype(np.float32)
    _, it2 = dec(jnp.asarray(garbage))
    assert int(it2) == 12


def test_adaptive_inkernel_decoder():
    """Single-call adaptive kernel: early exit, iteration count, and
    bit-exact agreement with the fixed-iteration VMEM kernel schedule."""
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8, snr_scale=4.0)
    dec = qc.make_adaptive_decoder_nb_fused(
        frame, rate, max_iters=12, check_every=2, batch=8,
        interpret=True, dtype=jnp.float32)
    bits, it = dec(jnp.asarray(llr.T))
    np.testing.assert_array_equal(np.asarray(bits).T, cw)
    it = int(it)
    assert it < 12 and it % 2 == 0  # clean batch exits early
    # the early-exit schedule is a prefix of the fixed-iteration schedule:
    # a fixed decode of exactly `it` iterations gives the same bits
    ref = qc.make_decoder_nb(frame, rate, iters=it, batch=8,
                             interpret=True, variant="vmem",
                             dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(bits),
                                  np.asarray(ref(jnp.asarray(llr.T))))
    # garbage input runs to max_iters
    rng = np.random.default_rng(9)
    garbage = rng.normal(0, 1, llr.T.shape).astype(np.float32)
    _, it2 = dec(jnp.asarray(garbage))
    assert int(it2) == 12


def test_adaptive_inkernel_min_iters():
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8, snr_scale=6.0)
    dec = qc.make_adaptive_decoder_nb_fused(
        frame, rate, max_iters=12, check_every=2, batch=8,
        interpret=True, dtype=jnp.float32, min_iters=6)
    bits, it = dec(jnp.asarray(llr.T))
    np.testing.assert_array_equal(np.asarray(bits).T, cw)
    assert int(it) >= 6


def test_pallas_vmem_bf16_scan_decodes():
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8, snr_scale=3.0)
    tab = qc.qc_tables(frame, rate)
    ti, tp = qc.llrs_to_qc(tab, llr)
    dec = qc.make_pallas_layered_vmem(frame, rate, iters=8, batch=8,
                                      interpret=True,
                                      scan_dtype=jnp.bfloat16)
    ti2, tp2 = dec(jnp.asarray(ti), jnp.asarray(tp))
    hard = qc.qc_to_bits(tab, np.asarray(ti2), np.asarray(tp2))
    assert jldpc.syndrome_ok(code, hard).all()
    np.testing.assert_array_equal(hard, cw)


def test_fused_io_decoder_matches():
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8, snr_scale=3.0)
    dec = qc.make_decoder_nb_fused_io(frame, rate, iters=8, batch=8,
                                      interpret=True, dtype=jnp.float32)
    bits = np.asarray(dec(jnp.asarray(llr.T)))
    np.testing.assert_array_equal(bits.T, cw)
    ref = qc.make_decoder_nb(frame, rate, iters=8, batch=8, interpret=True,
                             variant="vmem", dtype=jnp.float32)
    bits2 = np.asarray(ref(jnp.asarray(llr.T)))
    np.testing.assert_array_equal(bits, bits2)


def test_adaptive_inkernel_rolling_check():
    """Rolling in-sweep syndrome variant: the check accumulates inside
    every layer pass (reusing its rolls), exits at the exact convergence
    sweep, and the decode schedule stays a prefix of the fixed-iteration
    schedule."""
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8, snr_scale=4.0)
    dec = qc.make_adaptive_decoder_nb_fused(
        frame, rate, max_iters=12, batch=8,
        interpret=True, dtype=jnp.float32, rolling=True)
    bits, it = dec(jnp.asarray(llr.T))
    np.testing.assert_array_equal(np.asarray(bits).T, cw)
    it = int(it)
    assert 0 < it < 12       # exits at the exact sweep (no even rounding)
    ref = qc.make_decoder_nb(frame, rate, iters=it, batch=8,
                             interpret=True, variant="vmem",
                             dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(bits),
                                  np.asarray(ref(jnp.asarray(llr.T))))
    # the non-rolling variant (checks every 2) can only exit at an even
    # count >= the rolling exit
    dec2 = qc.make_adaptive_decoder_nb_fused(
        frame, rate, max_iters=12, check_every=2, batch=8,
        interpret=True, dtype=jnp.float32)
    _, it2 = dec2(jnp.asarray(llr.T))
    assert int(it2) >= it and int(it2) % 2 == 0
    # garbage input runs to max_iters
    rng = np.random.default_rng(9)
    garbage = rng.normal(0, 1, llr.T.shape).astype(np.float32)
    _, itg = dec(jnp.asarray(garbage))
    assert int(itg) == 12
    # min_iters still gates the exit
    dec3 = qc.make_adaptive_decoder_nb_fused(
        frame, rate, max_iters=12, batch=8, interpret=True,
        dtype=jnp.float32, rolling=True, min_iters=7)
    _, it3 = dec3(jnp.asarray(llr.T))
    assert int(it3) >= 7


def test_adaptive_inkernel_fused_io():
    """Fused-IO adaptive kernel: bf16 LLR planes staged through the c2v
    scratch on entry, hard-decision sign planes DMA'd out — bits and
    iteration count identical to the plain adaptive kernel."""
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8, snr_scale=4.0)
    ref = qc.make_adaptive_decoder_nb_fused(
        frame, rate, max_iters=12, check_every=2, batch=8,
        interpret=True, dtype=jnp.float32)
    dec = qc.make_adaptive_decoder_nb_fused_io(
        frame, rate, max_iters=12, check_every=2, batch=8,
        interpret=True, dtype=jnp.float32)
    b_ref, it_ref = ref(jnp.asarray(llr.T))
    b_io, it_io = dec(jnp.asarray(llr.T))
    np.testing.assert_array_equal(np.asarray(b_io), np.asarray(b_ref))
    assert int(it_io) == int(it_ref)
    np.testing.assert_array_equal(np.asarray(b_io).T, cw)
    # the traced first-check floor applies identically
    _, it_f = dec(jnp.asarray(llr.T), 6)
    assert int(it_f) >= 6


def test_layer_order_reversed_kernel_matches_xla():
    """A permuted layer schedule (layer_order="reversed" — measured ~0.4
    sweeps faster than natural at threshold, twophase_study --schedules)
    is still the exact layered algorithm: the interpret-mode kernel with
    reversed order matches the XLA stepper run in the same order sweep
    for sweep, and decodes to the true codeword."""
    frame, rate = FECFrame.SHORT, CodeRate.C1_2
    code, cw, llr = _noisy(frame, rate, 8, snr_scale=4.0)
    tab = qc.qc_tables(frame, rate)
    dec = qc.make_adaptive_decoder_nb_fused_io(
        frame, rate, max_iters=12, check_every=2, batch=8,
        interpret=True, dtype=jnp.float32, layer_order="reversed")
    bits, it = dec(jnp.asarray(llr.T))
    np.testing.assert_array_equal(np.asarray(bits).T, cw)

    # sweep-exact check vs the XLA stepper in the same order: run the
    # stepper `it` sweeps and compare hard decisions
    step = qc.build_layered_stepper(frame, rate, layer_order="reversed")
    ti, tp = qc.llrs_nb_to_qc_jnp(tab, jnp.asarray(llr.T, jnp.float32))
    c2v = jnp.zeros((tab.q, tab.degmax + 2, 360, 8), jnp.float32)
    for _ in range(int(it)):
        ti, tp, c2v = step(ti, tp, c2v)
    bits_ref = qc.qc_to_bits_nb_jnp(tab, ti, tp)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bits_ref))
