"""Device-path equivalence tests: the jitted JAX demod/decode pipeline must
match the NumPy oracle (rx.demod / rx.decode) and the LDPC decoder must
produce valid codewords."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2 import ldpc as ldpcmod
from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    PLPParams, T2Params)
from sdr_receiver_dvb_t2_tpu.ops import ldpc as jldpc
from sdr_receiver_dvb_t2_tpu.rx import decode as npdec
from sdr_receiver_dvb_t2_tpu.rx import demod as npd
from sdr_receiver_dvb_t2_tpu.rx import jaxdemod as jd
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("frame,rate", [(FECFrame.SHORT, CodeRate.C1_2),
                                        (FECFrame.SHORT, CodeRate.C2_3)])
def test_jax_ldpc_decodes_batch(frame, rate):
    code = ldpcmod.get_code(frame, rate)
    B = 4
    info = RNG.integers(0, 2, (B, code.k)).astype(np.uint8)
    cw = ldpcmod.encode(code, info)
    llr = (4.0 * (1 - 2.0 * cw) + RNG.normal(0, 1.0, (B, code.n))
           ).astype(np.float32)
    dec = jldpc.make_decoder(code, iters=25)
    hard = np.asarray(dec(llr))
    assert jldpc.syndrome_ok(code, hard).all()
    np.testing.assert_array_equal(hard, cw)


def test_jax_ldpc_flags_garbage():
    code = ldpcmod.get_code(FECFrame.SHORT, CodeRate.C1_2)
    llr = RNG.normal(0, 1.0, (2, code.n)).astype(np.float32)
    dec = jldpc.make_decoder(code, iters=10)
    hard = np.asarray(dec(llr))
    assert not jldpc.syndrome_ok(code, hard).any()


def _loopback_setup():
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=3,
                    time_il_length=1)
    mod = T2Modulator(p, [plp])
    ts = RNG.integers(0, 256, (mod.packets_needed(1) + 4, 188)
                      ).astype(np.uint8)
    ts[:, 0] = 0x47
    out = mod.modulate(ts.reshape(-1), 1)
    return p, plp, out


def test_frame_demod_matches_numpy_oracle():
    p, plp, out = _loopback_setup()
    carriers = npd.extract_carriers(p, out.samples, 2048)
    oracle = npd.equalize_frame(p, carriers).frame_cells
    fd = jd.FrameDemod(p)
    cells = np.asarray(fd(out.samples[2048:].astype(np.complex64)))
    np.testing.assert_allclose(cells, oracle, atol=1e-3)


def test_plp_path_matches_numpy_oracle():
    p, plp, out = _loopback_setup()
    carriers = npd.extract_carriers(p, out.samples, 2048)
    oracle = npd.equalize_frame(p, carriers).frame_cells
    l1_cells = 1840 + out.l1pre.l1_post_size
    n_cells = 3 * plp.cells_per_fec_block
    sl = oracle[l1_cells:l1_cells + n_cells]
    path = jd.PLPDecodePath(plp, 3)
    llr_jax = np.asarray(path(sl.astype(np.complex64), np.float32(1e3)))
    cells2 = npdec.deinterleave_plp_frame(plp, sl, 3)
    llr_np = npdec.bits_from_llrs(plp, npdec.llr_demap(plp, cells2, 1e-3))
    assert ((llr_jax < 0) == (llr_np < 0)).all()


def test_receiver_with_jax_ldpc_backend():
    """Plug the JAX batched decoder into the high-level receiver."""
    from sdr_receiver_dvb_t2_tpu.rx.receiver import T2Receiver
    p, plp, out = _loopback_setup()

    def factory(plp_cfg):
        code = ldpcmod.get_code(plp_cfg.fec_frame, plp_cfg.rate)
        dec = jldpc.make_decoder(code, iters=25)
        return lambda llrs: np.asarray(dec(np.asarray(llrs, np.float32)))

    res = T2Receiver(ldpc_decode_fn_factory=factory).receive(out.samples)
    assert res.stats.frames_decoded == 1
    assert len(res.ts) > 0
