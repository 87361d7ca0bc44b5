"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    PLPParams, T2Params)
from sdr_receiver_dvb_t2_tpu.parallel import sharding


def tiny_mode():
    p = T2Params(fft_mode=FFTMode.FFT_1K, guard=GuardInterval.GI_1_16,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=20)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=2,
                    time_il_length=1)
    return p, plp


def test_mesh_shapes():
    m = sharding.make_mesh(8)
    assert m.devices.size == 8
    assert m.axis_names == ("time", "cw")
    m2 = sharding.make_mesh(2)
    assert m2.devices.size == 2


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_executes(n):
    assert len(jax.devices()) >= n
    p, plp = tiny_mode()
    sharding.dryrun(p, plp, num_blocks=2, n_devices=n)


def test_sharded_step_matches_single_device():
    """The sharded pipeline must be numerically identical to the same jit on
    one device (sharding is layout, not math)."""
    p, plp = tiny_mode()
    import jax.numpy as jnp
    mesh8 = sharding.make_mesh(8)
    mesh1 = sharding.make_mesh(1)
    step8 = sharding.sharded_receive_step(p, plp, 2, mesh8, ldpc_iters=2)
    step1 = sharding.sharded_receive_step(p, plp, 2, mesh1, ldpc_iters=2)
    rng = np.random.default_rng(1)
    bodies = rng.normal(size=(8, p.len_frame * p.symbol_size, 2)
                        ).astype(np.float32)
    b8, s8 = step8(jnp.asarray(bodies), jnp.float32(1.0))
    b1, s1 = step1(jnp.asarray(bodies), jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(b8), np.asarray(b1))
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1))


def test_graft_entry():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 8 and out.dtype == np.uint8
