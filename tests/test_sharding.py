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


def test_fused_step_collective_traffic_is_scalar_only():
    """Mechanism behind the 2-host >=80% scaling target (BASELINE.md): the
    production fused step is frames-data-parallel, so the ONLY cross-device
    traffic allowed is the replicated stats psum (a few bytes/step).  Parse
    the compiled HLO and assert every collective op touches tiny operands —
    any future reshard of bulk tensors (frames, LLRs, bits) fails here
    before it ships."""
    import re
    import jax.numpy as jnp

    p, plp = tiny_mode()
    mesh = sharding.make_mesh(8)
    step = sharding.sharded_fused_step(p, plp, 2, frames_per_device=1,
                                       mesh=mesh, ldpc_iters=2)
    bodies = np.zeros((8, p.len_frame * p.symbol_size, 2), np.float32)
    hlo = step.lower(jnp.asarray(bodies), jnp.float32(1.0)) \
              .compile().as_text()
    coll = [ln for ln in hlo.splitlines()
            if re.search(r"\b(all-reduce|all-gather|all-to-all|"
                         r"collective-permute|reduce-scatter)\b", ln)
            and "=" in ln]
    assert coll, "expected the stats psum to appear as a collective"
    bytes_per = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                 "u32": 4, "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8}
    worst = 0
    for ln in coll:
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", ln):
            n = 1
            for d in filter(None, dims.split(",")):
                n *= int(d)
            worst = max(worst, n * bytes_per.get(dt, 4))
    frame_bytes = p.len_frame * p.symbol_size * 2 * 4
    assert worst <= 256, f"bulk collective found ({worst} B): {coll}"
    # the data each device consumes per frame dwarfs the collective
    assert frame_bytes / max(worst, 1) > 1000
