"""Child process for the cross-process fused-pipeline test/bench.

Joins a jax.distributed CPU cluster (1 local device per process), builds
the PRODUCTION sharded step (parallel.sharding.sharded_fused_step — the
MultiFramePath + LDPC superstep bench.py measures) over the global mesh,
feeds it REAL modulated T2 frames with the global input assembled from
process-local shards (jax.make_array_from_process_local_data), and checks
its local result bit-for-bit against a single-process reference run of
the same frames.  This is the execution BASELINE.md's 2-host scaling row
requires: frames data-parallel across process boundaries, stats psum as
the only cross-process collective.

argv: process_id coordinator_addr num_processes frames_per_device [reps]
stdout: one JSON line {"pid", "ok", "bits_match", "stats", "step_ms"}.
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax                                                    # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
addr = sys.argv[2]
nproc = int(sys.argv[3])
fpd = int(sys.argv[4])
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3

if nproc > 1:
    jax.distributed.initialize(coordinator_address=addr,
                               num_processes=nproc, process_id=pid)

import numpy as np                                            # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sdr_receiver_dvb_t2_tpu.dvbt2.params import (            # noqa: E402
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    PLPParams, T2Params)
from sdr_receiver_dvb_t2_tpu.dvbt2 import ldpc as ldpcmod     # noqa: E402
from sdr_receiver_dvb_t2_tpu.ops import ldpc as jldpc         # noqa: E402
from sdr_receiver_dvb_t2_tpu.parallel import sharding as psh  # noqa: E402
from sdr_receiver_dvb_t2_tpu.rx import fusedpath, p1_detect   # noqa: E402
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator  # noqa: E402

NUM_BLOCKS = 3
LDPC_ITERS = 8

p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
             pilot_pattern=PilotPattern.PP1, extended_carrier=False,
             n_data=9)
plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                fec_frame=FECFrame.SHORT, num_blocks_max=NUM_BLOCKS,
                time_il_length=1)

# every process renders the same waveform deterministically, then keeps
# only its own frames — the capture split a 2-host deployment would do
# at the ingest ring
n_frames = nproc * fpd
mod = T2Modulator(p, [plp])
rng = np.random.default_rng(11)
ts = rng.integers(0, 256, (mod.packets_needed(n_frames) + 4, 188)
                  ).astype(np.uint8)
ts[:, 0] = 0x47
ts[:, 1] &= 0x7F
samples = mod.modulate(ts.reshape(-1), n_frames).samples

blen = p.len_frame * p.symbol_size
bodies = np.empty((n_frames, blen, 2), np.float32)
for k in range(n_frames):
    b = samples[k * p.frame_samples + p1_detect.P1_LEN:
                k * p.frame_samples + p1_detect.P1_LEN + blen]
    bodies[k, :, 0] = b.real
    bodies[k, :, 1] = b.imag

inv_nvar = jnp.float32(1.0e3)   # clean loopback: high confidence scale

# --- single-process reference on THIS process's frames (same local shape
# as the sharded per-device computation, so the comparison is exact)
local = bodies[pid * fpd:(pid + 1) * fpd]
mf = fusedpath.MultiFramePath(p, plp, NUM_BLOCKS, fpd)
code = ldpcmod.get_code(plp.fec_frame, plp.rate)
dec = jldpc._build_decoder(code, LDPC_ITERS, 0.5, jnp.float32)
llrs = mf._fn(jnp.asarray(local), inv_nvar)
lf = jnp.transpose(llrs, (2, 1, 0))
ref_bits = np.asarray(dec(lf.reshape(fpd * NUM_BLOCKS, -1)
                          .astype(jnp.float32))
                      ).reshape(fpd, NUM_BLOCKS, -1)

# --- the sharded production step across the process boundary
devs = jax.devices()
assert len(devs) == nproc, devs
mesh = Mesh(np.array(devs).reshape(nproc), ("time",))
fstep = psh.sharded_fused_step(p, plp, NUM_BLOCKS, frames_per_device=fpd,
                               mesh=mesh, ldpc_iters=LDPC_ITERS)
gbodies = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("time", None, None)), local)
bits, stats = fstep(gbodies, inv_nvar)
jax.block_until_ready((bits, stats))

# local shard of the global result == the single-process reference
mine = np.concatenate([np.asarray(s.data) for s in
                       sorted(bits.addressable_shards,
                              key=lambda s: s.index[0].start or 0)])
bits_match = bool(np.array_equal(mine, ref_bits))

# timed steps: data-dependent chain is unnecessary on CPU (dispatch is
# synchronous under block_until_ready), median over reps
times = []
for _ in range(reps):
    t0 = time.perf_counter()
    bits, stats = fstep(gbodies, inv_nvar)
    jax.block_until_ready((bits, stats))
    times.append(time.perf_counter() - t0)

print(json.dumps({
    "pid": pid,
    "ok": True,
    "bits_match": bits_match,
    "stats": [float(stats[0]), float(stats[1])],
    "expected_codewords": n_frames * NUM_BLOCKS,
    "step_ms": 1e3 * float(np.median(times)),
}))
