#!/usr/bin/env python
"""Weak-scaling harness for the sharded fused receive step (VERDICT r1
item 4): throughput at n in {1,2,4,8} virtual CPU devices, fixed per-device
work (frames), so ideal scaling holds wall-clock time flat as devices are
added.  Virtual devices map onto separate host cores, so the measurement
exercises real parallel execution of the partitioned XLA program plus the
psum collective — the structure (not the silicon) of a multi-chip/multi-host
deployment; BASELINE.md's 2-host >=80% target is the same program over a
`jax.distributed` process mesh (mechanism validated by
tests/test_distributed.py).

Writes SCALING.json and prints a table:
    python tools/scaling_bench.py [--devices 1,2,4,8] [--frames 2]
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

_CHILD = "--_child"


def child(n_devices: int, frames_per_device: int, iters: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{n_devices}").strip()
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
        CodeRate, Constellation, FECFrame, FFTMode, GuardInterval,
        PilotPattern, PLPParams, T2Params)
    from sdr_receiver_dvb_t2_tpu.parallel import sharding

    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=3,
                    time_il_length=1)
    mesh = sharding.make_mesh(n_devices)
    step = sharding.sharded_fused_step(p, plp, num_blocks=3,
                                       frames_per_device=frames_per_device,
                                       mesh=mesh, ldpc_iters=4)
    f_total = n_devices * frames_per_device
    rng = np.random.default_rng(0)
    bodies = jnp.asarray(rng.normal(
        size=(f_total, p.len_frame * p.symbol_size, 2)).astype(np.float32))
    inv = jnp.float32(1.0)
    jax.block_until_ready(step(bodies, inv))     # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(step(bodies, inv))
    dt = (time.perf_counter() - t0) / iters
    samples = f_total * p.frame_samples
    print(json.dumps({"n": n_devices, "dt_s": dt,
                      "samples_per_s": samples / dt}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(_CHILD, type=int, default=None, dest="child_n")
    args = ap.parse_args()
    if args.child_n is not None:
        child(args.child_n, args.frames, args.iters)
        return

    rows = []
    for n in [int(x) for x in args.devices.split(",")]:
        rc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), _CHILD, str(n),
             "--frames", str(args.frames), "--iters", str(args.iters)],
            capture_output=True, text=True)
        if rc.returncode != 0 or not rc.stdout.strip():
            sys.stderr.write(rc.stderr[-2000:])
            raise RuntimeError(f"scaling child n={n} failed "
                               f"(rc={rc.returncode})")
        line = rc.stdout.strip().splitlines()[-1]
        rows.append(json.loads(line))
        print(f"n={n}: {rows[-1]['samples_per_s']/1e6:.1f} Msamples/s "
              f"({rows[-1]['dt_s']*1e3:.0f} ms/step)", file=sys.stderr)
    base = rows[0]["dt_s"]
    for r in rows:
        r["weak_scaling_efficiency"] = base / r["dt_s"]
    out = {"mode": "8K GI1/32 PP1 QAM16 C1/2 short, fused sharded step",
           "frames_per_device": args.frames, "results": rows}
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["results"]))


if __name__ == "__main__":
    main()
