#!/usr/bin/env python
"""Microbenchmark the Pallas LDPC decoder variants on the real TPU.

Times a data-dependent chain of decodes (output totals feed the next
input's perturbation) so the axon runtime cannot overlap or cache calls.

Usage: python tools/ldpc_microbench.py [hbm|vmem ...] [--iters N] [--batch B]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=["vmem", "hbm"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdr_receiver_dvb_t2_tpu.dvbt2 import ldpc as ldpcmod
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import CodeRate, FECFrame
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas as qc

    frame, rate = FECFrame.NORMAL, CodeRate.C2_3
    code = ldpcmod.get_code(frame, rate)
    B = args.batch
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (B, code.k)).astype(np.uint8)
    cw = ldpcmod.encode(code, info)
    llr = (6.0 * (1 - 2.0 * cw)
           + rng.normal(0, 1.0, (B, code.n))).astype(np.float32)
    tab = qc.qc_tables(frame, rate)
    ti, tp = qc.llrs_to_qc(tab, llr)

    for variant in args.variants:
        core = qc.make_core(frame, rate, args.iters, B, variant=variant,
                            dtype=jnp.bfloat16)

        @jax.jit
        def chain(ti0, tp0, n):
            def body(_, s):
                a, b = s
                a2, b2 = core(a, b)
                # data dependence: tiny perturbation of the next input
                return (ti0 + a2 * 1e-12, tp0 + b2 * 1e-12)
            return jax.lax.fori_loop(0, n, body, (ti0, tp0))

        dti = jnp.asarray(ti)
        dtp = jnp.asarray(tp)
        t0 = time.time()
        a, b = core(dti, dtp)
        hard = qc.qc_to_bits(tab, np.asarray(a), np.asarray(b))
        ok = bool(np.array_equal(hard, cw))
        print(f"[{variant}] compile+first: {time.time()-t0:.0f}s "
              f"decode-exact={ok}", file=sys.stderr)

        def run(n):
            t0 = time.time()
            a, b = chain(dti, dtp, n)
            float(jnp.sum(b[0, 0, :1]))
            return time.time() - t0

        run(1)
        t1 = run(1)
        tn = run(1 + args.reps)
        dt = (tn - t1) / args.reps
        steps = args.iters * tab.q
        mbps = B * code.n / dt / 1e6
        print(f"[{variant}] {dt*1e3:.2f} ms/decode  "
              f"{dt/steps*1e6:.2f} us/layer-step  {mbps:.0f} Mbit/s coded")


if __name__ == "__main__":
    main()
