#!/usr/bin/env python
"""FEC-tail timing on the real TPU: where does the non-demod half of the
superstep go, and does batching the per-frame BCH/pack/hash ops help?

bench.py --profile showed demod+LLR = 1.16 ms/frame vs 2.21 ms for the
full superstep at 2.0 LDPC iters/frame — the FEC tail costs ~1.05 ms even
though two layered iterations of the kernel alone are far cheaper.  The
candidates: 96 sequential adaptive-kernel launches, and 96x3 small
per-frame ops (BCH GEMM, descramble/pack, hash).  This tool times, per
F-frame superstep with a data-dependent chain:

  decode        F sequential in-kernel-adaptive decodes (the floor)
  tail_perframe + per-frame bch/pack/hash    (bench.py's current shape)
  tail_batched  + the same ops batched over frame GROUPS (fewer, larger
                  MXU calls; bits stacked (G*B) lanes wide)

Usage: python tools/fec_tail_microbench.py [--frames 96] [--group 8]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--sigma", type=float, default=0.5,
                    help="LLR noise; 0.5 ~ the clean bench's 2 iters")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdr_receiver_dvb_t2_tpu.dvbt2 import ldpc as ldpcmod
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import (CodeRate, FECFrame,
                                                      fec_params)
    from sdr_receiver_dvb_t2_tpu.ops import fec_device
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas as qldpc

    frame, rate = FECFrame.NORMAL, CodeRate.C2_3
    F, B, G = args.frames, args.batch, args.group
    fec = fec_params(frame, rate)
    code = ldpcmod.get_code(frame, rate)
    kb8 = fec.k_bch // 8

    rng = np.random.default_rng(1)
    info = rng.integers(0, 2, (B, code.k)).astype(np.uint8)
    cw = ldpcmod.encode(code, info)
    llr = (2.2 * (1 - 2.0 * cw)
           + rng.normal(0, args.sigma, (B, code.n))).astype(np.float32)
    lf_host = np.broadcast_to(llr.T[None], (F, code.n, B)).copy()
    lf_host += rng.normal(0, 1e-3, lf_host.shape).astype(np.float32)

    decode = qldpc.make_adaptive_decoder_nb_fused(
        frame, rate, max_iters=24, check_every=2, batch=B,
        dtype=jnp.bfloat16)
    bch_check = fec_device.make_bch_check_nb(frame, rate)
    bb_pack = fec_device.make_bb_bytes_nb(frame, rate)
    wb = rng.integers(-2**31, 2**31, (2, kb8), dtype=np.int64
                      ).astype(np.int32)
    d_wb = jnp.asarray(wb)

    def steps():
        @functools.partial(jax.jit, donate_argnums=0)
        def step_decode(lf):
            acc = jnp.int32(0)
            it_tot = jnp.int32(0)
            for fi in range(F):
                bits, it = decode(lf[fi])
                it_tot = it_tot + it
                acc = acc + jnp.sum(bits[:8, :8].astype(jnp.int32))
            return lf + acc.astype(jnp.float32) * 1e-16, acc, it_tot

        @functools.partial(jax.jit, donate_argnums=0)
        def step_perframe(lf):
            acc = jnp.int32(0)
            it_tot = jnp.int32(0)
            for fi in range(F):
                bits, it = decode(lf[fi])
                it_tot = it_tot + it
                ok = bch_check(bits[:fec.n_bch])
                byts = bb_pack(bits)
                h = jnp.sum(byts[None] * d_wb[:, :, None], dtype=jnp.int32,
                            axis=(1, 2))
                acc = acc + h[0] + h[1] + jnp.sum(ok.astype(jnp.int32))
            return lf + acc.astype(jnp.float32) * 1e-16, acc, it_tot

        @functools.partial(jax.jit, donate_argnums=0)
        def step_batched(lf):
            acc = jnp.int32(0)
            it_tot = jnp.int32(0)
            for g0 in range(0, F, G):
                grp = []
                for fi in range(g0, min(g0 + G, F)):
                    bits, it = decode(lf[fi])
                    it_tot = it_tot + it
                    grp.append(bits)
                # (n, G*B): one GEMM / one pack / one hash per group
                gb = jnp.concatenate(grp, axis=1)
                ok = bch_check(gb[:fec.n_bch])
                byts = bb_pack(gb)
                h = jnp.sum(byts[None] * d_wb[:, :, None], dtype=jnp.int32,
                            axis=(1, 2))
                acc = acc + h[0] + h[1] + jnp.sum(ok.astype(jnp.int32))
            return lf + acc.astype(jnp.float32) * 1e-16, acc, it_tot

        return {"decode": step_decode, "tail_perframe": step_perframe,
                "tail_batched": step_batched}

    d_lf0 = jnp.asarray(lf_host)
    for name, fn in steps().items():
        lf = d_lf0 + jnp.zeros((), jnp.float32)
        lf, acc, it = fn(lf)           # compile + warm
        iters = float(it) / F
        t0 = time.time()
        lf, acc, _ = fn(lf)
        int(np.asarray(acc))
        t1 = time.time() - t0
        t0 = time.time()
        for _ in range(5):
            lf, acc, _ = fn(lf)
        int(np.asarray(acc))
        t6 = time.time() - t0
        dt = (t6 - t1) / 4 / F
        print(f"[{name}] {dt*1e3:.3f} ms/frame ({iters:.1f} iters/frame)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
