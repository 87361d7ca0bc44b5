#!/usr/bin/env python
"""Stage split of the PRODUCTION demod+LLR superstep at bench scale
(F=128, 32K, symbol-planes entry) on the real TPU.

Times nested prefixes of MultiFramePath.run_core with data-dependent
chains; consecutive differences = the added stage's cost:

  fft    : MXU carrier-major FFT of the symbol planes
  carr   : + fftshift slice to active carriers
  slices : + per-class strided slices ((k, nc*F) lane fold)
  eq     : + pilot estimate, stencil interpolation, one-tap EQ,
             composed data+FI row gather, concat (class loop)
  llr    : + PLP composed gather, rotation, separable LLRs, bit
             deinterleave  (= the full _fn_syms)

Usage: python tools/demod_split_microbench.py [F]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
        CodeRate, Constellation, FECFrame, FFTMode, GuardInterval,
        PilotPattern, PLPParams, T2Params)
    from sdr_receiver_dvb_t2_tpu.ops import mxu_fft
    from sdr_receiver_dvb_t2_tpu.rx import fusedpath

    num_blocks = 128
    f = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    p = T2Params(fft_mode=FFTMode.FFT_32K, guard=GuardInterval.GI_1_128,
                 pilot_pattern=PilotPattern.PP7, extended_carrier=True,
                 n_data=59)
    plp = PLPParams(constellation=Constellation.QAM256, rate=CodeRate.C2_3,
                    fec_frame=FECFrame.NORMAL, num_blocks_max=num_blocks,
                    time_il_length=1)
    mf = fusedpath.MultiFramePath(p, plp, num_blocks, f,
                                  llr_dtype=jnp.bfloat16)
    classes = mf.demod.classes
    dd = mf.demod_dtype
    tails = [mf._make_tail(pa) for pa in mf.paths]

    sym_off = np.concatenate(
        [[0], np.cumsum([c.count for c in classes])]).astype(int)

    def prefix(stage):
        s0 = (p.left_nulls - p.fft_size // 2) % p.fft_size

        def to_carriers(v):
            if s0 + p.k_total <= p.fft_size:
                return v[s0:s0 + p.k_total]
            return jnp.concatenate(
                [v[s0:], v[:s0 + p.k_total - p.fft_size]], axis=0)

        def run(sym_r, sym_i, inv_nvar):
            # CLASS-ORDERED symbols (the production syms entry)
            xkr, xki = mxu_fft.fft_carrier_major_planar(
                sym_r, sym_i, p.fft_size, dtype=dd)
            if stage == "fft":
                return jnp.sum(xkr.astype(jnp.float32))
            xr, xi = to_carriers(xkr), to_carriers(xki)
            if stage == "carr":
                return jnp.sum(xr.astype(jnp.float32))

            def class_slices_ordered(ci, c):
                o = int(sym_off[ci])
                sl = lambda a: jax.lax.slice_in_dim(
                    a.reshape(a.shape[0], -1), o * f, (o + c.count) * f,
                    axis=1)
                return sl(xr), sl(xi)

            xs = [class_slices_ordered(ci, c)
                  for ci, c in enumerate(classes)]
            if stage == "slices":
                return sum(jnp.sum(a.astype(jnp.float32)) for a, _ in xs)
            # production comp-first EQ (paired (total, 2F) output)
            outs = []
            for c, (a, b) in zip(classes, xs):
                eqr, eqi = fusedpath._eq_class_comp(c, a, b, f)
                outs.append(jnp.concatenate(
                    [eqr.reshape(-1, f), eqi.reshape(-1, f)], axis=1))
            both = jnp.concatenate(outs, axis=0)
            if stage == "eq":
                return jnp.sum(both.astype(jnp.float32))
            if stage == "gather":
                cpf = plp.cells_per_fec_block
                comp_cm = mf.paths[0].comp.reshape(
                    num_blocks, cpf).T.reshape(-1)
                g = both[comp_cm]
                return jnp.sum(g.astype(jnp.float32))
            out, evm = tails[0](both, inv_nvar)
            return jnp.sum(out.astype(jnp.float32))

        return run

    rng = np.random.default_rng(0)
    sym_r = jnp.asarray(rng.normal(
        size=(f, p.len_frame, p.fft_size)).astype(np.float32))
    sym_i = jnp.asarray(rng.normal(
        size=(f, p.len_frame, p.fft_size)).astype(np.float32))
    inv = jnp.float32(100.0)

    for stage in ("fft", "carr", "slices", "eq", "gather", "llr"):
        fn = prefix(stage)

        def step(sr, si, iv):
            sd = fn(sr, si, iv)
            return sr + sd * 1e-20, si, sd
        step = jax.jit(step, donate_argnums=(0, 1))
        sr, si = sym_r, sym_i
        t0 = time.time()
        sr, si, sd = step(sr, si, inv)
        float(np.asarray(sd))
        print(f"[{stage}] compile+first {time.time()-t0:.0f}s",
              file=sys.stderr)
        t0 = time.time()
        sdv = None
        for _ in range(4):
            sr, si, sdv = step(sr, si, inv)
        float(np.asarray(sdv))
        dt = (time.time() - t0) / 4
        print(f"[{stage}] {dt*1e3:.2f} ms per {f}-frame superstep "
              f"({dt/f*1e3:.3f} ms/frame)", file=sys.stderr)
        sym_r, sym_i = sr, si   # keep donation chain valid


if __name__ == "__main__":
    main()
