#!/usr/bin/env python
"""Stage-level timing of the fused receive path on the real TPU.

Times nested prefixes of the MultiFramePath pipeline with data-dependent
chains (see verify skill: block_until_ready is unreliable on axon), so the
difference between consecutive prefixes is the cost of the added stage:

  fft      : GI strip + batched 32K FFT + carrier slice
  demod    : + per-class pilot equalize + composed row-gather deinterleave
  cells    : + transpose to (total, F, 2) + PLP composed gather
  llrs     : + separable LLRs + bit deinterleave row gather  (full _fn)
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
        CodeRate, Constellation, FECFrame, FFTMode, GuardInterval,
        PilotPattern, PLPParams, T2Params)
    from sdr_receiver_dvb_t2_tpu.rx import fusedpath

    num_blocks = 128
    n_frames = 8
    p = T2Params(fft_mode=FFTMode.FFT_32K, guard=GuardInterval.GI_1_128,
                 pilot_pattern=PilotPattern.PP7, extended_carrier=True,
                 n_data=59)
    plp = PLPParams(constellation=Constellation.QAM256, rate=CodeRate.C2_3,
                    fec_frame=FECFrame.NORMAL, num_blocks_max=num_blocks,
                    time_il_length=1)
    mf = fusedpath.MultiFramePath(p, plp, num_blocks, n_frames)
    demod = mf.demod
    classes = demod.classes
    comp = mf.single.comp

    def fft_part(body2):
        body = jax.lax.complex(body2[:, 0], body2[:, 1])
        sym = body.reshape(p.len_frame, p.symbol_size)[:, p.guard_size:]
        spec = jnp.fft.fftshift(jnp.fft.fft(sym, axis=1), axes=1)
        car = spec[:, p.left_nulls:p.left_nulls + p.k_total]
        return car.T

    def demod_part(body2):
        x = fft_part(body2)
        outs = []
        for c in classes:
            xc = x[:, c.sym_cols]
            pr = xc[c.pilot_rows, :]
            est_p = pr * c.inv_ref
            il, ir, w = c.stencil
            ch = est_p[il, :] * (1.0 - w) + est_p[ir, :] * w
            eq = xc / ch
            outs.append(eq[c.comp_rows, :].reshape(-1))
        return jnp.concatenate(outs)

    def stage_fft(bodies, inv):
        x = jax.vmap(fft_part)(bodies)
        return jnp.sum(jnp.real(x) + jnp.imag(x))

    def stage_demod(bodies, inv):
        f = jax.vmap(demod_part)(bodies)
        return jnp.sum(jnp.real(f) + jnp.imag(f))

    def stage_cells(bodies, inv):
        f = jax.vmap(demod_part)(bodies)
        wide = jnp.stack([jnp.real(f), jnp.imag(f)], axis=-1)
        wide = jnp.transpose(wide, (1, 0, 2))
        cells = wide[comp]
        return jnp.sum(cells)

    def stage_llrs(bodies, inv):
        return jnp.sum(mf._fn(bodies, inv))

    rng = np.random.default_rng(0)
    body = rng.normal(0, 0.3, (n_frames, p.len_frame * p.symbol_size, 2)
                      ).astype(np.float32)
    inv = jnp.float32(1000.0)
    d_bodies = jnp.asarray(body)

    for name, fn in (("fft", stage_fft), ("demod", stage_demod),
                     ("cells", stage_cells), ("llrs", stage_llrs)):
        @jax.jit
        def chain(b, inv, n, fn=fn):
            def step(_, s):
                v = fn(s, inv)
                return b + v * 1e-20
            return fn(jax.lax.fori_loop(0, n, step, b), inv)

        t0 = time.time()
        float(chain(d_bodies, inv, 1))
        print(f"[{name}] compile+first {time.time()-t0:.0f}s",
              file=sys.stderr)
        t1 = time.time(); float(chain(d_bodies, inv, 1)); t1 = time.time()-t1
        reps = 8
        tn = time.time(); float(chain(d_bodies, inv, 1+reps))
        tn = time.time()-tn
        dt = (tn - t1) / reps
        print(f"[{name}] {dt*1e3:.2f} ms per {n_frames}-frame superstep "
              f"({dt/n_frames*1e3:.2f} ms/frame)")


if __name__ == "__main__":
    main()
