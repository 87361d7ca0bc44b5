#!/usr/bin/env python
"""MXU FFT stage microbench at bench scale (F frames x 60 symbols x 32K)
on the real TPU: where does the 0.23 ms/frame FFT stage sit vs roofline,
and does a bf16 input (frontend emitting bf16 symbol planes) help?

Variants: copy (HBM roofline reference), fft32 (f32 input -> bf16 pipe,
the current head), fft16 (bf16 input planes), fftf32 (f32 throughout).

Usage: python tools/fft_microbench.py [F]
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
    from sdr_receiver_dvb_t2_tpu.ops import mxu_fft

    f = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    s, n = 60, 32768
    rng = np.random.default_rng(0)
    xr32 = jnp.asarray(rng.normal(size=(f, s, n)).astype(np.float32))
    xi32 = jnp.asarray(rng.normal(size=(f, s, n)).astype(np.float32))
    xr16 = xr32.astype(jnp.bfloat16)
    xi16 = xi32.astype(jnp.bfloat16)

    def chain(fn, a, b, label, reps=4):
        a = a + 0  # fresh buffer per chain (donation below consumes it)
        def step(u, v):
            p, q = fn(u, v)
            sd = jnp.sum(p[0].astype(jnp.float32))
            return u + (sd * 1e-24).astype(u.dtype), v, sd
        step = jax.jit(step, donate_argnums=(0,))
        t0 = time.time()
        a, b, sd = step(a, b)
        float(np.asarray(sd))
        print(f"[{label}] compile+first {time.time()-t0:.0f}s",
              file=sys.stderr)
        t0 = time.time()
        for _ in range(reps):
            a, b, sd = step(a, b)
        float(np.asarray(sd))
        dt = (time.time() - t0) / reps
        print(f"[{label}] {dt*1e3:.2f} ms per {f}-frame superstep "
              f"({dt/f*1e3:.3f} ms/frame)", file=sys.stderr)

    chain(lambda a, b: (a * 1.0000001, b), xr32, xi32, "copy f32 (roofline)")
    chain(lambda a, b: mxu_fft.fft_carrier_major_planar(
        a, b, n, dtype=jnp.bfloat16), xr32, xi32, "fft f32in bf16pipe")
    chain(lambda a, b: mxu_fft.fft_carrier_major_planar(
        a, b, n, dtype=jnp.bfloat16), xr16, xi16, "fft bf16in bf16pipe")
    chain(lambda a, b: mxu_fft.fft_carrier_major_planar(
        a, b, n, dtype=jnp.float32), xr32, xi32, "fft f32 throughout")

    # prototype: twiddle FOLDED into stage 1 as m-batched weights
    # ("fsnm,nkm->fskm") — deletes the br/bi intermediate round trip
    n1, n2 = mxu_fft._FACTORS[n]
    w1, w2, tw = mxu_fft._tables(n)
    W = w1[:, :, None] * tw[None, :, :]          # (n1, k1, n2) complex
    dt = jnp.bfloat16
    Wr = jnp.asarray(np.ascontiguousarray(W.real), dtype=dt)
    Wi = jnp.asarray(np.ascontiguousarray(W.imag), dtype=dt)
    w2r = jnp.asarray(np.ascontiguousarray(w2.real), dtype=dt)
    w2i = jnp.asarray(np.ascontiguousarray(w2.imag), dtype=dt)

    def fft_fused(a, b):
        yr = a.astype(dt).reshape(f, s, n1, n2)
        yi = b.astype(dt).reshape(f, s, n1, n2)

        def mm(u, w):
            return jnp.einsum("fsnm,nkm->fskm", u, w,
                              preferred_element_type=jnp.float32
                              ).astype(dt)

        br = mm(yr, Wr) - mm(yi, Wi)
        bi = mm(yr, Wi) + mm(yi, Wr)

        def mm2(u, w):
            return jnp.einsum("fskm,ml->lksf", u, w,
                              preferred_element_type=jnp.float32
                              ).astype(dt)

        out_r = mm2(br, w2r) - mm2(bi, w2i)
        out_i = mm2(br, w2i) + mm2(bi, w2r)
        return out_r.reshape(n, s, f), out_i.reshape(n, s, f)

    chain(fft_fused, xr32, xi32, "fft f32in tw-fused")
    chain(fft_fused, xr16, xi16, "fft bf16in tw-fused")

    # 3-mult (Karatsuba) complex matmuls: one fewer einsum + one fewer
    # intermediate per stage
    w1r = jnp.asarray(np.ascontiguousarray(w1.real), dtype=dt)
    w1i = jnp.asarray(np.ascontiguousarray(w1.imag), dtype=dt)
    w1s = w1r + w1i
    w2s = w2r + w2i
    twr = jnp.asarray(np.ascontiguousarray(tw.real), dtype=dt)
    twi = jnp.asarray(np.ascontiguousarray(tw.imag), dtype=dt)

    def fft_karatsuba(a, b):
        yr = a.astype(dt).reshape(f, s, n1, n2)
        yi = b.astype(dt).reshape(f, s, n1, n2)

        def mm(u, w):
            return jnp.einsum("fsnm,nk->fskm", u, w,
                              preferred_element_type=jnp.float32
                              ).astype(dt)

        # (yr + i yi)(w1r + i w1i): m1=yr(w1r+w1i), m2=w1i(yr+yi),
        # m3=w1r(yi-yr); re = m1 - m2, im = m1 + m3
        m1 = mm(yr, w1s)
        m2 = mm(yr + yi, w1i)
        m3 = mm(yi - yr, w1r)
        ar = m1 - m2
        ai = m1 + m3
        br = ar * twr - ai * twi
        bi = ar * twi + ai * twr

        def mm2(u, w):
            return jnp.einsum("fskm,ml->lksf", u, w,
                              preferred_element_type=jnp.float32
                              ).astype(dt)

        k1_ = mm2(br, w2s)
        k2_ = mm2(br + bi, w2i)
        k3_ = mm2(bi - br, w2r)
        out_r = k1_ - k2_
        out_i = k1_ + k3_
        return out_r.reshape(n, s, f), out_i.reshape(n, s, f)

    chain(fft_karatsuba, xr16, xi16, "fft bf16in karatsuba")

    # Pallas stage1+twiddle fusion: ar/ai/br/bi stay in VMEM (saves the
    # ~2 GB/superstep intermediate round trip); stage 2 stays the
    # carrier-major einsum
    from jax.experimental import pallas as pl
    w1rT = jnp.asarray(np.ascontiguousarray(w1.real.T), dtype=dt)
    w1iT = jnp.asarray(np.ascontiguousarray(w1.imag.T), dtype=dt)

    def s1_kernel(yr_ref, yi_ref, w1r_ref, w1i_ref, twr_ref, twi_ref,
                  br_ref, bi_ref):
        yr = yr_ref[0, 0]
        yi = yi_ref[0, 0]
        wr = w1r_ref[...]
        wi = w1i_ref[...]
        ar = (jnp.dot(wr, yr, preferred_element_type=jnp.float32)
              - jnp.dot(wi, yi, preferred_element_type=jnp.float32))
        ai = (jnp.dot(wr, yi, preferred_element_type=jnp.float32)
              + jnp.dot(wi, yr, preferred_element_type=jnp.float32))
        twr_ = twr_ref[...].astype(jnp.float32)
        twi_ = twi_ref[...].astype(jnp.float32)
        br_ref[0, 0] = (ar * twr_ - ai * twi_).astype(br_ref.dtype)
        bi_ref[0, 0] = (ar * twi_ + ai * twr_).astype(bi_ref.dtype)

    def fft_pallas_s1(a, b):
        yr = a.astype(dt).reshape(f, s, n1, n2)
        yi = b.astype(dt).reshape(f, s, n1, n2)
        grid = (f, s)
        yspec = pl.BlockSpec((1, 1, n1, n2), lambda i, j: (i, j, 0, 0))
        wspec = pl.BlockSpec((n1, n1), lambda i, j: (0, 0))
        tspec = pl.BlockSpec((n1, n2), lambda i, j: (0, 0))
        br, bi = pl.pallas_call(
            s1_kernel,
            grid=grid,
            in_specs=[yspec, yspec, wspec, wspec, tspec, tspec],
            out_specs=[yspec, yspec],
            out_shape=(jax.ShapeDtypeStruct((f, s, n1, n2), dt),
                       jax.ShapeDtypeStruct((f, s, n1, n2), dt)),
        )(yr, yi, w1rT, w1iT, twr, twi)

        def mm2(u, w):
            return jnp.einsum("fskm,ml->lksf", u, w,
                              preferred_element_type=jnp.float32
                              ).astype(dt)

        out_r = mm2(br, w2r) - mm2(bi, w2i)
        out_i = mm2(br, w2i) + mm2(bi, w2r)
        return out_r.reshape(n, s, f), out_i.reshape(n, s, f)

    chain(fft_pallas_s1, xr16, xi16, "fft bf16in pallas-s1")
    rr2, _ = mxu_fft.fft_carrier_major_planar(xr16, xi16, n,
                                              dtype=jnp.bfloat16)
    kr2, _ = fft_pallas_s1(xr16, xi16)
    err2 = float(jnp.max(jnp.abs(rr2[:, :4].astype(jnp.float32)
                                 - kr2[:, :4].astype(jnp.float32))))
    print(f"[pallas-s1] max err {err2:.3f}", file=sys.stderr)
    # numeric sanity vs reference
    rr, ri = mxu_fft.fft_carrier_major_planar(xr16, xi16, n,
                                              dtype=jnp.bfloat16)
    kr, ki = fft_karatsuba(xr16, xi16)
    err = float(jnp.max(jnp.abs(rr[:, :4].astype(jnp.float32)
                                - kr[:, :4].astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(rr[:, :4].astype(jnp.float32))))
    print(f"[karatsuba] max err {err:.3f} vs scale {scale:.1f} "
          f"({err/scale:.2e} rel)", file=sys.stderr)


if __name__ == "__main__":
    main()
