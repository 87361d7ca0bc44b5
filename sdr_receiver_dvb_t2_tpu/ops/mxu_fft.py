"""MXU-factorized FFT: run the OFDM FFT on the systolic array.

XLA's native TPU FFT executes at a few hundred GFLOP/s on the VPU; for the
32K demod it was the single largest stage after LDPC (0.87 ms/frame,
tools/path_microbench.py).  A Cooley-Tukey split N = N1*N2 turns the FFT
into two batched matmuls (DFT-N1 and DFT-N2) plus an elementwise twiddle --
40x the FLOPs of radix-2 but on the MXU at tens of TFLOP/s, a net ~5-10x
win.  The reference uses FFTW3f on the CPU (DSP/fast_fourier_transform.h);
this is the TPU-native equivalent of that choice: use the fastest unit
available even at higher nominal FLOPs.

Factorization (n = n1*N2 + n2, k = k1 + N1*k2):
  X[k1,k2] = sum_n2 W_N^{n2 k1} W_N2^{n2 k2} ( sum_n1 x[n1,n2] W_N1^{n1 k1} )

Precision: matmuls default to jax.lax.Precision.HIGH (three bf16 passes
per f32 operand pair on the MXU, ~1e-5 relative error at N=32768 --
256QAM needs roughly -40 dB EVM so there is ample margin; the e2e bench
bit-exactness gate holds).  Pass HIGHEST for full float32 accuracy.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_FACTORS = {32768: (256, 128), 16384: (128, 128), 8192: (128, 64),
            4096: (64, 64), 2048: (64, 32), 1024: (32, 32)}


@functools.lru_cache(maxsize=None)
def _tables(n: int):
    n1, n2 = _FACTORS[n]
    assert n1 * n2 == n
    j1 = np.arange(n1)
    j2 = np.arange(n2)
    w1 = np.exp(-2j * np.pi * np.outer(j1, j1) / n1)       # (n1, k1)
    w2 = np.exp(-2j * np.pi * np.outer(j2, j2) / n2)       # (n2, k2)
    tw = np.exp(-2j * np.pi * np.outer(j1, j2) / n)        # (k1, n2)
    f32 = np.complex64
    return (w1.astype(f32), w2.astype(f32), tw.astype(f32))


def fft_stages(x, n: int, precision=jax.lax.Precision.HIGH):
    """(..., n) complex -> (..., k1: n1, k2: n2) complex with
    X[k] = out[..., k % n1, k // n1] (natural DFT ordering split)."""
    n1, n2 = _FACTORS[n]
    w1, w2, tw = _tables(n)
    y = x.reshape(x.shape[:-1] + (n1, n2))
    a = jnp.einsum("...nm,nk->...km", y, jnp.asarray(w1),
                   precision=precision)
    b = a * jnp.asarray(tw)
    return jnp.einsum("...km,ml->...kl", b, jnp.asarray(w2),
                      precision=precision)


def fft_stages_planar(xr, xi, n: int,
                      precision=jax.lax.Precision.HIGH, dtype=None):
    """Planar variant: (..., n) real pairs -> (..., k1, k2) real pairs.

    Avoids materializing complex arrays entirely (the head of the fused
    receive path is bandwidth-bound, not FLOP-bound: the lax.complex pack
    and the final real/imag split are whole-array passes this skips).

    dtype=bfloat16 stores every intermediate at half the HBM traffic and
    runs single-pass bf16 MXU matmuls (f32 accumulation): ~-40 dB EVM from
    the input quantization, ample margin for 256QAM under FEC (the bench's
    bit-exact TS gate holds; thermal noise dominates at the 19 dB
    operating point)."""
    n1, n2 = _FACTORS[n]
    w1, w2, tw = _tables(n)
    dt = dtype or xr.dtype
    if dt == jnp.bfloat16:
        precision = jax.lax.Precision.DEFAULT
    xr = xr.astype(dt)
    xi = xi.astype(dt)
    w1r = jnp.asarray(np.ascontiguousarray(w1.real), dtype=dt)
    w1i = jnp.asarray(np.ascontiguousarray(w1.imag), dtype=dt)
    w2r = jnp.asarray(np.ascontiguousarray(w2.real), dtype=dt)
    w2i = jnp.asarray(np.ascontiguousarray(w2.imag), dtype=dt)
    twr = jnp.asarray(np.ascontiguousarray(tw.real), dtype=dt)
    twi = jnp.asarray(np.ascontiguousarray(tw.imag), dtype=dt)
    yr = xr.reshape(xr.shape[:-1] + (n1, n2))
    yi = xi.reshape(xi.shape[:-1] + (n1, n2))

    def mm(a, w):
        return jnp.einsum("...nm,nk->...km", a, w, precision=precision,
                          preferred_element_type=jnp.float32).astype(dt)

    ar = mm(yr, w1r) - mm(yi, w1i)
    ai = mm(yr, w1i) + mm(yi, w1r)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr

    def mm2(a, w):
        return jnp.einsum("...km,ml->...kl", a, w, precision=precision,
                          preferred_element_type=jnp.float32).astype(dt)

    out_r = mm2(br, w2r) - mm2(bi, w2i)
    out_i = mm2(br, w2i) + mm2(bi, w2r)
    return out_r, out_i


def fft_carrier_major_planar(xr, xi, n: int,
                             precision=jax.lax.Precision.HIGH,
                             dtype=None):
    """(F, S, n) planar time-domain symbols -> (n, S, F) planar spectra in
    CARRIER-MAJOR layout: the second Cooley-Tukey stage writes k-major
    through a transposed einsum ("fskm,ml->lksf"), fusing the fused demod's
    whole-array carrier-major transpose into the matmul epilogue."""
    n1, n2 = _FACTORS[n]
    w1, w2, tw = _tables(n)
    dt = dtype or xr.dtype
    if dt == jnp.bfloat16:
        precision = jax.lax.Precision.DEFAULT
    f, s = xr.shape[0], xr.shape[1]
    yr = xr.astype(dt).reshape(f, s, n1, n2)
    yi = xi.astype(dt).reshape(f, s, n1, n2)
    w1r = jnp.asarray(np.ascontiguousarray(w1.real), dtype=dt)
    w1i = jnp.asarray(np.ascontiguousarray(w1.imag), dtype=dt)
    w2r = jnp.asarray(np.ascontiguousarray(w2.real), dtype=dt)
    w2i = jnp.asarray(np.ascontiguousarray(w2.imag), dtype=dt)
    twr = jnp.asarray(np.ascontiguousarray(tw.real), dtype=dt)
    twi = jnp.asarray(np.ascontiguousarray(tw.imag), dtype=dt)

    def mm(a, w):
        return jnp.einsum("fsnm,nk->fskm", a, w, precision=precision,
                          preferred_element_type=jnp.float32).astype(dt)

    ar = mm(yr, w1r) - mm(yi, w1i)
    ai = mm(yr, w1i) + mm(yi, w1r)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr

    def mm2(a, w):
        return jnp.einsum("fskm,ml->lksf", a, w, precision=precision,
                          preferred_element_type=jnp.float32).astype(dt)

    out_r = mm2(br, w2r) - mm2(bi, w2i)      # (k2, k1, S, F)
    out_i = mm2(br, w2i) + mm2(bi, w2r)
    # row-major (k2, k1) flatten IS the DFT index k = k1 + n1*k2
    return (out_r.reshape(n, s, f), out_i.reshape(n, s, f))


def fft(x, n: int | None = None, precision=jax.lax.Precision.HIGH):
    """Drop-in jnp.fft.fft replacement over the last axis (supported n)."""
    n = n or x.shape[-1]
    if n not in _FACTORS:
        return jnp.fft.fft(x, axis=-1)
    n1, n2 = _FACTORS[n]
    out = fft_stages(x, n, precision)            # (..., k1, k2)
    out = jnp.swapaxes(out, -1, -2)              # (..., k2, k1): flat = k
    return out.reshape(x.shape[:-1] + (n,))
