"""MXU-factorized FFT vs numpy reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdr_receiver_dvb_t2_tpu.ops import mxu_fft


@pytest.mark.parametrize("n", [1024, 8192, 32768])
def test_mxu_fft_matches_numpy(n):
    rng = np.random.default_rng(1)
    x = (rng.normal(0, 1, (3, n)) + 1j * rng.normal(0, 1, (3, n))
         ).astype(np.complex64)
    got = np.asarray(jax.jit(lambda v: mxu_fft.fft(v, n))(jnp.asarray(x)))
    ref = np.fft.fft(x, axis=-1)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 2e-4, err


def test_fft_stages_index_split():
    n = 1024
    n1, n2 = mxu_fft._FACTORS[n]
    rng = np.random.default_rng(2)
    x = (rng.normal(0, 1, n) + 1j * rng.normal(0, 1, n)).astype(np.complex64)
    out = np.asarray(mxu_fft.fft_stages(jnp.asarray(x), n))
    ref = np.fft.fft(x)
    k = np.arange(n)
    np.testing.assert_allclose(out[k % n1, k // n1], ref, rtol=0, atol=1e-3
                               * np.max(np.abs(ref)))


def test_fft_stages_planar_matches_complex():
    n = 8192
    rng = np.random.default_rng(3)
    xr = rng.normal(0, 1, (2, n)).astype(np.float32)
    xi = rng.normal(0, 1, (2, n)).astype(np.float32)
    cr, ci = mxu_fft.fft_stages_planar(jnp.asarray(xr), jnp.asarray(xi), n)
    ref = mxu_fft.fft_stages(jnp.asarray(xr + 1j * xi).astype(jnp.complex64),
                             n)
    np.testing.assert_allclose(np.asarray(cr), np.real(np.asarray(ref)),
                               rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ci), np.imag(np.asarray(ref)),
                               rtol=0, atol=1e-2)
