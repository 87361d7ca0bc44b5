"""Device-resident sample-domain front end (ops/frontend_device.py).

Covers the generalized-Farrow resampler (fit quality, agreement with the
host windowed-sinc reference, band-edge flatness), and the impair->correct
round trip that the benchmark's raw-input path relies on."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdr_receiver_dvb_t2_tpu.ops import frontend_device as fd
from sdr_receiver_dvb_t2_tpu.rx import frontend as hostfe


def _bandlimited(n, edge=0.425, seed=0):
    """Random signal occupying |f| < edge*fs (the 32K DVB-T2 band edge)."""
    rng = np.random.default_rng(seed)
    nf = int(n * edge)
    spec = np.zeros(n, np.complex128)
    spec[1:nf] = rng.normal(size=nf - 1) + 1j * rng.normal(size=nf - 1)
    spec[-nf + 1:] = rng.normal(size=nf - 1) + 1j * rng.normal(size=nf - 1)
    x = np.fft.ifft(spec) * np.sqrt(n)
    return x.astype(np.complex64)


def _planar(x):
    return np.stack([np.real(x), np.imag(x)], axis=-1).astype(np.float32)


def test_farrow_bank_fit_quality():
    coeffs, j, err = fd.farrow_bank(half=8, deg=7)
    assert err < 2e-4
    assert len(j) == 17
    # degree upgrade must improve the fit
    _, _, err9 = fd.farrow_bank(half=8, deg=9)
    assert err9 < err


def test_resampler_matches_host_sinc_reference():
    """The chunked device resampler agrees with the host windowed-sinc
    interpolator to the fit error on a band-limited signal."""
    n = 40000
    x = _bandlimited(n, seed=1)
    ratio = 1.0 + 2e-5
    n_out = 38000
    res = fd.make_resampler(n_out, half=8, deg=7, chunk=4096)
    pos0 = 8.0
    y = np.asarray(res(jnp.asarray(_planar(x))[None], ratio, pos0))[0]
    y = y[..., 0] + 1j * y[..., 1]
    # host reference: exact windowed-sinc at the same positions (the
    # stream corrector's kernel, 24 taps)
    ref = hostfe._sinc_interp(x, pos0 - 12.0, ratio, n_out, 24)
    err = np.sqrt(np.mean(np.abs(y[100:-100] - ref[100:-100]) ** 2)
                  / np.mean(np.abs(ref) ** 2))
    # two different kernels (17-tap fitted bank vs 24-tap sinc) agree to
    # the worse of their own approximation errors; the DFT-exact test
    # below pins the absolute accuracy
    assert err < 0.01, f"resampler EVM {20*np.log10(err):.1f} dB"


def test_resampler_band_edge_flat():
    """Interpolation error stays below -35 dB on a signal occupying the
    full 0.425*fs DVB-T2 band (the cubic Farrow fails this)."""
    n = 8192
    x = _bandlimited(n, edge=0.425, seed=2)
    ratio = 1.0 + 2.0e-5
    n_out = 7500
    res = fd.make_resampler(n_out, half=8, deg=7, chunk=2048)
    y = np.asarray(res(jnp.asarray(_planar(x))[None], ratio, 8.0))[0]
    y = y[..., 0] + 1j * y[..., 1]
    # ideal values by DFT synthesis (exact for a band-limited periodic
    # signal): x(t) = sum_f X_f e^{2 pi i f t} / n, evaluated at
    # t = 8 + k*ratio
    k = np.arange(500, 7000)
    t = 8.0 + k * ratio
    spec = np.fft.fft(x)
    freqs = np.fft.fftfreq(n)
    sel = np.nonzero(np.abs(spec) > 1e-9)[0]
    ideal = np.zeros(len(k), np.complex128)
    for lo in range(0, len(sel), 512):
        fsel = freqs[sel[lo:lo + 512]]
        ideal += (spec[sel[lo:lo + 512]][None, :]
                  * np.exp(2j * np.pi * fsel[None, :] * t[:, None])
                  ).sum(axis=1) / n
    err = np.sqrt(np.mean(np.abs(y[k] - ideal) ** 2)
                  / np.mean(np.abs(ideal) ** 2))
    assert err < 10 ** (-35 / 20.0), f"EVM {20*np.log10(err):.1f} dB"


def test_impair_correct_roundtrip():
    """The full chain: clean -> (SCO resample, CFO rotate, IQ imbalance,
    DC, int16 quantize) -> front end -> clean again, to better than
    -35 dB EVM, with DC/IQ ESTIMATED on device (only CFO/SCO are given,
    as tracking state).

    Position calibration (the bench uses the same): the impairer reads
    clean at half + m/ratio (its left context eats `half` samples), so a
    2*half pre-pad on the clean frames and corrector pos0 = half*ratio
    makes the composition land exactly on clean[2*half + k]."""
    fs = 9.142857e6
    n = 120000
    half = 8
    f_frames = 3
    x = np.stack([_bandlimited(n, seed=10 + i) for i in range(f_frames)])
    x *= 0.3 / np.sqrt(np.mean(np.abs(x) ** 2))
    sco = 2.0e-5
    ratio = 1.0 + sco
    cfo = 1200.0
    xp = np.pad(x, ((0, 0), (2 * half, 0)))
    n_raw = int(np.ceil((n + 2 * half) * ratio)) + 4 * half
    imp = fd.make_impairer(n_raw, fs, half=half, chunk=8192)
    fe = fd.make_frontend(n, fs, half=half, chunk=8192)
    clean = jnp.asarray(np.stack([_planar(v) for v in xp]))
    dc = jnp.asarray([0.006, -0.004], jnp.float32)
    giq = jnp.asarray([1.02, 0.012], jnp.float32)
    raw = imp(clean, cfo, ratio, 0.35, dc, giq,
              jax.random.PRNGKey(0), jnp.float32(0.0))
    raw = np.asarray(raw)
    # raw really is impaired: DC visible, int16-grid quantized
    assert abs(np.mean(raw[..., 0]) - 0.006) < 5e-4
    peak = np.abs(np.stack([np.real(xp), np.imag(xp)])).max()
    grid = raw * (32000.0 / peak)
    assert np.allclose(grid, np.round(grid), atol=1e-3)  # int16 grid
    out, dc_est, giq_est = fe(jnp.asarray(raw), cfo, ratio,
                              half * ratio, 0.35)
    out = np.asarray(out)
    y = out[..., 0] + 1j * out[..., 1]
    # device estimates converge on the true impairments (tolerance = the
    # 1/sqrt(n) estimator noise floor at n = 120K samples; the bench's 2M
    # samples tighten it 4x)
    assert np.allclose(np.asarray(dc_est), np.asarray(dc), atol=3e-3)
    assert np.allclose(np.asarray(giq_est)[:, 0], 1.02, atol=1e-2)
    assert np.allclose(np.asarray(giq_est)[:, 1], 0.012, atol=1e-2)
    sl = slice(200, n - 200)
    for fi in range(f_frames):
        ref = x[fi][sl]
        err = np.sqrt(np.mean(np.abs(y[fi][sl] - ref) ** 2)
                      / np.mean(np.abs(ref) ** 2))
        assert err < 10 ** (-35 / 20.0), \
            f"frame {fi} EVM {20*np.log10(err):.1f} dB"


def test_impair_correct_awgn_power():
    """nvar adds the requested noise power (measured against a zero
    signal) and nvar=0 adds none."""
    fs = 9.142857e6
    n = 30000
    n_raw = n + 40
    clean = np.full((1, n, 2), 0.2, np.float32)
    clean[0, 0, 0] = 1.0       # sets the int16 peak: headroom for noise
    clean = jnp.asarray(clean)
    imp = fd.make_impairer(n_raw, fs, chunk=8192)
    z = jnp.zeros(2, jnp.float32)
    one = jnp.asarray([1.0, 0.0], jnp.float32)
    r0 = np.asarray(imp(clean, 0.0, 1.0, 0.0, z, one,
                        jax.random.PRNGKey(1), jnp.float32(0.0)))
    r1 = np.asarray(imp(clean, 0.0, 1.0, 0.0, z, one,
                        jax.random.PRNGKey(1), jnp.float32(0.01)))
    d = (r1 - r0)[0, 100:-100]
    p = np.mean(d[..., 0] ** 2 + d[..., 1] ** 2)
    assert 0.007 < p < 0.013


def test_frontend_symbols_matches_strip():
    """The symbol-emitting front end (resampler reading at the post-P1,
    post-guard grid) equals the plain front end followed by a manual
    P1/GI strip."""
    fs = 9.142857e6
    half = 8
    n_sym, sym_size, guard, p1_len = 3, 3000, 200, 500
    n = p1_len + n_sym * sym_size
    x = _bandlimited(n + 64, seed=7)[:n]
    xp = np.pad(x[None], ((0, 0), (2 * half, 0)))
    ratio = 1.0 + 2e-5
    n_raw = int(np.ceil((n + 2 * half) * ratio)) + 4 * half
    imp = fd.make_impairer(n_raw, fs, half=half, chunk=2048)
    clean = jnp.asarray(np.stack([xp.real, xp.imag], -1).astype(np.float32))
    raw = np.asarray(imp(clean, 900.0, ratio, 0.1,
                         jnp.asarray([0.004, -0.003], jnp.float32),
                         jnp.asarray([1.015, 0.01], jnp.float32),
                         jax.random.PRNGKey(2), jnp.float32(0.0)))
    rr = jnp.asarray(raw[..., 0])
    ri = jnp.asarray(raw[..., 1])
    fe = fd.make_frontend(n, fs, half=half, chunk=2048, planar=True)
    (br, bi), _, _ = fe(rr, ri, 900.0, ratio, half * ratio, 0.1)
    ref = (np.asarray(br) + 1j * np.asarray(bi))[0]
    ref_syms = ref[p1_len:].reshape(n_sym, sym_size)[:, guard:]
    fs_fe = fd.make_frontend_symbols(n_sym, sym_size, guard, fs,
                                     p1_len=p1_len, half=half)
    (sr, si), dc_e, giq_e = fs_fe(rr, ri, 900.0, ratio, half * ratio, 0.1)
    got = (np.asarray(sr) + 1j * np.asarray(si))[0]
    err = np.abs(got - ref_syms).max() / np.abs(ref_syms).std()
    assert err < 2e-2, err
    # estimates identical (same estimation pre-pass)
    assert abs(float(giq_e[0, 0]) - 1.015) < 1e-2


def test_rational_resampler_against_dft_ideal():
    """The polyphase 35/32 (AirSpy) resampler matches DFT-exact
    interpolation at its documented alignment (output k = input position
    k*35/32 + half - 1) to better than -35 dB on a 0.42*fs signal."""
    num, den, half = 35, 32, 8
    n = 7040
    x = _bandlimited(n, edge=0.40, seed=11)
    fn, spill = fd.make_rational_resampler(num, den, half=half)
    out2, a_blocks = fn(jnp.asarray(np.stack([x.real, x.imag])))
    a = int(a_blocks)
    y = np.asarray(out2)[0, :a * den] + 1j * np.asarray(out2)[1, :a * den]
    k = np.arange(200, a * den - 200)
    t = k * num / den + (half - 1)
    spec = np.fft.fft(x)
    freqs = np.fft.fftfreq(n)
    sel = np.nonzero(np.abs(spec) > 1e-9)[0]
    ideal = np.zeros(len(k), np.complex128)
    for lo in range(0, len(sel), 512):
        fsel = freqs[sel[lo:lo + 512]]
        ideal += (spec[sel[lo:lo + 512]][None, :]
                  * np.exp(2j * np.pi * fsel[None, :] * t[:, None])
                  ).sum(axis=1) / n
    err = np.sqrt(np.mean(np.abs(y[k] - ideal) ** 2)
                  / np.mean(np.abs(ideal) ** 2))
    assert err < 10 ** (-35 / 20.0), f"EVM {20*np.log10(err):.1f} dB"


def test_chain_oversized_buffer_matches_blockwise():
    """An oversized re-fed buffer through a rational-ratio chain must
    equal block-by-block feeding: the split path runs the drift stage
    only (a process() re-entry would apply the 35/32 polyphase stage
    twice — the confirmed round-4 review bug)."""
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import SAMPLE_RATE as fs
    from sdr_receiver_dvb_t2_tpu.ops.frontend_device import \
        DeviceFrontendChain
    block = 20000
    n = 10 * block
    x = _bandlimited(n + 64, edge=0.35, seed=13)[:n]
    ch1 = DeviceFrontendChain(10.0e6, fs, block)
    outs = [ch1.process(x[i:i + block]) for i in range(0, n, block)]
    y_blocks = np.concatenate(outs)
    ch2 = DeviceFrontendChain(10.0e6, fs, block)
    y_big = ch2.process(x)                      # one oversized call
    m = min(len(y_big), len(y_blocks))
    assert m > n * 0.8 / (10.0e6 / fs)
    # sample-aligned and nothing zeroed/dropped; the DC/IQ EMA evolves
    # along different piece boundaries, so values differ by the few-%
    # correction trajectory, never by misalignment (O(1)) or zero runs
    err = np.abs(y_big[:m] - y_blocks[:m]).max()
    assert err < 0.08, err
    assert np.abs(y_big[100:m - 100]).min() > 1e-6


def test_chain_rebase_splice_phase_continuous():
    """rebase_ratio with CFO tracking active: the splice between the
    resampled pending buffer and subsequent chain output must be
    phase-continuous (the confirmed round-4 review bug fed corrected
    OUTPUT back through the input-side correction: 3 rad step)."""
    from sdr_receiver_dvb_t2_tpu.ops.frontend_device import \
        DeviceFrontendChain
    fs = 9.142857e6
    block = 16384
    f_tone = 1.1e6
    n = 8 * block
    t = np.arange(n)
    x = np.exp(2j * np.pi * f_tone * t / fs).astype(np.complex64)
    ch = DeviceFrontendChain(fs, fs, block)
    ch.add_frequency(500.0, 0)
    pending = []
    for i in range(0, 4 * block, block):
        pending.append(ch.process(x[i:i + block]))
    pending = np.concatenate(pending)
    out1 = ch.rebase_ratio(pending, 1.0 + 5e-4)
    out2 = []
    for i in range(4 * block, n, block):
        out2.append(ch.process(x[i:i + block]))
    y = np.concatenate([out1] + out2)
    # instantaneous phase increments of the (derotated, resampled) tone:
    # a splice discontinuity shows as an outlier step
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    med = np.median(dphi)
    dev = np.abs(dphi - med)
    assert dev[50:-50].max() < 0.05, dev[50:-50].max()
