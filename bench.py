#!/usr/bin/env python
"""Headline benchmark: 32K-FFT DVB-T2 receive throughput on one chip.

Runs the fused device receive pipeline (GI strip + 32K FFT + carrier-major
pilot equalization with MXU interpolation + composed-gather deinterleaves +
256QAM separable LLR demap + Pallas quasi-cyclic layered LDPC) on a real
modulated T2 frame, verifies the decoded codewords are bit-exact, and prints
ONE JSON line:

  {"metric": "demod_32k_Msamples_per_s", "value": ..., "unit": ...,
   "vs_baseline": ...}

vs_baseline = x-real-time versus the reference receiver's operating point
(sustained 1.0x real time at 9.142857 Msps on a 6-core desktop CPU,
BASELINE.md).

Timing uses a data-dependent chained loop (frame i+1's input depends on
frame i's decoded bits) with the result fetched to host, so asynchronous
dispatch or result caching in the runtime cannot fake the number.
"""
import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the fused 32K pipeline takes minutes to
    # compile through the remote-compile tunnel; cache hits cut reruns to
    # seconds
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sdr_receiver_dvb_t2_tpu.dvbt2 import ldpc as ldpcmod
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
        CodeRate, Constellation, FECFrame, FFTMode, GuardInterval,
        PilotPattern, PLPParams, T2Params)
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas as qldpc
    from sdr_receiver_dvb_t2_tpu.rx import fusedpath
    from sdr_receiver_dvb_t2_tpu.tx import fec as txfec
    from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator

    # headline mode: 32K FFT, GI 1/128, PP7, extended carriers, 256QAM C2/3
    num_blocks = 128  # codeword lane batch of the Pallas layered decoder
    p = T2Params(fft_mode=FFTMode.FFT_32K, guard=GuardInterval.GI_1_128,
                 pilot_pattern=PilotPattern.PP7, extended_carrier=True,
                 n_data=59)
    plp = PLPParams(constellation=Constellation.QAM256, rate=CodeRate.C2_3,
                    fec_frame=FECFrame.NORMAL, num_blocks_max=num_blocks,
                    time_il_length=1)

    print("building 32K test frame...", file=sys.stderr)
    mod = T2Modulator(p, [plp])
    rng = np.random.default_rng(0)
    ts = rng.integers(0, 256, (mod.packets_needed(1) + 4, 188)
                      ).astype(np.uint8)
    ts[:, 0] = 0x47
    out = mod.modulate(ts.reshape(-1), 1)
    body = out.samples[2048:2048 + p.len_frame * p.symbol_size]
    # the tunnel moves ~0.2 MB/s: ship the frequency-domain carriers as
    # int16 (6.7 MB) instead of time-domain samples (63+ MB) and synthesize
    # the time-domain frame on device (IFFT + GI), once, outside the timed
    # loop
    from sdr_receiver_dvb_t2_tpu.tx import frame as txframe
    import sdr_receiver_dvb_t2_tpu.dvbt2.l1 as l1mod
    l1pre_b, l1posts_b = out.l1pre, out.l1post_frames[0]
    l1_arr = np.concatenate([
        l1mod.l1pre_encode(l1pre_b),
        l1mod.l1post_encode(l1posts_b, mod.l1_post_mod)])
    # rebuild the same PLP slice cells the modulator used
    probe0 = T2Modulator(p, [plp])
    from sdr_receiver_dvb_t2_tpu.tx import fec as txfec0
    probe0.adapters[0].push_packets(ts.reshape(-1))
    bb0 = np.stack([probe0.adapters[0].next_frame()
                    for _ in range(num_blocks)])
    cells0 = txfec0.plp_encode(plp, bb0)
    sl0 = txframe.interleave_plp_frame(plp, cells0)
    frame_cells = txframe.build_frame_cells(p, l1_arr, [sl0])
    symbols = txframe.cells_to_symbols(p, frame_cells)
    carriers = txframe.symbols_to_carriers(p, symbols)  # (len_frame, k_total)

    # expected codewords for the correctness gate
    from sdr_receiver_dvb_t2_tpu.dvbt2 import bbframe, interleavers
    probe = bbframe.ModeAdapter(kbch=plp.fec.k_bch)
    probe.push_packets(ts.reshape(-1)[:probe.packets_needed(num_blocks)
                                      * bbframe.TS_PACKET])
    bb = np.stack([probe.next_frame() for _ in range(num_blocks)])
    v = txfec.fec_encode_bits(plp, bb)
    addr = interleavers.bit_interleaver_perm(plp.constellation,
                                            plp.fec_frame, plp.rate)
    pperm = interleavers.parity_interleaver_perm(plp.fec.n_ldpc,
                                                plp.fec.k_ldpc,
                                                plp.fec.q_ldpc)
    u = np.empty_like(v)
    u[:, addr] = v
    cw_tx = np.empty_like(u)
    cw_tx[:, pperm] = u

    print("compiling fused device pipeline...", file=sys.stderr)
    import jax.numpy as _jnp
    # frames per super-step: every gather row carries all F frames, so the
    # per-frame cost of the 1M-index PLP permutation scales as 1/F.
    # F=128 would make every minor tile exact but exceeds 16 GB HBM.
    n_frames = 96
    mf = fusedpath.MultiFramePath(p, plp, num_blocks, n_frames,
                                  llr_dtype=_jnp.bfloat16)
    code = ldpcmod.get_code(plp.fec_frame, plp.rate)
    iters = 10
    decode = qldpc.make_decoder_nb(plp.fec_frame, plp.rate,
                                   iters=iters, batch=num_blocks,
                                   dtype=_jnp.bfloat16)

    def one_superstep(bodies, inv_nvar):
        """-> (per-frame weighted checksums (F,), first frame's bits)."""
        llrs = mf._fn(bodies, inv_nvar)        # (n_ldpc, nb, F)
        lf = jnp.transpose(llrs, (2, 0, 1))    # frame-major for the decoder
        sums = []
        bits0 = None
        for fi in range(n_frames):
            bits = decode(lf[fi])              # (n_ldpc, nb)
            sums.append(jnp.sum(bits.astype(jnp.int32) * wvec[:, None],
                                dtype=jnp.int32))
            if fi == 0:
                bits0 = bits
        return jnp.stack(sums), bits0

    # correctness gate without bulk DtoH (the tunneled runtime moves bytes
    # slowly): device-side weighted checksum over all decoded bits + a
    # fetched slice of the first two codewords
    wvec = ((np.arange(code.n, dtype=np.int64) * 2654435761) % 997
            ).astype(np.int32)
    with np.errstate(over="ignore"):
        expect_sum = int((cw_tx.astype(np.int32)
                          * wvec[None, :]).sum(dtype=np.int32))

    @functools.partial(jax.jit, donate_argnums=0)
    def step(bodies, inv):
        sums, bits0 = one_superstep(bodies, inv)
        s = sums[0]
        s_all = jnp.sum(sums, dtype=jnp.int32)
        # data-dependent feedback forces strictly serial device execution
        return bodies + s_all.astype(jnp.float32) * 1e-16, s, s_all,             bits0[:, :2]

    t0 = time.time()
    cscale = float(np.max(np.abs(np.stack([np.real(carriers),
                                           np.imag(carriers)]))))
    car_i16 = np.stack([np.real(carriers), np.imag(carriers)], axis=-1)
    car_i16 = np.round(car_i16 / cscale * 32000.0).astype(np.int16)

    @jax.jit
    def synthesize(ci16):
        car = jax.lax.complex(ci16[..., 0].astype(jnp.float32),
                              ci16[..., 1].astype(jnp.float32))             * jnp.float32(cscale / 32000.0)
        shifted = jnp.pad(car, ((0, 0), (p.left_nulls,
                                         p.fft_size - p.k_total
                                         - p.left_nulls)))
        spec = jnp.roll(shifted, -(p.fft_size // 2), axis=1)
        sym = jnp.fft.ifft(spec, axis=1)             * jnp.float32(p.fft_size / np.sqrt(p.k_total))
        g = p.guard_size
        with_gi = jnp.concatenate([sym[:, -g:], sym], axis=1).reshape(-1)
        return jnp.stack([jnp.real(with_gi), jnp.imag(with_gi)], axis=-1)

    d_body = synthesize(jnp.asarray(car_i16))

    def fresh_bodies():
        # step() donates its bodies argument, so every chain needs its own
        b = jnp.broadcast_to(d_body[None], (n_frames,) + d_body.shape)
        return b + jnp.zeros((n_frames, 1, 1), jnp.float32)

    inv_nvar = jnp.float32(10.0 ** (30 / 10.0))
    _, acc1, acc_all, head = step(fresh_bodies(), inv_nvar)
    head = np.asarray(head)
    acc1 = int(acc1)
    with np.errstate(over="ignore"):
        expect_all = np.int32(expect_sum) * np.int32(n_frames)
    print(f"first call (incl 6.7MB transfer+compile): {time.time()-t0:.0f}s",
          file=sys.stderr)
    exact = (acc1 == expect_sum and int(acc_all) == int(expect_all)
             and np.array_equal(head.T, cw_tx[:2]))
    print(f"correctness: checksum+slice bit-exact = {exact} "
          f"(acc={acc1} expect={expect_sum})", file=sys.stderr)

    def run_chain(n):
        b = fresh_bodies()
        t0 = time.time()
        s = None
        for _ in range(n):
            b, s, _, _ = step(b, inv_nvar)
        int(s)  # forces the whole serial chain
        return time.time() - t0

    run_chain(1)
    t2 = run_chain(1)
    t12 = run_chain(6)
    dt = (t12 - t2) / (5 * n_frames)
    n_samples = p.frame_samples
    msps = n_samples / dt / 1e6
    ldpc_mbps = num_blocks * code.n / dt / 1e6
    x_rt = msps / 9.142857
    print(f"frame {n_samples} samples in {dt*1e3:.1f} ms; "
          f"LDPC {ldpc_mbps:.0f} Mbit/s coded; {x_rt:.1f}x real time",
          file=sys.stderr)
    if not exact:
        x_rt = 0.0
    print(json.dumps({
        "metric": "demod_32k_Msamples_per_s",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(x_rt, 2),
    }))


if __name__ == "__main__":
    main()
