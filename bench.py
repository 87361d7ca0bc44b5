#!/usr/bin/env python
"""Headline benchmark: 32K-FFT DVB-T2 receive throughput on one chip.

Measures the full device receive pipeline (GI strip + 32K FFT + pilot
equalization + frequency/time/cell deinterleave + 256QAM LLR demap + batched
LDPC min-sum) on a real modulated T2 frame, verifies the decoded codewords
are bit-exact, and prints ONE JSON line:

  {"metric": "demod_32k_Msamples_per_s", "value": ..., "unit": ...,
   "vs_baseline": ...}

vs_baseline = x-real-time versus the reference receiver's operating point
(sustained 1.0x real time at 9.142857 Msps on a 6-core desktop CPU,
BASELINE.md) -- i.e. value / 9.142857.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sdr_receiver_dvb_t2_tpu.dvbt2 import l1 as l1mod
    from sdr_receiver_dvb_t2_tpu.dvbt2 import ldpc as ldpcmod
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
        CodeRate, Constellation, FECFrame, FFTMode, GuardInterval,
        PilotPattern, PLPParams, T2Params)
    from sdr_receiver_dvb_t2_tpu.ops import ldpc as jldpc
    from sdr_receiver_dvb_t2_tpu.rx import jaxdemod
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

    # expected codewords for the correctness gate
    adapters = mod.adapters  # consumed; rebuild BB frames for checking
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

    print("compiling device pipeline...", file=sys.stderr)
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas as qldpc
    fd = jaxdemod.get_frame_demod(p)
    path = jaxdemod.get_plp_path(plp, num_blocks)
    code = ldpcmod.get_code(plp.fec_frame, plp.rate)
    iters = 10
    decode = qldpc.make_decoder_natural(plp.fec_frame, plp.rate,
                                        iters=iters, batch=num_blocks)
    pre, _ = l1mod.build_l1(p, [plp])
    l1_cells = l1mod.L1_PRE_CELLS + pre.l1_post_size
    n_cells = num_blocks * plp.cells_per_fec_block

    @jax.jit
    def pipeline(body2, inv_nvar):
        # float re/im pairs: the axon runtime cannot transfer complex arrays
        cells2 = fd._fn(body2)
        sl = jax.lax.dynamic_slice(cells2, (l1_cells, 0), (n_cells, 2))
        llrs = path._fn(sl, inv_nvar)
        return decode(llrs)

    d_body = jnp.asarray(np.stack([np.real(body), np.imag(body)],
                                  axis=-1).astype(np.float32))
    inv_nvar = jnp.float32(10.0 ** (30 / 10.0))  # clean capture
    bits = np.asarray(pipeline(d_body, inv_nvar))
    exact = bool(np.array_equal(bits, cw_tx))
    print(f"correctness: decoded codewords bit-exact = {exact}",
          file=sys.stderr)

    # timed runs
    reps = 10
    r = pipeline(d_body, inv_nvar)
    r.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        r = pipeline(d_body, inv_nvar)
    r.block_until_ready()
    dt = (time.time() - t0) / reps
    n_samples = len(out.samples)  # incl. P1
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
