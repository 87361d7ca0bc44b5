#!/usr/bin/env python
"""Iteration-count sweep of the Pallas layered decoder at the 256QAM C2/3
operating point: post-LDPC BER vs SNR for several max-iteration settings.

DVB-T2 quasi-error-free for 256QAM R=2/3 on a Gaussian channel needs
~C/N 16.5-18 dB (EN 302 755 annex); anything above that with zero residual
bit errors at a given iteration count means that count is safe for the
bench's fixed-iteration decode.
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

    from sdr_receiver_dvb_t2_tpu.dvbt2 import ldpc as ldpcmod
    from sdr_receiver_dvb_t2_tpu.dvbt2 import tables, interleavers
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import (CodeRate, Constellation,
                                                      FECFrame)
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas as qc

    frame, rate = FECFrame.NORMAL, CodeRate.C2_3
    const = Constellation.QAM256
    code = ldpcmod.get_code(frame, rate)
    B = 128
    rng = np.random.default_rng(42)
    tab = qc.qc_tables(frame, rate)

    # QAM256 cells through an AWGN channel -> exact max-log LLRs
    m = 8
    levels = (tables._gray_levels(m)
              * tables.NORM_FACTOR[const]).astype(np.float64)
    words = np.arange(len(levels))
    half = m // 2
    masks = np.stack([(words >> (half - 1 - b)) & 1
                      for b in range(half)]).astype(bool)

    info = rng.integers(0, 2, (B, code.k)).astype(np.uint8)
    cw = ldpcmod.encode(code, info)
    bits = cw.reshape(B, -1, m)
    ax_i = bits[:, :, 0::2]
    ax_q = bits[:, :, 1::2]

    def axis_to_sym(axbits):
        idx = np.zeros(axbits.shape[:2], np.int64)
        for b in range(half):
            idx = (idx << 1) | axbits[:, :, b]
        return levels[idx]

    si, sq = axis_to_sym(ax_i), axis_to_sym(ax_q)
    es = np.mean(si ** 2 + sq ** 2)

    def llrs_at(snr_db):
        nvar = es / (10.0 ** (snr_db / 10.0))
        ri = si + rng.normal(0, np.sqrt(nvar / 2), si.shape)
        rq = sq + rng.normal(0, np.sqrt(nvar / 2), sq.shape)

        def ax_llr(r):
            d2 = (r[..., None] - levels) ** 2
            out = []
            for b in range(half):
                d0 = np.min(np.where(masks[b], 1e30, d2), axis=-1)
                d1 = np.min(np.where(masks[b], d2, 1e30), axis=-1)
                out.append((d1 - d0) / nvar)
            return np.stack(out, axis=-1)
        li, lq = ax_llr(ri), ax_llr(rq)
        # per-cell bit order y0(I),y1(Q),y2(I),...
        v = np.stack([li, lq], axis=-1).reshape(B, -1)
        return v.astype(np.float32)

    for snr in (17.0, 17.5, 18.0, 19.0, 21.0):
        llr = llrs_at(snr)
        ti, tp = qc.llrs_to_qc(tab, llr)
        row = [f"snr={snr:5.1f}"]
        for iters in (6, 8, 10, 14):
            dec = qc.make_core(frame, rate, iters, B,
                               dtype=jnp.bfloat16, variant="vmem")
            a, b = dec(jnp.asarray(ti), jnp.asarray(tp))
            hard = qc.qc_to_bits(tab, np.asarray(a), np.asarray(b))
            nerr = int((hard != cw).sum())
            nfail = int((hard != cw).any(axis=1).sum())
            row.append(f"it{iters}: {nerr}be/{nfail}cw")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
