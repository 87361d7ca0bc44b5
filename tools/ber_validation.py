#!/usr/bin/env python
"""BER validation: Pallas layered decoder (10 iters, f32/bf16) vs the XLA
flooding decoder (25 iters) near the code threshold.

Evidence that the fast layered schedule + reduced precision do not cost
operating-point performance (the reference runs <=25 layered iterations in
int8, ldpc_decoder.h:62)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from sdr_receiver_dvb_t2_tpu.dvbt2 import ldpc as L
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import CodeRate, FECFrame
    from sdr_receiver_dvb_t2_tpu.ops import ldpc as jldpc
    from sdr_receiver_dvb_t2_tpu.ops import ldpc_pallas as qldpc

    frame, rate = FECFrame.NORMAL, CodeRate.C2_3
    code = L.get_code(frame, rate)
    tab = qldpc.qc_tables(frame, rate)
    B = 128
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (B, code.k)).astype(np.uint8)
    cw = L.encode(code, info)
    tx = (1.0 - 2.0 * cw).astype(np.float32)

    decs = {
        "layered10_f32": qldpc.make_decoder_natural(frame, rate, 10, B),
        "flood25_bf16": jldpc.make_decoder(code, iters=25, dtype="bfloat16"),
    }
    # bf16 layered via the nb wrapper
    nb_bf16 = qldpc.make_decoder_nb(frame, rate, 10, B, dtype=jnp.bfloat16)
    # the production REVERSED layer schedule (adaptive kernel capped at
    # 10 sweeps): evidence the permuted order costs no BER either
    nb_rev = qldpc.make_adaptive_decoder_nb_fused_io(
        frame, rate, max_iters=10, check_every=10, batch=B,
        dtype=jnp.bfloat16, layer_order="reversed")
    # rate-2/3 BPSK threshold is around Eb/N0 ~ 2 dB -> sigma ~ 0.8
    for sigma in (0.74, 0.78, 0.82, 0.88):
        llr = (2.0 / sigma**2) * (tx + sigma * rng.normal(
            0, 1.0, (B, code.n))).astype(np.float32)
        row = {}
        for name, dec in decs.items():
            bits = np.asarray(dec(jnp.asarray(llr)))
            row[name] = (bits != cw).mean()
        bits = np.asarray(nb_bf16(jnp.asarray(llr.T))).T
        row["layered10_bf16"] = (bits != cw).mean()
        bits_r, _ = nb_rev(jnp.asarray(llr.T))
        row["layered10_bf16_rev"] = (np.asarray(bits_r).T != cw).mean()
        print(f"sigma={sigma}: " + "  ".join(
            f"{k}={v:.2e}" for k, v in row.items()), flush=True)


if __name__ == "__main__":
    main()
