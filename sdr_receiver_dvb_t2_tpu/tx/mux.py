"""Base + T2-Lite multiplexing through FEF parts (EN 302 755 clause 8.4
with the T2-Lite profile of annex I).

This is how real networks carry a mobile/low-rate T2-Lite service next to
a base T2 service on one RF channel: the base signal declares FEF parts,
and each FEF part IS one frame of an independent T2-Lite signal (own P1
with S1=T2-Lite, own L1, own PLPs).  Reciprocally, the lite signal's L1
declares the base frames between its own frames as ITS FEF parts, so a
lite-profile receiver's frame grid strides over them.  The receivers
select a service purely by preamble type (`T2Receiver(profile=...)`);
no other coordination is needed — the FEF scheduling machinery of both
signals composes.

The reference application supports neither T2-Lite nor FEF: it would
fail to lock on such a multiplex at all.

Timing invariants (asserted):
  base.fef = (type, lite.frame_samples, K)   — one lite frame per FEF
  lite.fef = (type, K * base.frame_samples, 1) — base frames are lite's FEFs

NOTE the T2-Lite P1 here encodes S2 field 1 with the base FFT-size table
(our TX and RX agree); the standard's table 49 uses a modified coding for
lite preambles (FFT+GI ranges) which a cross-vendor lite receiver would
expect — disclosed deviation, loopback-exact.
"""
from __future__ import annotations

import numpy as np

from ..dvbt2.params import PLPParams, Preamble, T2Params
from .modulator import ModulatorOutput, T2Modulator


class BaseLiteMux:
    """Builds the combined sample stream of a base T2 service and a
    T2-Lite service living in its FEF parts."""

    def __init__(self, base_p: T2Params, base_plps: list[PLPParams],
                 lite_p: T2Params, lite_plps: list[PLPParams],
                 hem: bool = False):
        if base_p.fef is None or base_p.fef[2] <= 0:
            raise ValueError("base params must declare FEF parts")
        if lite_p.preamble not in (Preamble.T2_LITE_SISO,
                                   Preamble.T2_LITE_MISO):
            raise ValueError("lite params must use a T2-Lite preamble")
        interval = base_p.fef[2]
        if base_p.fef[1] != lite_p.frame_samples:
            raise ValueError(
                f"base FEF_LENGTH {base_p.fef[1]} must equal the lite "
                f"frame length {lite_p.frame_samples}")
        want_gap = (0, interval * base_p.frame_samples, 1)
        if lite_p.fef is None or tuple(lite_p.fef[1:]) != want_gap[1:]:
            raise ValueError(
                f"lite params must declare the base frames as their FEF: "
                f"fef=(type, {want_gap[1]}, 1), got {lite_p.fef}")
        self.base_p, self.lite_p = base_p, lite_p
        self.interval = interval
        self.base_mod = T2Modulator(base_p, base_plps, hem=hem,
                                    fef_insert=False)
        self.lite_mod = T2Modulator(lite_p, lite_plps, hem=hem,
                                    fef_insert=False)

    def lite_frames_for(self, n_base_frames: int) -> int:
        return sum(1 for f in range(n_base_frames)
                   if (f + 1) % self.interval == 0)

    def modulate(self, ts_base: np.ndarray, ts_lite: np.ndarray,
                 n_base_frames: int
                 ) -> tuple[np.ndarray, ModulatorOutput, ModulatorOutput]:
        """-> (combined samples, base ModulatorOutput, lite ModulatorOutput).

        The combined stream is [base frames | lite frames] interleaved on
        the base signal's FEF schedule; each service's TS is carried only
        in its own frames."""
        n_lite = self.lite_frames_for(n_base_frames)
        if n_lite == 0:
            raise ValueError("no FEF part inside the requested frames")
        base_out = self.base_mod.modulate(ts_base, n_base_frames)
        lite_out = self.lite_mod.modulate(ts_lite, n_lite)
        # power-match the two services so AGC sees one continuous level
        pb = float(np.mean(np.abs(base_out.samples) ** 2))
        pl = float(np.mean(np.abs(lite_out.samples) ** 2))
        scale = np.sqrt(pb / max(pl, 1e-30)).astype(np.float32)
        stream = []
        li = 0
        for fidx, fr in enumerate(base_out.frames):
            stream.append(fr)
            if self.base_p.fef_after(fidx):
                stream.append(lite_out.frames[li] * scale)
                li += 1
        assert li == n_lite
        return np.concatenate(stream), base_out, lite_out
