"""OFDM demodulation: sample stream -> equalized, frequency-deinterleaved
frame cell stream.

TPU-first structure (SURVEY.md §2.6/§7): all symbols of a frame are processed
as one batch — one batched FFT over (len_frame, fft_size), channel estimation
as gathers over precomputed pilot index tables + linear interpolation,
frequency deinterleaving as a single gather — replacing the reference's
per-carrier walk (`data_symbol.cpp:164-317`).

This module is NumPy; `rx.jaxdemod` provides the jitted device path with the
same semantics (these functions serve as its test oracle).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..dvbt2 import interleavers, tables
from ..dvbt2.params import T2Params


@functools.lru_cache(maxsize=None)
def pilot_tables(p: T2Params):
    """Precomputed per-symbol pilot/data index tables for one frame.

    Returns list over symbols of dicts with:
      pilot_pos (int32), pilot_ref (complex64: signed amplitude),
      data_pos (int32), rx_gather (int32 frequency-deinterleave map)
    """
    out = []
    p2_map = tables.p2_carrier_map(p)
    p2_refer = tables.p2_pilot_refer(p)
    _, _, rx_e, rx_o = interleavers.fi_gathers(p, "p2")
    p2_data = np.where(p2_map == tables.DATA)[0].astype(np.int32)
    for j in range(p.n_p2):
        ref = p2_refer[j]
        pos = np.where(ref != 0)[0].astype(np.int32)
        out.append(dict(pilot_pos=pos, pilot_ref=ref[pos],
                        data_pos=p2_data,
                        rx_gather=(rx_e if j % 2 == 0 else rx_o)))
    data_maps = tables.data_carrier_maps(p)
    data_refer = tables.data_pilot_refer(p)
    dy = data_maps.shape[0]
    _, _, rx_e, rx_o = interleavers.fi_gathers(p, "data")
    n_plain = p.n_data - (1 if p.has_fc else 0)
    for i in range(n_plain):
        l = p.n_p2 + i
        cmap = data_maps[l % dy]
        ref = data_refer[i]
        pos = np.where(ref != 0)[0].astype(np.int32)
        out.append(dict(pilot_pos=pos, pilot_ref=ref[pos],
                        data_pos=np.where(cmap == tables.DATA)[0].astype(np.int32),
                        rx_gather=(rx_e if l % 2 == 0 else rx_o)))
    if p.has_fc:
        l = p.len_frame - 1
        fc_map = tables.fc_carrier_map(p)
        ref = tables.fc_pilot_refer(p)
        pos = np.where(ref != 0)[0].astype(np.int32)
        _, _, rx_e, rx_o = interleavers.fi_gathers(p, "fc")
        out.append(dict(pilot_pos=pos, pilot_ref=ref[pos],
                        data_pos=np.where(fc_map == tables.DATA)[0].astype(np.int32),
                        rx_gather=(rx_e if l % 2 == 0 else rx_o)))
    return out


def extract_carriers(p: T2Params, x: np.ndarray, body_start: int) -> np.ndarray:
    """Strip GIs, batched FFT, gather the k_total active carriers.

    body_start: index of the first sample after the P1 (start of symbol 0's
    guard interval).  Returns (len_frame, k_total) complex64.
    """
    g, n = p.guard_size, p.fft_size
    sym = x[body_start:body_start + p.len_frame * p.symbol_size]
    sym = sym.reshape(p.len_frame, p.symbol_size)[:, g:]
    spec = np.fft.fftshift(np.fft.fft(sym, axis=1), axes=1)
    return spec[:, p.left_nulls:p.left_nulls + p.k_total]


@dataclass
class DemodResult:
    frame_cells: np.ndarray        # concatenated deinterleaved data cells
    snr_db: float                  # pilot-based SNR estimate
    timing_offset: float = 0.0     # symbol-timing offset in samples
    channel: np.ndarray | None = None


def equalize_frame(p: T2Params, carriers: np.ndarray) -> DemodResult:
    """Pilot-aided equalization + frequency deinterleave of one frame."""
    tabs = pilot_tables(p)
    assert carriers.shape[0] == len(tabs) == p.len_frame
    k = np.arange(p.k_total)
    cells_out = []
    err_acc, sig_acc = 0.0, 0.0
    # symbol-timing offset from the pilot-phase slope of the first symbol:
    # a delay of tau samples rotates carrier k by -2*pi*k*tau/N (the quantity
    # the reference feeds its sample-rate loop, data_symbol.cpp:319-324)
    t0 = tabs[0]
    est0 = carriers[0][t0["pilot_pos"]] / t0["pilot_ref"]
    dphi = np.angle(np.sum(est0[1:] * np.conj(est0[:-1])))
    dk = float(np.mean(np.diff(t0["pilot_pos"])))
    timing = -dphi / (2.0 * np.pi * dk) * p.fft_size
    for row, tab in zip(carriers, tabs):
        pos = tab["pilot_pos"]
        ref = tab["pilot_ref"]
        est_p = row[pos] / ref
        # linear interpolation of the complex channel across carriers
        est = (np.interp(k, pos, est_p.real)
               + 1j * np.interp(k, pos, est_p.imag))
        eq = row / est
        data = eq[tab["data_pos"]]
        cells_out.append(data[tab["rx_gather"]])
        # SNR estimate from adjacent-pilot channel-estimate differences:
        # on a slowly-varying channel est_p[i]-est_p[i+1] is noise-dominated
        # (each pilot estimate carries noise/|ref|^2; the difference doubles
        # the noise variance), unlike the interpolated residual which is
        # zero at pilots by construction.
        d = est_p[1:] - est_p[:-1]
        err_acc += float(np.mean(np.abs(d) ** 2)) / 2.0 \
            * float(np.mean(np.abs(ref) ** 2))
        sig_acc += float(np.mean(np.abs(est_p) ** 2)) \
            * float(np.mean(np.abs(ref) ** 2))
    snr = 10.0 * np.log10(sig_acc / max(err_acc, 1e-30))
    return DemodResult(frame_cells=np.concatenate(cells_out), snr_db=snr,
                       timing_offset=float(timing))
