"""Device-side synthesis of DISTINCT per-frame T2 waveforms for benching.

The throughput bench needs F frames with F distinct payloads (a frame-axis
permutation bug must fail its gate), but the host->device tunnel in this
environment moves ~0.2 MB/s — shipping F modulated frames is impossible.
Instead the host ships ONE frame's ingredients and the device synthesizes
frame f by cyclically rolling the FEC-block axis by f:

  - the pre-interleave cell stream (rotation/Q-delay already applied —
    both are per-FEC-block, so whole-block rolls commute with them),
  - the composed cell+time-interleave + framing + frequency-interleave
    map, probed through the real TX chain (a pure permutation),
  - the L1 + pilot + dummy-cell overlay (identical every frame),
  - the P1 preamble.

Frame f's slot b then carries original codeword (b + f) mod nb — a valid
DVB-T2 frame with unique bytes at every (frame, slot).
"""
from __future__ import annotations

import numpy as np

from ..dvbt2 import l1 as l1mod
from ..dvbt2.params import PLPParams, T2Params
from ..tx import fec as txfec
from ..tx import frame as txframe


def probe_maps(p: T2Params, plp: PLPParams, l1_arr: np.ndarray,
               cells0: np.ndarray):
    """Probe the TX interleave+framing chain for the composed map.

    cells0: (nb, cpf) rotated/Q-delayed cells (tx.fec.plp_encode output).
    Returns (stream0 (nb*cpf,) complex, cellmap (len_frame, k_total) int64
    with -1 = overlay position, overlay (len_frame, k_total) complex).
    Asserts the decomposition reproduces the direct modulator's carriers.
    """
    nb, cpf = cells0.shape
    n_cells = nb * cpf
    probe_slice = txframe.interleave_plp_frame(
        plp, (np.arange(n_cells, dtype=np.float64) + 1.0
              ).astype(np.complex64).reshape(nb, cpf))
    carriers_probe = txframe.symbols_to_carriers(
        p, txframe.cells_to_symbols(
            p, txframe.build_frame_cells(p, l1_arr, [probe_slice])))
    overlay = txframe.symbols_to_carriers(
        p, txframe.cells_to_symbols(
            p, txframe.build_frame_cells(
                p, l1_arr, [np.zeros(n_cells, np.complex64)])))
    diff = carriers_probe - overlay
    is_cell = np.abs(diff) > 0.5
    cellmap = np.full(overlay.shape, -1, np.int64)
    cellmap[is_cell] = np.round(np.real(diff[is_cell])).astype(np.int64) - 1
    assert (np.sort(cellmap[is_cell]) == np.arange(n_cells)).all()
    # cross-check against the direct modulator path
    sl0 = txframe.interleave_plp_frame(plp, cells0)
    carriers_ref = txframe.symbols_to_carriers(
        p, txframe.cells_to_symbols(
            p, txframe.build_frame_cells(p, l1_arr, [sl0])))
    stream0 = cells0.reshape(-1)
    recon = overlay.copy()
    recon[is_cell] = recon[is_cell] + stream0[cellmap[is_cell]]
    assert np.allclose(recon, carriers_ref, atol=1e-5)
    return stream0, cellmap, overlay


def make_frame_synth(p: T2Params, cpf: int, n_frames: int,
                     stream0: np.ndarray, cellmap: np.ndarray,
                     overlay: np.ndarray, p1: np.ndarray):
    """Jittable device synthesis: () -> (F, frame_samples) complex frames,
    frame f = roll-by-f codewords.  Ships the ingredients as int16-coded
    device constants (the tunnel boundary carries int16 only).

    Returns (synth_fn, ship) where ship is a dict of device arrays to pass
    to synth_fn (kept explicit so the caller controls the one-time
    transfer).
    """
    import jax
    import jax.numpy as jnp

    s_scale = float(np.max(np.abs(np.stack([stream0.real, stream0.imag]))))
    o_scale = float(np.max(np.abs(np.stack([overlay.real, overlay.imag]))))
    p_scale = float(np.max(np.abs(np.stack([p1.real, p1.imag]))))
    ship = dict(
        stream=jnp.asarray(np.round(np.stack(
            [stream0.real, stream0.imag], axis=-1) / s_scale * 32000.0
        ).astype(np.int16)),
        overlay=jnp.asarray(np.round(np.stack(
            [overlay.real, overlay.imag], axis=-1) / o_scale * 32000.0
        ).astype(np.int16)),
        cmap=jnp.asarray(cellmap.reshape(-1).astype(np.int32)),
        p1=jnp.asarray(np.round(np.stack(
            [p1.real, p1.imag], axis=-1) / p_scale * 32000.0
        ).astype(np.int16)),
    )
    body_len = p.frame_samples - 2048

    def synth(ship):
        stream = ship["stream"].astype(jnp.float32) \
            * jnp.float32(s_scale / 32000.0)
        ovl = ship["overlay"].astype(jnp.float32) \
            * jnp.float32(o_scale / 32000.0)
        rolls = jnp.stack([jnp.roll(stream, -f * cpf, axis=0)
                           for f in range(n_frames)], axis=1)  # (n, F, 2)
        cmap = ship["cmap"]
        data = rolls[jnp.maximum(cmap, 0)]       # (len*k, F, 2) row gather
        ovl_f = ovl.reshape(-1, 1, 2)
        car = jnp.where((cmap < 0)[:, None, None], ovl_f, data)
        car = car.reshape(p.len_frame, p.k_total, n_frames, 2)
        car = jnp.transpose(car, (2, 0, 1, 3))   # (F, len, k, 2)
        carc = jax.lax.complex(car[..., 0], car[..., 1])
        shifted = jnp.pad(carc, ((0, 0), (0, 0),
                                 (p.left_nulls, p.fft_size - p.k_total
                                  - p.left_nulls)))
        spec = jnp.roll(shifted, -(p.fft_size // 2), axis=2)
        sym = jnp.fft.ifft(spec, axis=2) \
            * jnp.float32(p.fft_size / np.sqrt(p.k_total))
        g = p.guard_size
        with_gi = jnp.concatenate([sym[:, :, -g:], sym], axis=2
                                  ).reshape(n_frames, body_len)
        p1c = jax.lax.complex(ship["p1"][..., 0].astype(jnp.float32),
                              ship["p1"][..., 1].astype(jnp.float32)) \
            * jnp.float32(p_scale / 32000.0)
        return jnp.concatenate(
            [jnp.broadcast_to(p1c[None], (n_frames, 2048)), with_gi],
            axis=1)                               # (F, frame_samples)

    return synth, ship
