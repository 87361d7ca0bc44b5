"""Headless plotting: the reference GUI's panels (spectrum, constellation,
P1-correlation oscilloscope, channel estimate — main_window.cpp:393-441,
plot.cpp) as PNG/CSV dumps for a CLI workflow."""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def spectrum_png(samples: np.ndarray, path: str, fs: float = 64e6 / 7.0,
                 nfft: int = 4096, title: str = "spectrum") -> None:
    plt = _plt()
    n = (len(samples) // nfft) * nfft
    spec = np.fft.fftshift(
        np.mean(np.abs(np.fft.fft(samples[:n].reshape(-1, nfft),
                                  axis=1)) ** 2, axis=0))
    f = np.fft.fftshift(np.fft.fftfreq(nfft, 1.0 / fs)) / 1e6
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(f, 10 * np.log10(spec + 1e-12), lw=0.7)
    ax.set_xlabel("MHz")
    ax.set_ylabel("dB")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def constellation_png(cells: np.ndarray, path: str, max_points: int = 20000,
                      title: str = "constellation") -> None:
    plt = _plt()
    c = cells.reshape(-1)
    if len(c) > max_points:
        c = c[:: len(c) // max_points]
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(np.real(c), np.imag(c), s=1, alpha=0.4)
    ax.set_aspect("equal")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def p1_correlation_png(x: np.ndarray, path: str) -> None:
    from ..rx.p1_detect import p1_correlate
    plt = _plt()
    mag, _ = p1_correlate(x)
    fig, ax = plt.subplots(figsize=(8, 3))
    ax.plot(mag, lw=0.6)
    ax.set_title("P1 correlation")
    ax.set_xlabel("sample")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def channel_estimate_png(carriers_row: np.ndarray, pilot_pos: np.ndarray,
                         pilot_ref: np.ndarray, path: str) -> None:
    plt = _plt()
    est = carriers_row[pilot_pos] / pilot_ref
    fig, (a1, a2) = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
    a1.plot(pilot_pos, np.abs(est), lw=0.7)
    a1.set_ylabel("|H|")
    a2.plot(pilot_pos, np.unwrap(np.angle(est)), lw=0.7)
    a2.set_ylabel("arg H (rad)")
    a2.set_xlabel("carrier")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
