"""Child process for the CONCURRENT two-process streaming test.

VERDICT r4 next #3: both processes ingest adjacent time slices of ONE
continuous impaired capture SIMULTANEOUSLY — not the round-3/4
finish-then-relay — exchanging boundary state every round through the
distributed runtime:

  round r:  process 0 decodes slice 2r   (G frames)   } concurrently
            process 1 decodes slice 2r+1 (G frames)   }
  then two collectives:
    1. process 1 -> 0: its slice's decoded BB rows + measured residual
       CFO/SCO/timing (the in-flight handoff of decoded payload),
    2. process 0 -> 1: the MERGED tracking state both use for the next
       round (frame-grid offset, shared CFO/SCO) — the cross-host analogue
       of the reference's signal_estimate feedback crossing its device
       thread (rx_sdrplay.cpp:230-279, dvbt2_demodulator.h:42-52).

Process 0 owns the single TS assembler (the sink host): it pushes its own
slice's rows then the received partner rows each round, so the SYNCD
continuation chain lives in ONE assembler and the emitted TS is bit-exact
against a single-process decode of the whole capture, while the heavy
demod+FEC work ran data-parallel across the processes.

The capture carries real impairments (CFO + SCO + AWGN) so the shared
tracking state is load-bearing: each slice decode starts from the
exchanged state, and per-round residuals fold back into it.

argv: process_id coordinator_addr out_dir n_frames
stdout: one JSON line
  {"pid", "frames", "rounds": [per-round decode seconds], "ts_file",
   "cfo_history": [...], "wall_s"}.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=1")

import numpy as np                                            # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FS = 9142857.142857143
CFO_TRUE = 600.0
SCO_TRUE = 2.0e-5
G = 2                      # frames per slice
NB = 3
KB8 = 7032 // 8            # SHORT C1/2 kbch bytes
ROWS_BYTES = G * NB * KB8
_XCHG = ROWS_BYTES + 64    # rows + measurement floats


def capture(n_frames=12):
    """Deterministic impaired capture both processes can reach (the
    recorded broadcast): CFO + SCO + AWGN over n_frames 8K frames."""
    from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
        CodeRate, Constellation, FECFrame, FFTMode, GuardInterval,
        PilotPattern, PLPParams, T2Params)
    from sdr_receiver_dvb_t2_tpu.rx import frontend
    from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=NB,
                    time_il_length=1)
    mod = T2Modulator(p, [plp])
    rng = np.random.default_rng(23)
    ts = rng.integers(0, 256, (mod.packets_needed(n_frames) + 4, 188)
                      ).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    out = mod.modulate(ts.reshape(-1), n_frames)
    x = out.samples
    # device clock +SCO_TRUE: raw sample m sees the signal at m/(1+sco)
    x = frontend.sinc_resample(x, 1.0 / (1.0 + SCO_TRUE))
    n = np.arange(len(x))
    x = (x * np.exp(2j * np.pi * CFO_TRUE * n / FS)).astype(np.complex64)
    sig = float(np.sqrt(np.mean(np.abs(x) ** 2)))
    x = x + (sig * 10 ** (-30 / 20) / np.sqrt(2)
             * (rng.normal(size=len(x)) + 1j * rng.normal(size=len(x)))
             ).astype(np.complex64)
    return x, p


class _BBCollector:
    def __init__(self):
        self.rows = []

    def start_frame(self, params, l1pre, l1post):
        pass

    def add_bb(self, plp_id, bb):
        self.rows.append(np.packbits(np.asarray(bb, np.uint8), axis=1))

    def mark_bad(self):
        raise AssertionError("FEC failure in concurrent slice decode")


def decode_slice(x, state, s, frame_samp):
    """Decode slice s (frames s*G .. s*G+G-1) from the raw capture using
    the SHARED tracking state; returns (rows (G*NB, KB8), measured
    residual cfo Hz, residual sco)."""
    from sdr_receiver_dvb_t2_tpu.rx import frontend
    from sdr_receiver_dvb_t2_tpu.rx.receiver import T2Receiver
    cfo, ratio, p1_raw = state
    fa = p1_raw + (s * G) * frame_samp * ratio
    fb = p1_raw + (s * G + G) * frame_samp * ratio
    a = max(0, int(np.floor(fa)) - 64)
    b = min(len(x), int(np.ceil(fb)) + frame_samp // 2)
    xs = x[a:b]
    if b >= len(x) - 8:
        # capture-end slice: the resampler's tap margin would otherwise
        # eat the last frame's final samples
        xs = np.concatenate([xs, np.zeros(1024, np.complex64)])
    n = np.arange(len(xs)) + a          # absolute phase: slice-invariant
    xs = (xs * np.exp(-2j * np.pi * cfo * n / FS)).astype(np.complex64)
    if abs(ratio - 1.0) > 1e-7:
        xs = frontend.sinc_resample(xs, ratio)
    rx = T2Receiver()
    col = _BBCollector()
    rx.regen_sink = col
    res = rx.receive(xs)
    assert res.stats.frames_decoded == G, \
        (s, res.stats.frames_decoded)
    rows = np.concatenate(col.rows)
    assert rows.shape == (G * NB, KB8), rows.shape
    return rows, float(res.stats.cfo_hz), float(res.stats.sco_ppm) * 1e-6


def main():
    # jax.distributed BEFORE any package import touches a backend (the
    # relay child does the same; a pre-initialized CPU backend deadlocks
    # the first collective)
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    addr = sys.argv[2]
    out_dir = sys.argv[3]
    n_frames = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    jax.distributed.initialize(coordinator_address=addr, num_processes=2,
                               process_id=pid)
    from jax.experimental import multihost_utils
    from sdr_receiver_dvb_t2_tpu.dvbt2 import bbframe
    from sdr_receiver_dvb_t2_tpu.rx import frontend
    from sdr_receiver_dvb_t2_tpu.rx.receiver import T2Receiver

    x, p = capture(n_frames)
    frame_samp = p.frame_samples
    n_slices = n_frames // G
    assert n_slices % 2 == 0
    n_rounds = n_slices // 2

    t_wall = time.time()
    # --- initial acquisition on process 0, state broadcast to both -----
    if pid == 0:
        rx0 = T2Receiver()
        ls, cfo_e, ratio_e, _ = rx0.refine_acquire(x[:3 * frame_samp])
        assert ls is not None
        state0 = np.array([cfo_e, ratio_e,
                           float(ls.frame_start) * ratio_e], np.float64)
        # f64 crosses the runtime as BYTES (x64 is off; a float64 array
        # would silently round to f32)
        multihost_utils.broadcast_one_to_all(
            np.frombuffer(state0.tobytes(), np.uint8), is_source=True)
    else:
        raw0 = np.asarray(multihost_utils.broadcast_one_to_all(
            np.zeros(24, np.uint8), is_source=False))
        state0 = np.frombuffer(raw0.tobytes(), np.float64)

    state = (float(state0[0]), float(state0[1]), float(state0[2]))
    cfo_history = [state[0]]

    assembler = bbframe.TSAssembler() if pid == 0 else None
    round_times = []
    for r in range(n_rounds):
        own_slice = 2 * r + pid
        t0 = time.time()
        rows, d_cfo, d_sco = decode_slice(x, state, own_slice, frame_samp)
        round_times.append(time.time() - t0)

        # collective 1: process 1's rows + residuals -> process 0
        buf = np.zeros(_XCHG, np.uint8)
        if pid == 1:
            buf[:ROWS_BYTES] = rows.reshape(-1)
            buf[ROWS_BYTES:ROWS_BYTES + 16] = np.frombuffer(
                np.array([d_cfo, d_sco], np.float64).tobytes(), np.uint8)
        got = np.asarray(multihost_utils.broadcast_one_to_all(
            buf, is_source=(pid == 1)))
        if pid == 0:
            partner_rows = got[:ROWS_BYTES].reshape(G * NB, KB8)
            p_cfo, p_sco = np.frombuffer(
                got[ROWS_BYTES:ROWS_BYTES + 16].tobytes(), np.float64)
            # sink host: own slice first (earlier frames), then the
            # partner's — ONE assembler carries the SYNCD continuation
            assembler.push_frames(rows)
            assembler.push_frames(partner_rows)
            # merge both processes' residuals into the next round's
            # shared state (the signal_estimate feedback, cross-host)
            new_cfo = state[0] + 0.5 * (d_cfo + p_cfo)
            new_ratio = state[1] * (1.0 + 0.5 * (d_sco + p_sco))
            upd = np.frombuffer(np.array(
                [new_cfo, new_ratio, state[2]], np.float64).tobytes(),
                np.uint8)
        else:
            upd = np.zeros(24, np.uint8)
        # collective 2: merged tracking state for the next round -> both
        upd = np.frombuffer(np.asarray(multihost_utils.broadcast_one_to_all(
            upd, is_source=(pid == 0))).tobytes(), np.float64)
        state = (float(upd[0]), float(upd[1]), float(upd[2]))
        cfo_history.append(state[0])

    wall = time.time() - t_wall
    out = {"pid": pid, "frames": n_rounds * G, "rounds": round_times,
           "cfo_history": cfo_history, "wall_s": wall}
    if pid == 0:
        ts = assembler.ts_bytes()
        ts_file = os.path.join(out_dir, "concurrent_ts.bin")
        ts.tofile(ts_file)
        out["ts_file"] = ts_file
        out["ts_errors"] = int(assembler.errors)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
