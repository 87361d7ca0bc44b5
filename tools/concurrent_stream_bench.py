#!/usr/bin/env python
"""Concurrent two-process streaming measurement (VERDICT r4 next #3).

Runs tests/dist_child_stream2.py — both processes decoding adjacent time
slices of ONE continuous impaired capture SIMULTANEOUSLY, exchanging
per-round boundary state (BB rows, residual CFO/SCO, merged tracking)
through the jax.distributed runtime — on a >=20-frame capture, verifies
the emitted TS is bit-exact against a single-process decode, and merges
the per-round walltimes into SCALING.json under "concurrent_streaming".

Processes are pinned to distinct cores (taskset) so the concurrency is
real on this 2-core host.

    python tools/concurrent_stream_bench.py [--frames 20]
"""
import argparse
import json
import os
import pathlib
import socket
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
CHILD = ROOT / "tests" / "dist_child_stream2.py"


def _free_addr() -> str:
    s = socket.socket()
    s.bind(("localhost", 0))
    addr = f"localhost:{s.getsockname()[1]}"
    s.close()
    return addr


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default=str(ROOT / "SCALING.json"))
    args = ap.parse_args()
    assert args.frames % 4 == 0, "frames must fill whole rounds (4/round)"

    addr = _free_addr()
    out_dir = "/tmp"
    procs = []
    for i in range(2):
        env = {**os.environ, "JAX_PLATFORMS": "cpu"}
        procs.append(subprocess.Popen(
            ["taskset", "-c", str(i % os.cpu_count()), sys.executable,
             "-u", str(CHILD), str(i), addr, out_dir, str(args.frames)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(ROOT / "tests")))
    rs = {}
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            raise RuntimeError(f"child failed:\n{err[-2000:]}")
        r = json.loads(out.strip().splitlines()[-1])
        rs[r["pid"]] = r

    # bit-exactness vs a single-process decode of the whole capture
    import numpy as np
    sys.path.insert(0, str(ROOT / "tests"))
    sys.path.insert(0, str(ROOT))
    import dist_child_stream2 as c2
    from sdr_receiver_dvb_t2_tpu.rx.receiver import T2Receiver
    x, _ = c2.capture(args.frames)
    ref = T2Receiver().receive(
        np.concatenate([x, np.zeros(2048, np.complex64)]))
    ts = np.fromfile(rs[0]["ts_file"], np.uint8)
    exact = (len(ts) >= len(ref.ts) - 2 * 188
             and np.array_equal(ts, ref.ts[:len(ts)]))

    section = {
        "description": "both processes decode adjacent time slices of one "
                       "continuous impaired capture (CFO 600 Hz, SCO "
                       "+20 ppm, 30 dB) CONCURRENTLY, exchanging BB rows "
                       "+ residual CFO/SCO + merged tracking state every "
                       "round via jax.distributed collectives; process 0 "
                       "owns the single TS assembler (pinned, one core "
                       "per process)",
        "frames": args.frames,
        "rounds": len(rs[0]["rounds"]),
        "round_walltimes_s": {str(pid): rs[pid]["rounds"]
                              for pid in (0, 1)},
        "wall_s": {str(pid): rs[pid]["wall_s"] for pid in (0, 1)},
        "cfo_history_hz": rs[0]["cfo_history"],
        "ts_bit_exact_vs_single_process": bool(exact),
        "ts_errors": rs[0]["ts_errors"],
    }
    art = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            art = json.load(f)
    art["concurrent_streaming"] = section
    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(section, indent=1))
    return 0 if exact else 1


if __name__ == "__main__":
    sys.exit(main())
