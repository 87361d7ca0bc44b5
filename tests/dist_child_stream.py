"""Child process for the two-process STREAMING handoff test.

Two OS processes join one jax.distributed CPU cluster and stream ONE
capture split into time blocks (BASELINE.md's multi-host time-block
sharding, SURVEY.md sections 2.6/5 — the elastic-continuity state of
rx_sdrplay.cpp:230-279 crossing a HOST boundary instead of a thread
boundary):

  process 0 streams the head of the capture, then hands its receiver
  state — next-frame raw sample offset (frame-grid/lock position),
  accumulated CFO/SCO corrector state, and the TS reassembler's SYNCD
  continuation buffer — to process 1 THROUGH THE DISTRIBUTED RUNTIME
  (multihost_utils.broadcast_one_to_all, the same transport a pod's
  hosts share); process 1 restores and streams the tail.

The parent concatenates both processes' TS output and asserts it equals
a single-process run of the whole capture bit-exactly.

argv: process_id coordinator_addr out_dir
stdout: one JSON line {"pid", "frames", "ts_file", "ts_packets"}.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax                                                    # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
addr = sys.argv[2]
out_dir = sys.argv[3]

jax.distributed.initialize(coordinator_address=addr, num_processes=2,
                           process_id=pid)

import numpy as np                                            # noqa: E402
from jax.experimental import multihost_utils                  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sdr_receiver_dvb_t2_tpu.dvbt2.params import (            # noqa: E402
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    PLPParams, T2Params)
from sdr_receiver_dvb_t2_tpu.io import devices                # noqa: E402
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator  # noqa: E402

N_FRAMES = 8
HEAD_BLOCKS = 5
_STATE_BYTES = 8192


def waveform():
    """Deterministic capture, identical in both processes (the 'recorded
    broadcast' both hosts can reach)."""
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plp = PLPParams(constellation=Constellation.QAM16, rate=CodeRate.C1_2,
                    fec_frame=FECFrame.SHORT, num_blocks_max=3,
                    time_il_length=1)
    mod = T2Modulator(p, [plp])
    rng = np.random.default_rng(5)
    ts = rng.integers(0, 256, (mod.packets_needed(N_FRAMES) + 4, 188)
                      ).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    out = mod.modulate(ts.reshape(-1), N_FRAMES)
    return out.samples


samples = waveform()
# per-process file (the shared out_dir stands in for two hosts' disks)
ck_path = os.path.join(out_dir, f"handoff_p{pid}.ck")
got = []

if pid == 0:
    dev = devices.SimulatedDevice(samples, snr_db=32)
    sr = devices.StreamingReceiver(dev, acq_seconds=0.025,
                                   block_seconds=0.007,
                                   checkpoint_path=ck_path,
                                   checkpoint_every=1)
    st = sr.run(ts_sink=got.append, max_blocks=HEAD_BLOCKS)
    blob = open(ck_path, "rb").read()
    assert len(blob) < _STATE_BYTES, len(blob)
    pad = np.zeros(_STATE_BYTES + 4, np.uint8)
    pad[:4] = np.frombuffer(np.uint32(len(blob)).tobytes(), np.uint8)
    pad[4:4 + len(blob)] = np.frombuffer(blob, np.uint8)
    multihost_utils.broadcast_one_to_all(pad, is_source=True)
else:
    # block until process 0's handoff arrives over the distributed runtime
    pad = np.asarray(multihost_utils.broadcast_one_to_all(
        np.zeros(_STATE_BYTES + 4, np.uint8), is_source=False))
    n = int(np.frombuffer(pad[:4].tobytes(), np.uint32)[0])
    with open(ck_path, "wb") as f:
        f.write(pad[4:4 + n].tobytes())
    dev = devices.SimulatedDevice(samples, snr_db=32)
    sr = devices.StreamingReceiver(dev, acq_seconds=0.025,
                                   block_seconds=0.007)
    st = sr.run(ts_sink=got.append, resume=ck_path)

from sdr_receiver_dvb_t2_tpu.utils.checkpoint import StreamCheckpoint  # noqa

ts = np.concatenate(got) if got else np.zeros(0, np.uint8)
if pid == 0:
    # the checkpoint records how many emitted packets precede the handoff
    import io as _io
    ck = StreamCheckpoint(**json.load(_io.BytesIO(blob)))
    ts = ts[:ck.ts_packets * 188]
ts_file = os.path.join(out_dir, f"ts{pid}.bin")
ts.tofile(ts_file)
print(json.dumps({"pid": pid, "frames": int(st.frames_decoded),
                  "ts_file": ts_file, "ts_packets": len(ts) // 188}))
