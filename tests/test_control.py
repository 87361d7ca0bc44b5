"""Runtime control channel (io/control.py): switch the TS sink and the PLP
selection of a RUNNING streaming receiver without losing lock — the
reference's live set_out path (bb_de_header.cpp:500-525,
main_window.cpp:547-565) in headless form."""
import json
import socket

import numpy as np

from sdr_receiver_dvb_t2_tpu.dvbt2.params import (
    CodeRate, Constellation, FECFrame, FFTMode, GuardInterval, PilotPattern,
    PLPParams, T2Params)
from sdr_receiver_dvb_t2_tpu.io import control as ioctl
from sdr_receiver_dvb_t2_tpu.io import devices
from sdr_receiver_dvb_t2_tpu.rx.receiver import T2Receiver
from sdr_receiver_dvb_t2_tpu.tx.modulator import T2Modulator

N_FRAMES = 10


def _two_plp_waveform():
    p = T2Params(fft_mode=FFTMode.FFT_8K, guard=GuardInterval.GI_1_32,
                 pilot_pattern=PilotPattern.PP1, extended_carrier=False,
                 n_data=9)
    plps = [PLPParams(plp_id=0, constellation=Constellation.QAM16,
                      rate=CodeRate.C1_2, fec_frame=FECFrame.SHORT,
                      num_blocks_max=2, time_il_length=1),
            PLPParams(plp_id=1, constellation=Constellation.QPSK,
                      rate=CodeRate.C1_2, fec_frame=FECFrame.SHORT,
                      rotated=False, num_blocks_max=1, time_il_length=1)]
    mod = T2Modulator(p, plps)
    rng = np.random.default_rng(21)
    ts = rng.integers(0, 256, (mod.packets_needed(N_FRAMES) + 8, 188)
                      ).astype(np.uint8)
    ts[:, 0] = 0x47
    ts[:, 1] &= 0x7F
    out = mod.modulate(ts.reshape(-1), N_FRAMES)
    return out.samples


def _cmd(port, text):
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    s.sendall(text.encode())
    reply = b""
    want = text.count("\n")
    while reply.count(b"\n") < want:
        chunk = s.recv(4096)
        if not chunk:
            break
        reply += chunk
    s.close()
    return reply.decode().strip().splitlines()


def test_switch_plp_and_output_mid_stream(tmp_path):
    """Mid-run: PLP 0 -> PLP 1 and OUT file1 -> file2 through the control
    socket.  No sample loss (every frame decodes), the lock survives, and
    each file carries a contiguous span of the matching PLP's TS.  A final
    held-back packet of the deselected PLP (its NM error flag can no
    longer be amended once the PLP stops) flushes with the next drain."""
    samples = _two_plp_waveform()
    # per-PLP references from one-shot decodes of the same capture
    ref0 = T2Receiver(plp_filter=0).receive(samples).ts
    ref1 = T2Receiver(plp_filter=1).receive(samples).ts
    assert len(ref0) and len(ref1)

    f1 = str(tmp_path / "out1.ts")
    f2 = str(tmp_path / "out2.ts")
    sink = ioctl.SwitchableSink(path=f1)
    ctrl = ioctl.ControlServer(sink)
    dev = devices.SimulatedDevice(samples, snr_db=32)
    sr = devices.StreamingReceiver(dev, T2Receiver(plp_filter=0),
                                   acq_seconds=0.025, block_seconds=0.007)
    switched = []

    def on_block(st, lock, rxstats):
        if lock is not None and st.frames_decoded >= 4 and not switched:
            rep = _cmd(ctrl.port, "PLP 1\nOUT " + f2 + "\nSTATUS\n")
            assert rep[0].startswith("OK plp 1")
            assert rep[1].startswith("OK out")
            # the STATUS snapshot publishes at the loop head, one block
            # behind the on_block counters
            status = json.loads(rep[2])
            assert status["locked"] and status["frames"] >= 1
            switched.append(st.frames_decoded)

    st = sr.run(ts_sink=sink, on_block=on_block, control=ctrl)
    ctrl.close()
    sink.close()
    assert switched, "switch never happened"
    # lock survived the switch and nothing was lost
    assert st.frames_decoded == N_FRAMES
    assert st.reacquisitions == 0
    assert st.ts_errors == 0

    got1 = np.fromfile(f1, np.uint8)
    got2 = np.fromfile(f2, np.uint8)
    assert len(got1) and len(got2)
    # file 1: a prefix of the pure-PLP0 stream
    np.testing.assert_array_equal(got1, ref0[:len(got1)])
    # file 2: optionally the deselected PLP's final held-back packet,
    # then a contiguous span of the pure-PLP1 stream
    if np.array_equal(got2[:188], ref0[len(got1):len(got1) + 188]):
        got2 = got2[188:]
    b1 = bytes(got2)
    assert b1 in bytes(ref1), "file2 is not a contiguous PLP1 span"
    # the span is a large tail portion, not a token few packets
    assert len(got2) >= 5 * 188


def test_control_stop_and_bad_commands(tmp_path):
    """STOP ends the run gracefully after draining; malformed commands are
    rejected without disturbing the stream."""
    samples = _two_plp_waveform()
    f1 = str(tmp_path / "out.ts")
    sink = ioctl.SwitchableSink(path=f1)
    ctrl = ioctl.ControlServer(sink)
    dev = devices.SimulatedDevice(samples, snr_db=32)
    sr = devices.StreamingReceiver(dev, T2Receiver(),
                                   acq_seconds=0.025, block_seconds=0.007)
    stopped = []

    def on_block(st, lock, rxstats):
        if lock is not None and st.frames_decoded >= 2 and not stopped:
            rep = _cmd(ctrl.port, "PLP xyz\nNOPE\nSTOP\n")
            assert rep[0].startswith("ERR")
            assert rep[1].startswith("ERR")
            assert rep[2].startswith("OK stopping")
            stopped.append(st.frames_decoded)

    st = sr.run(ts_sink=sink, on_block=on_block, control=ctrl)
    ctrl.close()
    sink.close()
    assert stopped
    assert 2 <= st.frames_decoded < N_FRAMES   # stopped early, cleanly
    got = np.fromfile(f1, np.uint8)
    assert len(got) >= 188 and got[0] == 0x47


def test_switch_plp_mid_stream_device_path(tmp_path):
    """The control channel composes with the DEVICE receive path
    (--device-path streaming): PLP switch mid-run, no loss, contiguous
    per-PLP spans."""
    from sdr_receiver_dvb_t2_tpu.rx.device_receiver import DeviceT2Receiver
    samples = _two_plp_waveform()
    ref0 = T2Receiver(plp_filter=0).receive(samples).ts
    ref1 = T2Receiver(plp_filter=1).receive(samples).ts
    f1 = str(tmp_path / "d1.ts")
    f2 = str(tmp_path / "d2.ts")
    sink = ioctl.SwitchableSink(path=f1)
    ctrl = ioctl.ControlServer(sink)
    dev = devices.SimulatedDevice(samples, snr_db=32)
    sr = devices.StreamingReceiver(
        dev, DeviceT2Receiver(plp_filter=0, stream_batch=3),
        acq_seconds=0.025, block_seconds=0.007)
    switched = []

    def on_block(st, lock, rxstats):
        if lock is not None and st.frames_decoded >= 4 and not switched:
            rep = _cmd(ctrl.port, "PLP 1\nOUT " + f2 + "\n")
            assert rep[0].startswith("OK") and rep[1].startswith("OK")
            switched.append(st.frames_decoded)

    st = sr.run(ts_sink=sink, on_block=on_block, control=ctrl)
    ctrl.close()
    sink.close()
    assert switched and st.frames_decoded == N_FRAMES
    assert st.reacquisitions == 0
    got1 = np.fromfile(f1, np.uint8)
    got2 = np.fromfile(f2, np.uint8)
    np.testing.assert_array_equal(got1, ref0[:len(got1)])
    if len(got2) and np.array_equal(got2[:188],
                                    ref0[len(got1):len(got1) + 188]):
        got2 = got2[188:]
    assert len(got2) >= 5 * 188
    assert bytes(got2) in bytes(ref1)


def test_control_bad_out_keeps_sink_and_reports(tmp_path):
    """An unwritable OUT target must not crash the receiver loop: the
    previous sink stays attached (set_file opens before it closes),
    bytes keep flowing, and the failure surfaces in the next STATUS
    snapshot (ADVICE r4)."""
    f1 = str(tmp_path / "keep.ts")
    sink = ioctl.SwitchableSink(path=f1)
    ctrl = ioctl.ControlServer(sink)
    try:
        rep = _cmd(ctrl.port, "OUT /nonexistent-dir/zzz/out.ts\n")
        assert rep[0].startswith("OK")   # queued; failure happens at apply

        class RX:
            pass

        ctrl.poll(RX(), flush_ts=lambda: None)   # must not raise
        sink(np.full(188, 0x47, np.uint8))       # old sink still works
        ctrl.publish({"frames": 1})
        rep = _cmd(ctrl.port, "STATUS\n")
        d = json.loads(rep[0])
        assert "zzz" in d.get("control_error", "")
        assert d["frames"] == 1
    finally:
        ctrl.close()
        sink.close()
    got = np.fromfile(f1, np.uint8)
    assert len(got) == 188 and got[0] == 0x47


def test_control_plp_rejected_with_regen():
    """PLP filtering is refused while a regen sink is attached (the cli
    startup guard's invariant, applied to mid-run commands too: a
    regenerated multiplex needs every PLP's BB frames)."""
    sink = ioctl.SwitchableSink()
    ctrl = ioctl.ControlServer(sink)
    try:
        _cmd(ctrl.port, "PLP 1\n")

        class RX:
            plp_filter = None
            regen_sink = object()

        rx = RX()
        ctrl.poll(rx, flush_ts=lambda: None)
        assert rx.plp_filter is None     # filter NOT applied
        ctrl.publish({})
        rep = _cmd(ctrl.port, "STATUS\n")
        assert "regen" in json.loads(rep[0]).get("control_error", "")
    finally:
        ctrl.close()
        sink.close()
