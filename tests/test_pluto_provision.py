"""Pluto provisioning tool (tools/pluto_provision.py): the
pluto_kernel_patch sequence pinned against a fake ssh transcript
(rx_plutosdr.cpp:324-480 behavior, no hardware)."""
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import pluto_provision as pp  # noqa: E402


class FakeTransport:
    def __init__(self, exec_out=""):
        self.transcript = []
        self.exec_out = exec_out

    def push_dir(self, local_dir, remote_path):
        self.transcript.append(("push_dir", local_dir, remote_path))

    def exec(self, command):
        self.transcript.append(("exec", command))
        return self.exec_out


def _gadget_dir(tmp_path, ko_size=4096):
    d = tmp_path / "plutousbgadget"
    d.mkdir()
    (d / "runme.sh").write_text("#!/bin/sh\ninsmod "
                                "/plutousbgadget/plutousbgadget.ko\n")
    (d / "plutousbgadget.ko").write_bytes(b"\x7fELF" + b"\0" * ko_size)
    return str(d)


def test_provision_transcript_order(tmp_path):
    """Upload first, chmod, then execute runme.sh, then settle — the
    reference's scp-push + channel-exec + sleep(3) order."""
    gd = _gadget_dir(tmp_path)
    t = FakeTransport()
    slept = []
    pp.provision(t, gd, settle_seconds=3.0, sleep=slept.append)
    assert t.transcript == [
        ("push_dir", gd, "/plutousbgadget"),
        ("exec", "chmod +x /plutousbgadget/runme.sh"),
        ("exec", "/plutousbgadget/runme.sh"),
    ]
    assert slept == [3.0]


def test_provision_validates_gadget_dir(tmp_path):
    t = FakeTransport()
    # missing directory contents
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        pp.provision(t, str(empty))
    assert t.transcript == []    # nothing touched the device
    # truncated .ko (an unbuilt placeholder) is rejected
    gd = _gadget_dir(tmp_path, ko_size=8)
    with pytest.raises(ValueError):
        pp.provision(t, gd)
    assert t.transcript == []


def test_verify_parses_gadget_function():
    t = FakeTransport(exec_out="acm.usb0\niiousb2.0\nmass_storage.0\nRC=0\n")
    assert pp.verify(t)
    t2 = FakeTransport(exec_out="RC=1\n")
    assert not pp.verify(t2)


def test_cli_dry_run(tmp_path, capsys):
    gd = _gadget_dir(tmp_path)
    assert pp.main(["--host", "192.168.2.1", "--gadget-dir", gd,
                    "--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "scp -r" in out and "/plutousbgadget" in out
    assert "runme.sh" in out
