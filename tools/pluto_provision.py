#!/usr/bin/env python
"""Stock-Pluto bring-up: provision the USB-gadget kernel module over ssh.

Mirrors the reference's `rx_plutosdr::pluto_kernel_patch`
(/root/reference/src/rx_plutosdr.cpp:324-480): connect to the Pluto's
ssh (root@192.168.2.1 or .3.1, password "analog"), push a directory
containing `runme.sh` + `plutousbgadget.ko`, and execute the script —
which tears down the stock USB gadget, insmods the module, registers the
hi-speed IIO-USB function and re-binds the UDC, so the custom bulk
streaming driver (`plutosdr_hi_speed_rx`, bound by io/vendor.py) can
stream at full rate.

The gadget sources are NOT vendored here (they are ADI/reference
binaries; see native/pluto/README.md for how to obtain and build them) —
pass the built directory with --gadget-dir.

Transport: by default shells out to the system `ssh`/`scp` (use
key-based auth, an ssh-agent, or sshpass for the stock "analog"
password).  The transport is injectable so the sequence is tested
against a fake transcript in CI (tests/test_pluto_provision.py) without
hardware.

Usage:
  python tools/pluto_provision.py --host 192.168.2.1 \
      --gadget-dir path/to/plutousbgadget [--dry-run]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


class CommandTransport:
    """ssh/scp CLI transport (key/agent/sshpass authentication)."""

    def __init__(self, host: str, user: str = "root",
                 ssh_opts: tuple = ("-o", "StrictHostKeyChecking=no")):
        self.target = f"{user}@{host}"
        self.ssh_opts = list(ssh_opts)

    def push_dir(self, local_dir: str, remote_path: str) -> None:
        subprocess.run(["scp", *self.ssh_opts, "-r", local_dir,
                        f"{self.target}:{remote_path}"], check=True)

    def exec(self, command: str) -> str:
        r = subprocess.run(["ssh", *self.ssh_opts, self.target, command],
                           check=True, capture_output=True, text=True)
        return r.stdout


class DryRunTransport:
    """Print the steps instead of executing them."""

    def __init__(self, host: str, user: str = "root"):
        self.target = f"{user}@{host}"

    def push_dir(self, local_dir: str, remote_path: str) -> None:
        print(f"[dry-run] scp -r {local_dir} {self.target}:{remote_path}")

    def exec(self, command: str) -> str:
        print(f"[dry-run] ssh {self.target} {command!r}")
        return ""


REQUIRED_FILES = ("runme.sh", "plutousbgadget.ko")


def provision(transport, gadget_dir: str, remote_dir: str = "/plutousbgadget",
              settle_seconds: float = 3.0, sleep=time.sleep) -> None:
    """The pluto_kernel_patch sequence: validate + upload + execute.

    Order matches the reference: push the directory (script first, then
    the module — scp -r copies both), run `/plutousbgadget/runme.sh`,
    then give the gadget re-enumeration time to settle
    (rx_plutosdr.cpp: QThread::sleep(3) after the exec)."""
    for name in REQUIRED_FILES:
        path = os.path.join(gadget_dir, name)
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"{path} missing: --gadget-dir must hold the built gadget "
                f"files {REQUIRED_FILES} (see native/pluto/README.md)")
    ko = os.path.join(gadget_dir, "plutousbgadget.ko")
    if os.path.getsize(ko) < 1024:
        raise ValueError(f"{ko} is suspiciously small — not a built module?")
    transport.push_dir(gadget_dir, remote_dir)
    # make the script executable regardless of how the transport carried
    # the mode bits, then run it (it insmods the module itself)
    transport.exec(f"chmod +x {remote_dir}/runme.sh")
    transport.exec(f"{remote_dir}/runme.sh")
    sleep(settle_seconds)


def verify(transport, remote_dir: str = "/plutousbgadget") -> bool:
    """Post-check: the module is loaded and the gadget function exists."""
    out = transport.exec(
        "lsmod | grep -q plutousbgadget && "
        "ls /sys/kernel/config/usb_gadget/composite_gadget/functions "
        "2>/dev/null; echo RC=$?")
    return "iiousb" in out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Provision a stock ADALM-Pluto with the hi-speed "
                    "USB-gadget module (reference pluto_kernel_patch "
                    "parity)")
    ap.add_argument("--host", default="192.168.2.1",
                    help="Pluto's address (stock USB network: 192.168.2.1; "
                         "the reference uses 192.168.3.1)")
    ap.add_argument("--user", default="root")
    ap.add_argument("--gadget-dir", required=True,
                    help="directory holding runme.sh + plutousbgadget.ko "
                         "(build per native/pluto/README.md)")
    ap.add_argument("--remote-dir", default="/plutousbgadget")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--verify", action="store_true",
                    help="check lsmod/gadget function after provisioning")
    args = ap.parse_args(argv)

    t = (DryRunTransport(args.host, args.user) if args.dry_run
         else CommandTransport(args.host, args.user))
    provision(t, args.gadget_dir, args.remote_dir,
              settle_seconds=0.0 if args.dry_run else 3.0)
    if args.verify and not args.dry_run:
        ok = verify(t, args.remote_dir)
        print(f"gadget {'ACTIVE' if ok else 'NOT DETECTED'}",
              file=sys.stderr)
        return 0 if ok else 1
    print("provisioned; replug/reboot the Pluto if enumeration stalls",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
