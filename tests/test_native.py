"""Native ingest library tests (built on demand; skipped without a toolchain)."""
import numpy as np
import pytest

from sdr_receiver_dvb_t2_tpu import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native toolchain unavailable")
RNG = np.random.default_rng(0)


def test_int16_conversion_matches_numpy():
    iq = RNG.integers(-32768, 32767, 2002).astype(np.int16)
    c = native.int16_to_complex(iq)
    ref = (iq.reshape(-1, 2)[:, 0]
           + 1j * iq.reshape(-1, 2)[:, 1]).astype(np.complex64) / 32768.0
    np.testing.assert_allclose(c, ref, rtol=1e-6)


def test_ring_roundtrip_and_overrun():
    ring = native.IQRing(1024)
    x = (RNG.normal(size=800) + 1j * RNG.normal(size=800)
         ).astype(np.complex64)
    assert ring.push(x) == 800
    y = ring.pop(800)
    np.testing.assert_allclose(y, x, rtol=1e-6)
    big = (RNG.normal(size=2000) + 1j * RNG.normal(size=2000)
           ).astype(np.complex64)
    pushed = ring.push(big)
    assert pushed == 1024
    assert ring.overruns == 2000 - 1024
    ring.close()


def test_ci16_file_reader(tmp_path):
    iq = RNG.integers(-32768, 32767, 4000).astype(np.int16)
    p = str(tmp_path / "cap.ci16")
    iq.tofile(p)
    r = native.read_ci16(p)
    ref = (iq.reshape(-1, 2)[:, 0]
           + 1j * iq.reshape(-1, 2)[:, 1]).astype(np.complex64) / 32768.0
    np.testing.assert_allclose(r, ref, rtol=1e-6)
