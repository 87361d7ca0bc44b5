"""utils coverage: metrics counters, PI loop filter, checkpoint roundtrip."""
import numpy as np

from sdr_receiver_dvb_t2_tpu.utils import loops, metrics


def test_metrics_stages_and_dedup():
    m = metrics.Metrics()
    with m.stage("demod", items=1000):
        pass
    with m.stage("demod", items=1000):
        pass
    m.gauge("snr_db", 21.5)
    m.message("TS error.")
    m.message("TS error.")
    m.message("resync")
    d = m.as_dict()
    assert d["stages"]["demod"]["calls"] == 2
    assert d["stages"]["demod"]["items"] == 2000
    assert d["gauges"]["snr_db"] == 21.5
    assert d["messages"] == ["TS error. (x2)", "resync"]
    assert m.to_json()


def test_pi_loop_converges_on_step():
    """PI filter driving an NCO-style integrator locks onto a constant
    offset (the reference's phase/frequency loop role)."""
    f = loops.PILoopFilter(bandwidth=0.05, damping=0.7071)
    target = 0.3
    est = 0.0
    state = loops.PIState()
    for _ in range(300):
        err = target - est
        state, out = f.step(state, err)
        est += out
    assert abs(est - target) < 1e-3


def test_pi_scan_fn_matches_step():
    import jax
    import jax.numpy as jnp
    f = loops.PILoopFilter(bandwidth=0.1)
    errs = np.random.default_rng(0).normal(size=50).astype(np.float32)
    # python loop
    st = loops.PIState()
    outs = []
    for e in errs:
        st, o = f.step(st, float(e))
        outs.append(o)
    # scan
    _, outs2 = jax.lax.scan(f.scan_fn(), jnp.float32(0.0),
                            jnp.asarray(errs))
    np.testing.assert_allclose(np.asarray(outs2), outs, rtol=1e-5)


def test_exponential_averager_tracks_dc():
    avg = loops.ExponentialAverager(alpha=0.05)
    xs = np.full(200, 0.7 + 0.2j)
    out = avg.run(xs)
    assert abs(out[-1] - (0.7 + 0.2j)) < 1e-3


def test_checkpoint_roundtrip(tmp_path):
    from sdr_receiver_dvb_t2_tpu.utils.checkpoint import ReceiverCheckpoint
    ck = ReceiverCheckpoint(
        sample_offset=12345, cfo_hz=1500.0, fft_mode=5,
        l1pre_bits=[0, 1] * 100, ts_buf=[7, 8, 9], ts_prev_crc=42,
        ts_lost=False, frames_decoded=3)
    p = str(tmp_path / "ck.json")
    ck.save(p)
    ck2 = ReceiverCheckpoint.load(p)
    assert ck2 == ck
