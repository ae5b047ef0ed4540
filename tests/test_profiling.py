"""Profiling utilities smoke tests."""

import time

from speaker_follower_tpu.utils.profiling import StepMeter, Timer, device_fetch


def test_timer_accumulates():
    t = Timer()
    with t.timing():
        time.sleep(0.01)
    with t.timing():
        time.sleep(0.01)
    assert t.milliseconds() >= 20
    assert 10 <= t.average_ms() < 1000
    t.reset()
    assert t.milliseconds() == 0


def test_step_meter():
    m = StepMeter(window=10)
    for _ in range(5):
        m.tick(items=4)
        time.sleep(0.002)
    assert m.steps_per_sec() > 0
    assert m.items_per_sec() > m.steps_per_sec()


def test_device_fetch():
    import jax.numpy as jnp
    import numpy as np

    out = device_fetch({"a": jnp.ones(3), "b": [jnp.zeros(2)]})
    assert isinstance(out["a"], np.ndarray)
    assert isinstance(out["b"][0], np.ndarray)
