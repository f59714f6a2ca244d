"""Profiling / numerics utilities tests."""
import jax.numpy as jnp
import numpy as np

from keypointnerf_tpu.utils import StepTimer, check_finite


def test_step_timer_throughput():
    import time

    t = StepTimer(window=10)
    for _ in range(4):
        t.tick()
        time.sleep(0.01)
    m = t.metrics(rays_per_step=100, points_per_step=1000)
    assert 0.005 < m["step_time_s"] < 0.5
    assert m["rays_per_sec"] > 0
    assert np.isclose(m["points_per_sec"], 10 * m["rays_per_sec"])


def test_check_finite():
    good = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
    bad = {"a": jnp.array([1.0, jnp.nan]), "b": jnp.ones(2)}
    assert bool(check_finite(good))
    assert not bool(check_finite(bad))
    inf = {"a": jnp.array([jnp.inf])}
    assert not bool(check_finite(inf))
