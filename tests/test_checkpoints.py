"""Orbax checkpoint manager round-trip + retention tests."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax.training import train_state

from keypointnerf_tpu.utils import CheckpointManager


def make_state(value: float):
    params = {"w": jnp.full((4, 4), value), "b": jnp.zeros(4)}
    return train_state.TrainState.create(
        apply_fn=lambda p, x: x, params=params, tx=optax.adam(1e-3)
    )


def test_save_restore_round_trip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    state = make_state(1.5)
    mgr.save(10, state, metrics={"loss": 0.5})
    mgr.wait()

    template = make_state(0.0)
    restored, step = mgr.restore(template)
    assert step == 10
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.full((4, 4), 1.5)
    )
    assert int(restored.step) == int(state.step)
    mgr.close()


def test_restore_empty_returns_none(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    restored, step = mgr.restore(make_state(0.0))
    assert restored is None and step is None
    mgr.close()


def test_latest_step_and_multiple_saves(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    for s in (1, 5, 9):
        mgr.save(s, make_state(float(s)))
    mgr.wait()
    assert mgr.latest_step() == 9
    restored, step = mgr.restore(make_state(0.0), step=5)
    assert step == 5
    np.testing.assert_array_equal(np.asarray(restored.params["w"])[0, 0], 5.0)
    # keep-all policy (reference save_top_k=-1): every step still there
    restored1, _ = mgr.restore(make_state(0.0), step=1)
    assert restored1 is not None
    mgr.close()


def test_best_step_selection(tmp_path):
    """Best-model tracking on min val_total_loss (reference ModelCheckpoint,
    train.py:34-43): restore(best=True) must pick the best step, not the
    latest."""
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    for s, loss in ((1, 0.5), (2, 0.2), (3, 0.4)):
        mgr.save(s, make_state(float(s)), metrics={"val_total_loss": loss})
    mgr.wait()
    assert mgr.best_step() == 2
    assert mgr.latest_step() == 3
    restored, step = mgr.restore(make_state(0.0), best=True)
    assert step == 2
    np.testing.assert_array_equal(np.asarray(restored.params["w"])[0, 0], 2.0)
    mgr.close()


def test_best_falls_back_to_latest_without_metrics(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(7, make_state(7.0))
    mgr.wait()
    restored, step = mgr.restore(make_state(0.0), best=True)
    assert step == 7 and restored is not None
    mgr.close()


def test_best_step_zero_is_not_discarded(tmp_path):
    """A best checkpoint at step 0 must win over a worse later step —
    `best_step() or latest_step()` would discard the falsy 0."""
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(0, make_state(0.0), metrics={"val_total_loss": 0.1})
    mgr.save(3, make_state(3.0), metrics={"val_total_loss": 0.9})
    mgr.wait()
    restored, step = mgr.restore(make_state(0.0), best=True)
    assert step == 0
    np.testing.assert_array_equal(np.asarray(restored.params["w"])[0, 0], 0.0)
    mgr.close()
