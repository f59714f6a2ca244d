"""Train-state construction and the jitted train / eval steps.

TPU-native replacement of the reference's Lightning harness
(src/model.py:28-556, train.py:59-80): a flax TrainState with optax Adam
(lr 5e-4, reference model.py:46-47), a pure jitted `train_step` doing
forward → loss → grad → update, and an `eval_step` computing validation
losses. Multi-device sharding of these steps lives in parallel/.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..models.keypoint_nerf import KeypointNeRF, ViewBatch
from .losses import LossConfig, compute_losses


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 5e-4       # reference model.py:47
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip: Optional[float] = None
    accumulate_steps: int = 1          # reference train.py:69 accumulate_grad_batches
    weight_decay: float = 0.0
    # learning-rate schedule (the reference trains at constant lr;
    # schedules are standard production practice)
    lr_schedule: str = "constant"      # "constant" | "cosine" | "exponential"
    warmup_steps: int = 0
    decay_steps: int = 100_000         # horizon for cosine / exponential
    lr_final_scale: float = 0.01       # end lr = learning_rate * this


class TrainState(train_state.TrainState):
    """TrainState carrying the frozen VGG feature params for the loss."""

    vgg_params: Any = None


def make_lr(cfg: OptimConfig):
    """Build the lr schedule (a plain float for constant-no-warmup)."""
    if cfg.lr_schedule == "constant" and cfg.warmup_steps == 0:
        return cfg.learning_rate
    if cfg.lr_schedule == "constant":
        main = optax.constant_schedule(cfg.learning_rate)
    elif cfg.lr_schedule == "cosine":
        main = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.decay_steps, alpha=cfg.lr_final_scale
        )
    elif cfg.lr_schedule == "exponential":
        main = optax.exponential_decay(
            cfg.learning_rate, cfg.decay_steps, cfg.lr_final_scale
        )
    else:
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    if cfg.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps)
        return optax.join_schedules([warm, main], [cfg.warmup_steps])
    return main


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    lr = make_lr(cfg)
    chain = []
    if cfg.grad_clip:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.weight_decay > 0.0:
        chain.append(
            optax.adamw(lr, b1=cfg.beta1, b2=cfg.beta2,
                        weight_decay=cfg.weight_decay)
        )
    else:
        chain.append(optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2))
    tx = optax.chain(*chain)
    if cfg.accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_steps)
    return tx


def create_train_state(
    model: KeypointNeRF,
    sample_vb: ViewBatch,
    optim_cfg: OptimConfig = OptimConfig(),
    seed: int = 125,                   # reference seeds init with 125 (model.py:614)
    vgg_params=None,
) -> TrainState:
    rng = jax.random.key(seed)
    k_param, k_render = jax.random.split(rng)
    params = model.init({"params": k_param, "render": k_render}, sample_vb, True)
    # commit every leaf to a device buffer: eager init can leave scalar
    # params (e.g. ibr_head/ani_al from a constant initializer) as
    # uncommitted jax literals, which orbax refuses to serialize if the
    # state is checkpointed before a jitted step has rebuilt it
    params = jax.device_put(params)
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(optim_cfg),
        vgg_params=vgg_params,
    )


def train_step_fn(
    model: KeypointNeRF,
    loss_cfg: LossConfig,
    state: TrainState,
    vb: ViewBatch,
    rng: jax.Array,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One SGD step on one sample (batch handled by vmap/sharding outside)."""

    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        out = model.apply(params, vb, True, rngs={"render": step_rng})
        total, err = compute_losses(out, loss_cfg, state.vgg_params)
        return total, err

    (loss, err), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    err = dict(err)
    err["grad_norm"] = optax.global_norm(grads)
    return state, err


def eval_step_fn(
    model: KeypointNeRF,
    loss_cfg: LossConfig,
    state: TrainState,
    vb: ViewBatch,
    rng: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """Validation losses on a random patch (reference validation_step,
    src/model.py:509-526) — train-mode patching with fixed rng, no update."""
    out = model.apply(state.params, vb, True, rngs={"render": rng})
    _, err = compute_losses(out, loss_cfg, state.vgg_params)
    return err


def jit_train_step(model: KeypointNeRF, loss_cfg: LossConfig):
    return jax.jit(lambda s, vb, rng: train_step_fn(model, loss_cfg, s, vb, rng))


def jit_eval_step(model: KeypointNeRF, loss_cfg: LossConfig):
    return jax.jit(lambda s, vb, rng: eval_step_fn(model, loss_cfg, s, vb, rng))
