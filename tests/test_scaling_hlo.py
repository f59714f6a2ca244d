"""Scaling evidence without a pod: audit the compiled collective schedule.

Real multi-chip runs are unreachable from CI, but XLA compiles the exact
cross-device schedule for the 8-virtual-device mesh, and the scaling
story is fully determined by it (docs/SCALING.md carries the bandwidth
model built on these audited byte counts). These tests pin the schedule:

  * the DP train step communicates EXACTLY one class of payload — the
    gradient all-reduce of ~param bytes (+ scalar loss/metric psums);
    no all-gathers (params replicated, batch consumed in place), no
    all-to-alls, no resharding collective-permutes;
  * the tile-sharded render all-gathers ~output-image bytes once and
    reduces nothing else.

A stray resharding (donation change, accidental sharding constraint)
multiplies step latency on a real pod while every numeric test stays
green — this is the test that catches it. Reference analog: none (its
scaling is Lightning DDP, reference train.py:71).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keypointnerf_tpu.data import SyntheticConfig, make_sample
from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch
from keypointnerf_tpu.parallel import make_mesh
from keypointnerf_tpu.parallel.audit import (
    collective_inventory,
    format_inventory,
    total_bytes,
)
from keypointnerf_tpu.parallel.train_parallel import (
    make_sharded_render,
    make_sharded_train_step,
    stack_batch,
)
from keypointnerf_tpu.training import OptimConfig, create_train_state
from keypointnerf_tpu.training.losses import LossConfig

TINY = KeypointNeRFConfig(
    n_coarse=8, n_fine=8, patch_h=8, patch_w=8, geo_n_downsample=2
)

# scalar psums (loss means, grad-norm, metric reductions) ride with the
# grad all-reduce or stay tiny; anything past this is a tensor payload
SLACK_BYTES = 64 * 1024


@pytest.fixture(scope="module")
def setup():
    model = KeypointNeRF(TINY)
    mesh = make_mesh()
    samples = [
        ViewBatch(**jax.tree.map(jnp.asarray, make_sample(
            SyntheticConfig(image_size=64), seed=i)))
        for i in range(len(jax.devices()))
    ]
    state = create_train_state(model, samples[0], OptimConfig())
    return model, mesh, samples, state


def test_train_step_collectives_are_one_grad_allreduce(setup):
    model, mesh, samples, state = setup
    assert len(jax.devices()) >= 8, "needs the 8-virtual-device CPU mesh"
    step = make_sharded_train_step(model, LossConfig(lambda_vgg=0.0), mesh)
    batch = stack_batch(samples)
    hlo = step.lower(state, batch, jax.random.key(0)).compile().as_text()
    inv = collective_inventory(hlo)
    pretty = format_inventory(inv)

    grad_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(state.params)
    )
    ar = total_bytes(inv, "all-reduce")
    # the gradient psum: everything the DP step must communicate. XLA may
    # split it into a few fused buckets but the TOTAL must stay ~grad
    # bytes (measured: ONE fused all-reduce at +0.4% for the scalar
    # loss/metric reductions) — a 2x total means gradients are being
    # reduced twice
    assert grad_bytes <= ar <= int(grad_bytes * 1.02) + SLACK_BYTES, (
        f"grad all-reduce should total ~{grad_bytes} B, got {ar} B\n{pretty}"
    )
    # and it must be FUSED: one transfer's latency, not hundreds
    assert len(inv["all-reduce"]) <= 4, pretty
    # no resharding: params are replicated and the batch is consumed where
    # it lives, so any all-gather is an accidental reshard
    assert total_bytes(inv, "all-gather") <= SLACK_BYTES, pretty
    assert "all-to-all" not in inv, pretty
    assert "collective-permute" not in inv, pretty
    assert "reduce-scatter" not in inv, pretty  # no ZeRO sharding configured


def test_sharded_render_collectives_are_one_image_allgather(setup):
    model, mesh, samples, state = setup
    H = W = 32
    render = make_sharded_render(model, mesh, chunk=64)
    hlo = render.jitted.lower(
        state.params, samples[0], H, W, 1
    ).compile().as_text()
    inv = collective_inventory(hlo)
    pretty = format_inventory(inv)

    # output dict: rgb/depth/acc for coarse+fine (+sdf_fine) = 11 f32/ray
    n_rays = H * W
    out_bytes = n_rays * 11 * 4
    # XLA implements the replicated image assembly as either an
    # all-gather OR a masked-add all-reduce of the same payload (both
    # observed across compiles of this exact program); what the test pins
    # is the BYTES — ~one image's worth, not a reshard of the feature
    # maps / params (orders of magnitude larger)
    comm = total_bytes(inv, "all-gather") + total_bytes(inv, "all-reduce")
    assert out_bytes * 7 // 8 <= comm <= 4 * out_bytes + SLACK_BYTES, (
        f"render assembly should move ~{out_bytes} B, got {comm} B\n{pretty}"
    )
    assert "all-to-all" not in inv, pretty


def test_collective_inventory_parser():
    txt = """
  %ar = f32[1024,8]{1,0} all-reduce(f32[1024,8]{1,0} %x), replica_groups={}
  %ag.1 = (f32[64]{0}, bf16[32]{0}) all-gather(f32[8]{0} %a, bf16[4]{0} %b)
  %cp = u32[16]{0} collective-permute-start(u32[16]{0} %y)
  %cpd = u32[16]{0} collective-permute-done(u32[16]{0} %cp)
"""
    inv = collective_inventory(txt)
    assert total_bytes(inv, "all-reduce") == 1024 * 8 * 4
    assert total_bytes(inv, "all-gather") == 64 * 4 + 32 * 2
    # start/done pairs count once
    assert len(inv["collective-permute"]) == 1
    assert total_bytes(inv, "collective-permute") == 16 * 4
