"""Pallas TPU kernel prototype: DMA-pipelined bilinear patch gather.

The bilinear feature gathers are the dominant cost of the render hot path
(~40% after round-1 optimizations; see docs/ARCHITECTURE.md). XLA lowers
them to generic dynamic-gathers; this kernel instead streams the (2, 2, C)
interpolation patches from HBM with explicit async DMAs — many copies in
flight hide HBM latency, and the interpolation happens in VMEM as the
patches land.

Design:
  * the feature map stays in HBM (`memory_space=ANY`), never fully copied;
  * patch base indices (y0, x0) are scalar-prefetched
    (PrefetchScalarGridSpec) so the kernel can address the DMAs;
  * per grid step, a tile of TILE points is fetched into a
    (TILE, 2, 2, C) VMEM scratch through a ring of in-flight DMAs
    (double-buffered at patch granularity), then interpolated with the
    prefetched fractional weights.

Status: interpret-mode verified (parity vs ops/feat_sample). The axon
relay's remote Mosaic compiler could not be used to validate on hardware
this round (see memory notes); wire into the model once benchmarked on a
directly attached TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256        # points per grid step
IN_FLIGHT = 8     # outstanding DMAs


def _kernel(y0_ref, x0_ref, map_ref, wx_ref, wy_ref, out_ref, patch_ref, sems):
    """One grid step: fetch TILE patches, interpolate.

    y0/x0: scalar-prefetch refs over ALL N points (scalar loads only, used
    to address the DMAs); wx/wy: (TILE, 1) VMEM blocks of fractional
    weights; map_ref: (H, W, C) in HBM/ANY; out_ref: (TILE, C) VMEM;
    patch_ref: (TILE, 2, 2, C) VMEM scratch; sems: DMA semaphores.
    """
    step = pl.program_id(0)
    base = step * TILE

    def start(i, slot):
        y0 = y0_ref[base + i]
        x0 = x0_ref[base + i]
        cp = pltpu.make_async_copy(
            map_ref.at[pl.ds(y0, 2), pl.ds(x0, 2), :],
            patch_ref.at[i],
            sems.at[slot],
        )
        cp.start()

    def wait(i, slot):
        y0 = y0_ref[base + i]
        x0 = x0_ref[base + i]
        cp = pltpu.make_async_copy(
            map_ref.at[pl.ds(y0, 2), pl.ds(x0, 2), :],
            patch_ref.at[i],
            sems.at[slot],
        )
        cp.wait()

    # prime the pipeline
    def prime(i, _):
        @pl.when(i < TILE)
        def _():
            start(i, i % IN_FLIGHT)
        return 0

    jax.lax.fori_loop(0, min(IN_FLIGHT, TILE), prime, 0)

    # steady state: wait slot, then immediately refill it with patch i+IN_FLIGHT
    def body(i, _):
        wait(i, i % IN_FLIGHT)

        @pl.when(i + IN_FLIGHT < TILE)
        def _():
            start(i + IN_FLIGHT, i % IN_FLIGHT)
        return 0

    jax.lax.fori_loop(0, TILE, body, 0)

    p = patch_ref[:]                      # (TILE, 2, 2, C)
    wx = wx_ref[:]                        # (TILE, 1)
    wy = wy_ref[:]
    top = p[:, 0, 0] + wx * (p[:, 0, 1] - p[:, 0, 0])
    bot = p[:, 1, 0] + wx * (p[:, 1, 1] - p[:, 1, 0])
    out_ref[:] = top + wy * (bot - top)


def dma_bilinear_sample(feat, xy_ndc, interpret=False):
    """Bilinear sample via the DMA-pipelined kernel.

    Semantics identical to ops.feat_sample.bilinear_sample (align_corners,
    border padding). feat: (H, W, C); xy_ndc: (N, 2); N padded to TILE.

    Hardware constraint (v5e Mosaic): the dynamic HBM patch slice must be
    lane-aligned — C is padded to a multiple of 128 when needed (callers
    that keep their feature maps 128-channel-padded avoid the copy).
    """
    H, W, C = feat.shape
    c_pad = (-C) % 128
    if c_pad and not interpret:
        feat = jnp.pad(feat, ((0, 0), (0, 0), (0, c_pad)))
        return dma_bilinear_sample(feat, xy_ndc, interpret)[:, :C]
    N = xy_ndc.shape[0]
    n_pad = (-N) % TILE
    if n_pad:
        xy_ndc = jnp.concatenate([xy_ndc, jnp.zeros((n_pad, 2), xy_ndc.dtype)])
    n_total = N + n_pad

    x = jnp.clip((xy_ndc[:, 0] + 1.0) * 0.5 * (W - 1), 0.0, W - 1.0)
    y = jnp.clip((xy_ndc[:, 1] + 1.0) * 0.5 * (H - 1), 0.0, H - 1.0)
    x0 = jnp.minimum(jnp.floor(x), W - 2).astype(jnp.int32)
    y0 = jnp.minimum(jnp.floor(y), H - 2).astype(jnp.int32)
    wx = (x - x0).astype(feat.dtype)
    wy = (y - y0).astype(feat.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_total // TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, C), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((TILE, 2, 2, C), feat.dtype),
            pltpu.SemaphoreType.DMA((IN_FLIGHT,)),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_total, C), feat.dtype),
        interpret=interpret,
    )(y0, x0, feat, wx[:, None], wy[:, None])
    return out[:N]
