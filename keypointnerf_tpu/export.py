"""Model export for production serving (AOT/StableHLO).

The reference has no deployment story beyond pickled Lightning
checkpoints (src/model.py:113-117). For TPU serving the natural artifact
is a serialized StableHLO program: `jax.export` captures the jitted
render function (lowered once, shape- and dtype-checked at call time) so
a serving binary can run it without the Python model definition, and a
later JAX version can reload it (forward-compatibility guarantees of the
StableHLO serialization format).

Exported signature (flat arrays only — no custom pytree nodes, so the
artifact deserializes in any consumer without registering this package's
dataclasses):

    serve(params, src_images, src_masks, src_K, src_R, src_t,
          kpt3d, bounds, tar_K, R, t) -> ((H, W, 3) rgb, cull_overflow)

The second output is the exact empty-ray cull's runtime soundness guard
(render/renderer.py): 0.0 means every rendered ray outside the baked
`cull_empty_rays_ratio` budget was PROVABLY empty, i.e. the frame equals
the uncalled render bit-for-bit; nonzero means the scene's visual hull
exceeded the baked budget and that many subject rays were silently
zeroed — the serving contract is that callers MUST check it (or bake a
budget sized with `render.suggest_cull_budget` / export with culling
off). It is a constant 0.0 when the model config does not cull. The
serve path is exactly where unsized scenes appear, so the guard ships
inside the artifact rather than as a host-side wrapper (docs/API.md
"Serving contract").

Source-view encoding runs inside the program; for many-camera orbits of
the same subject prefer `render.video.render_orbit` (encode-once) — the
export trades that caching for a self-contained single-call artifact.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .models.keypoint_nerf import KeypointNeRF, ViewBatch
from .geometry.cameras import camera_rays, pixel_grid
from .render.renderer import render_rays_chunked


def make_serving_fn(model: KeypointNeRF, height: int, width: int, chunk: int = 4096):
    """A self-contained (params, views, camera) -> (rgb, cull_overflow) fn.

    See the module docstring for the overflow output's serving contract.
    """
    cfg = model.cfg
    pix = pixel_grid(height, width).astype(jnp.float32)

    def serve(params, src_images, src_masks, src_K, src_R, src_t,
              kpt3d, bounds, tar_K, R, t):
        vb = ViewBatch(
            src_images=src_images, src_masks=src_masks,
            src_K=src_K, src_R=src_R, src_t=src_t,
            # target image/mask are training-only; render_rays never reads
            # them, but ViewBatch is a fixed pytree so fill with (1,1) zeros
            tar_image=jnp.zeros((1, 1, 3), src_images.dtype),
            tar_mask=jnp.zeros((1, 1, 1), src_masks.dtype),
            tar_K=tar_K, tar_R=R, tar_t=t,
            kpt3d=kpt3d, bounds=bounds,
        )
        feats = model.apply(params, src_images, src_masks, method=KeypointNeRF.encode)
        origin, dirs, near, far = camera_rays(pix, tar_K, R, t, cfg.znear, cfg.zfar)
        out = render_rays_chunked(
            model, params, feats, vb, origin, dirs, near, far, chunk=chunk
        )
        overflow = jnp.max(out.get("cull_overflow", jnp.zeros(1)))
        return out["rgb_fine"].reshape(height, width, 3), overflow

    return serve


def make_multicam_serving_fn(model: KeypointNeRF, height: int, width: int,
                             chunk: int = 4096):
    """A (params, views, F-camera stacks) -> ((F, H, W, 3), overflow) fn.

    The video/orbit serving shape: source views are encoded ONCE inside
    the program, then a lax.scan marches every target camera
    (render_cameras_scanned) — the exported artifact keeps the reference's
    attach_im_feat amortization (src/model.py:642-688) without any Python
    caller managing a feature cache. Camera args are stacks:
    tar_K/R (F, 3, 3), t (F, 3). The second output is the max
    cull-overflow across all F cameras (module docstring: a deployed
    culled preset renders cameras its budget was never sized for — any
    orbit camera overflowing the budget must be detectable from the
    artifact's outputs alone).
    """
    from .render.renderer import render_cameras_scanned

    def serve(params, src_images, src_masks, src_K, src_R, src_t,
              kpt3d, bounds, tar_Ks, Rs, ts):
        vb = ViewBatch(
            src_images=src_images, src_masks=src_masks,
            src_K=src_K, src_R=src_R, src_t=src_t,
            tar_image=jnp.zeros((1, 1, 3), src_images.dtype),
            tar_mask=jnp.zeros((1, 1, 1), src_masks.dtype),
            tar_K=tar_Ks[0], tar_R=Rs[0], tar_t=ts[0],
            kpt3d=kpt3d, bounds=bounds,
        )
        feats = model.apply(params, src_images, src_masks, method=KeypointNeRF.encode)
        return render_cameras_scanned(
            model, params, feats, vb, tar_Ks, Rs, ts,
            height=height, width=width, chunk=chunk,
        )

    return serve


def export_render(
    model: KeypointNeRF,
    params,
    example_args,
    *,
    height: int,
    width: int,
    chunk: int = 4096,
    platforms=("cpu", "tpu"),
    multicam: bool = False,
) -> bytes:
    """Serialize the jitted serving function to portable StableHLO bytes.

    `example_args` is the flat tuple (src_images, src_masks, src_K, src_R,
    src_t, kpt3d, bounds, tar_K, R, t) — only shapes/dtypes are captured.
    With `multicam=True` the camera entries are (F, ...) stacks and the
    artifact returns ((F, H, W, 3), overflow); single-camera artifacts
    return ((H, W, 3), overflow). Callers must check the overflow guard
    (module docstring).
    """
    serve = (make_multicam_serving_fn if multicam else make_serving_fn)(
        model, height, width, chunk
    )
    spec = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
    arg_specs = (jax.tree.map(spec, params),) + tuple(spec(a) for a in example_args)
    exported = jax_export.export(jax.jit(serve), platforms=list(platforms))(*arg_specs)
    return exported.serialize()


def load_render(data: bytes):
    """Deserialize an exported render program into a callable.

    The callable takes the same (params, *flat_args) as the exported
    function and runs on whatever platform jax is configured for (among
    the platforms baked into the artifact).
    """
    return jax_export.deserialize(data).call
