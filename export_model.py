#!/usr/bin/env python
"""Export a trained render program to a portable StableHLO artifact.

Serving-deployment CLI the reference lacks (its only artifact is a
Lightning ckpt requiring the Python class, src/model.py:113-117). The
output of this script is a self-contained serialized program: a serving
binary deserializes it with `keypointnerf_tpu.export.load_render` (or
raw `jax.export.deserialize`) and calls it with (params, src_images,
src_masks, src_K, src_R, src_t, kpt3d, bounds, tar_K, R, t) — no model
code, config, or Flax needed at serve time. It returns
(frames, cull_overflow); consumers MUST check the overflow guard when
the exported config culls (docs/API.md "Serving contract").

    python export_model.py --config configs/zju.json \
        --model_ckpt out/zju/ckpts --out /tmp/kpnerf_render.jaxexport \
        --height 512 --width 512
"""
import argparse
import os


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--model_ckpt", default=None, help="checkpoint dir (omit = random init smoke export)")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--chunk", type=int, default=8192)
    p.add_argument(
        "--cameras", type=int, default=0,
        help="export the multi-camera serving fn over F stacked target "
        "cameras (encode-once + lax.scan; 0 = single-camera artifact)",
    )
    p.add_argument("--platforms", default="cpu,tpu", help="comma-separated lowering targets")
    p.add_argument("--set", nargs="*", default=[], help="dotted config overrides")
    args = p.parse_args()

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax
    import jax.numpy as jnp

    from train import parse_overrides
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.export import export_render
    from keypointnerf_tpu.models import KeypointNeRF, ViewBatch
    from keypointnerf_tpu.utils import load_config

    cfg = load_config(args.config, parse_overrides(args.set))
    model = KeypointNeRF(cfg.model)

    # example shapes: V source views at the configured resolution (only
    # shapes/dtypes are baked into the artifact, not the pixel values)
    sample = make_sample(
        SyntheticConfig(
            image_size=cfg.data.image_size,
            n_views=cfg.data.n_source_views + 1,
            n_kpt=cfg.model.n_kpt,
        ),
        seed=0,
    )
    vb = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
    params = jax.jit(model.init, static_argnums=2)(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )

    if args.model_ckpt:
        from keypointnerf_tpu.training import OptimConfig, create_train_state
        from keypointnerf_tpu.utils import CheckpointManager

        state = create_train_state(model, vb, OptimConfig())
        restored, step = CheckpointManager(args.model_ckpt).restore(state, best=True)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.model_ckpt}")
        params = restored.params  # the full init-style variables dict
        print(f"restored best-val step {step}")
    else:
        print("WARNING: exporting randomly-initialized params (smoke export)")

    tar_K, tar_R, tar_t = vb.tar_K, vb.tar_R, vb.tar_t
    if args.cameras > 0:
        stack = lambda x: jnp.broadcast_to(x, (args.cameras,) + x.shape)
        tar_K, tar_R, tar_t = stack(tar_K), stack(tar_R), stack(tar_t)
    flat_args = (
        vb.src_images, vb.src_masks, vb.src_K, vb.src_R, vb.src_t,
        vb.kpt3d, vb.bounds, tar_K, tar_R, tar_t,
    )
    blob = export_render(
        model, params, flat_args,
        height=args.height, width=args.width, chunk=args.chunk,
        platforms=tuple(args.platforms.split(",")),
        multicam=args.cameras > 0,
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)/1e6:.2f} MB -> {args.out} "
          f"({args.height}x{args.width}, platforms={args.platforms})")


if __name__ == "__main__":
    main()
