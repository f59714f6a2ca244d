#!/usr/bin/env python
"""Capture a device trace of one full-image render and print the op-level
time breakdown (top ops + grouped totals).

The breakdown drives the kernel-optimization work: it attributes wall time
to gathers, matmuls, copies/concats, transcendentals, sorts etc. on the
actual hot path rather than isolated microbenches.

Usage:
  python scripts/trace_render.py [--preset fast|strict] [--size 256]
                                 [--chunk 8192] [--logdir /tmp/jaxtrace_cur]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def render_once(preset, size, chunk):
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.data.synthetic import look_at
    from keypointnerf_tpu.geometry.cameras import camera_rays, pixel_grid
    from keypointnerf_tpu.models import KeypointNeRF, ViewBatch
    from keypointnerf_tpu.render.renderer import render_rays_chunked

    from keypointnerf_tpu.models.presets import fast_preset, strict_preset

    # the shipped presets, from the single definition site — so traces
    # profile the configuration bench.py actually measures
    cfg = strict_preset() if preset == "strict" else fast_preset()
    sample = make_sample(SyntheticConfig(image_size=512, n_views=4), seed=0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        vb_cpu = ViewBatch(**{k: jnp.asarray(v) for k, v in sample.items()})
        model = KeypointNeRF(cfg)
        params = jax.jit(model.init, static_argnums=2)(
            {"params": jax.random.key(0), "render": jax.random.key(1)}, vb_cpu, True
        )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    vb = jax.device_put(vb_cpu, dev)

    pix = pixel_grid(size, size).astype(jnp.float32)
    R, t = look_at(3.5 * np.array([0.4, 0.05, 0.9]), np.zeros(3))
    R, t = jnp.asarray(R), jnp.asarray(t)

    @jax.jit
    def render(params, vb, R, t):
        feats = model.apply(
            params, vb.src_images, vb.src_masks, method=KeypointNeRF.encode
        )
        origin, dirs, near, far = camera_rays(
            pix, vb.tar_K, R, t, cfg.znear, cfg.zfar
        )
        out = render_rays_chunked(
            model, params, feats, vb, origin, dirs, near, far, chunk=chunk
        )
        return jnp.sum(out["rgb_fine"])

    return lambda: float(render(params, vb, R, t))


def parse_trace(logdir):
    """Aggregate device-lane op durations from the Perfetto JSON trace."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                             recursive=True))
    assert paths, f"no trace under {logdir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device lanes: pid whose process_name mentions TPU/device XLA ops
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "/device" in n or "XLA Op" in n}
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e6  # us -> s
        per_op[name] += dur
        total += dur
    return per_op, total


GROUPS = (
    ("gather", ("gather", "dynamic-slice", "dynamic-update-slice")),
    ("matmul", ("dot", "convolution", "fusion.conv")),
    ("copy/concat", ("copy", "concatenate", "pad", "transpose", "reshape",
                     "bitcast", "slice")),
    ("sort", ("sort",)),
    ("scatter", ("scatter",)),
    ("reduce", ("reduce",)),
    ("custom/pallas", ("custom-call", "tpu_custom_call")),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="fast", choices=["fast", "strict"])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--logdir", default="/tmp/jaxtrace_cur")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    run = render_once(args.preset, args.size, args.chunk)
    run()  # compile + warm

    from keypointnerf_tpu.utils.profiling import trace as trace_cm

    with trace_cm(args.logdir):
        run()

    per_op, total = parse_trace(args.logdir)
    print(f"# device op total: {total:.4f} s "
          f"({args.size}x{args.size} {args.preset}, chunk {args.chunk})")
    grouped = collections.Counter()
    for name, dur in per_op.items():
        low = name.lower()
        for g, keys in GROUPS:
            if any(k in low for k in keys):
                grouped[g] += dur
                break
        else:
            grouped["other"] += dur
    for g, dur in grouped.most_common():
        print(json.dumps({"group": g, "time_s": round(dur, 4),
                          "pct": round(100 * dur / max(total, 1e-9), 1)}))
    print("# top ops:")
    for name, dur in per_op.most_common(args.top):
        print(json.dumps({"op": name[:110], "time_s": round(dur, 4)}))


if __name__ == "__main__":
    main()
