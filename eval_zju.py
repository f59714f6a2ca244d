#!/usr/bin/env python
"""Offline eval CLI: re-score saved pred/gt PNG trees.

Counterpart of the reference eval_zju.py:15-52 — globs
`{src_dir}/*/gt/*.png` against `pred/`, averages PSNR/SSIM.
"""
import argparse

from keypointnerf_tpu.evaluation import eval_saved_images


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_dir", type=str, default="./out/keypointnerf/images_v3")
    args = parser.parse_args()
    scores = eval_saved_images(args.src_dir)
    for k, v in scores.items():
        print(f"{k}:\t{v}")


if __name__ == "__main__":
    main()
