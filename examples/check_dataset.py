"""Loader sanity-check script — the reference's check_dataset.ipynb
(extra_data/check_dataset.ipynb) as a runnable module: iterate each
available loader, print batch shapes/ranges, and save a debug plot of
the first sample.

Usage: python examples/check_dataset.py [--data_dir ./STB/] [--n 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def check(name, loader, n, out_dir):
    import itertools
    print(f"== {name}: {len(loader)} batches")
    for i, batch in enumerate(itertools.islice(iter(loader), n)):
        img = np.asarray(batch["image"])
        lab = np.asarray(batch["label"])
        print(f"  batch {i}: image{img.shape} [{img.min():.2f},"
              f"{img.max():.2f}] label{lab.shape} "
              f"valid={np.asarray(batch['valid']).mean():.2f}")
        if i == 0:
            from scat_tpu.viz.draw import debug_dataset, unnormalize_image
            j3d = lab[0, :63].reshape(21, 3)
            j2d = (lab[0, 63:105].reshape(21, 2) if lab.shape[1] == 105
                   else lab[0, 124:].reshape(21, 2))
            debug_dataset(unnormalize_image(img[0]), j2d, j3d,
                          os.path.join(out_dir, f"{name}_debug"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="./STB/")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--out_dir", default=".")
    args = ap.parse_args()

    from scat_tpu.config import Options
    from scat_tpu.data.synthetic import SyntheticDataset
    opt = Options(data_dir=args.data_dir, batch_size=4)

    check("synthetic", SyntheticDataset(4, num_batches=2), args.n,
          args.out_dir)
    from scat_tpu.data.stb import get_loader_STB
    stb = get_loader_STB("training", 4, opt)
    if len(stb):
        check("STB", stb, args.n, args.out_dir)
    else:
        print(f"== STB: no data under {args.data_dir}, skipped")
    try:
        from scat_tpu.data.freihand import get_loader_frei
        check("FreiHAND", get_loader_frei("training", 4, opt), args.n,
              args.out_dir)
    except (FileNotFoundError, OSError):
        print("== FreiHAND: no data, skipped")
    try:
        from scat_tpu.data.ho3d import get_loader_ho3d
        check("HO3D", get_loader_ho3d("training", 4, opt), args.n,
              args.out_dir)
    except (FileNotFoundError, OSError):
        print("== HO3D: no data, skipped")


if __name__ == "__main__":
    main()
