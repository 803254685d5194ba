"""Extract BRIEF descriptor sets from a directory of images — the
``compute_descriptors_holidays`` runnable (compute_descriptors_holidays.cpp):
detect corners, extract binary descriptors, and save them per image for
offline matching benchmarks and vocabulary training.

Output ``.npz`` layout: ``desc`` [N, 8] uint32 packed descriptors,
``uv`` [N, 2] float32 keypoints, ``doc_ids`` [N] int32 image index,
``names`` [D] str image file names.

Usage:
  python -m svi_mapper_tpu.tools.compute_descriptors IMAGE_DIR -o OUT.npz
"""

from __future__ import annotations

import argparse
from pathlib import Path

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".pgm", ".bmp", ".tif", ".tiff"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("image_dir")
    ap.add_argument("-o", "--out", default="descriptors.npz")
    ap.add_argument("--max-per-image", type=int, default=512)
    ap.add_argument("--quality", type=float, default=0.01)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from svi_mapper_tpu.io.kitti import _read_image
    from svi_mapper_tpu.ops.corners import detect_corners
    from svi_mapper_tpu.ops.descriptors import brief_descriptors
    from svi_mapper_tpu.ops.image import gaussian_blur

    paths = sorted(
        p for p in Path(args.image_dir).iterdir()
        if p.suffix.lower() in IMAGE_EXTS
    )
    if not paths:
        raise SystemExit(f"no images in {args.image_dir}")

    @jax.jit
    def extract(img):
        smooth = gaussian_blur(img)
        uv, score, valid = detect_corners(
            smooth, k=args.max_per_image, quality=args.quality
        )
        desc = brief_descriptors(smooth, uv)
        return uv, desc, valid

    all_desc, all_uv, all_doc = [], [], []
    for i, p in enumerate(paths):
        img = jnp.asarray(_read_image(p), jnp.float32)
        uv, desc, valid = extract(img)
        v = np.asarray(valid)
        all_desc.append(np.asarray(desc)[v])
        all_uv.append(np.asarray(uv)[v])
        all_doc.append(np.full(int(v.sum()), i, np.int32))
        print(f"[{i + 1}/{len(paths)}] {p.name}: {int(v.sum())} descriptors")

    np.savez_compressed(
        args.out,
        desc=np.concatenate(all_desc).astype(np.uint32),
        uv=np.concatenate(all_uv).astype(np.float32),
        doc_ids=np.concatenate(all_doc),
        names=np.array([p.name for p in paths]),
    )
    print(f"wrote {sum(len(d) for d in all_desc)} descriptors "
          f"from {len(paths)} images -> {args.out}")


if __name__ == "__main__":
    main()
