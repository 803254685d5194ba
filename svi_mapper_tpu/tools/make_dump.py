"""Convert a dataset into a binary stereo message dump — the
``republisher_kitti`` runnable (republisher_kitti.cpp:28-100: times.txt +
image_0/ + image_1/ -> txt_io message dump), re-targeted at the native
``.svid`` format (svi_mapper_tpu/native/src/dump_io.hpp) whose reader
prefetches frames on a background thread.

Usage:
  python -m svi_mapper_tpu.tools.make_dump kitti KITTI_ROOT out.svid [--sequence 00]
  python -m svi_mapper_tpu.tools.make_dump synthetic out.svid [--frames 40]
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="source", required=True)
    k = sub.add_parser("kitti")
    k.add_argument("root")
    k.add_argument("out")
    k.add_argument("--sequence", default="00")
    s = sub.add_parser("synthetic")
    s.add_argument("out")
    s.add_argument("--frames", type=int, default=40)
    s.add_argument("--width", type=int, default=640)
    s.add_argument("--height", type=int, default=320)
    args = ap.parse_args()

    from svi_mapper_tpu import native

    def to_u8(img: np.ndarray) -> np.ndarray:
        return np.clip(np.asarray(img), 0, 255).astype(np.uint8)

    if args.source == "kitti":
        from svi_mapper_tpu.io.kitti import KittiSequence

        seq = KittiSequence(args.root, args.sequence)
        L0, _, _ = seq.frame(0)
        with native.DumpWriter(args.out, L0.shape[0], L0.shape[1]) as w:
            for i in range(seq.n_frames):
                L, R, _ = seq.frame(i)
                w.append(i, float(seq.times[i]), to_u8(L), to_u8(R))
        n = seq.n_frames
    else:
        from svi_mapper_tpu.io.synthetic import SyntheticSequence

        seq = SyntheticSequence(
            n_frames=args.frames, width=args.width, height=args.height
        )
        with native.DumpWriter(args.out, args.height, args.width) as w:
            for i, (L, R, _) in enumerate(seq):
                w.append(i, i * 0.05, to_u8(L), to_u8(R))
        n = args.frames

    print(f"wrote {n} stereo frames -> {args.out} "
          f"({native.validate_dump(args.out)} validated)")


if __name__ == "__main__":
    main()
