"""Descriptor-matching benchmark — the ``match_clouds_holidays`` /
``compute_descriptors_holidays`` harness family (match_clouds_holidays.cpp,
compute_descriptors_holidays.cpp: BTree vs BoW vs brute-force comparison).

Compares the framework's three matching backends on saved keyframe clouds
(or synthetic ones via ``tools.create_cloud``):
  * device brute-force Hamming (XOR+popcount, ops.hamming)
  * native C++ descriptor search tree (svi_mapper_tpu.native.DescriptorIndex)
  * probabilistic expected-Hamming matmul (mapping.bitstats) on binary pools
reporting per-backend query throughput and agreement with brute force
(which is exact, so it is the recall reference).

Usage: python -m svi_mapper_tpu.tools.bench_matching CLOUD1 CLOUD2 ... [--cpu]
"""

from __future__ import annotations

import argparse
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("clouds", nargs="+")
    ap.add_argument("--cutoff", type=int, default=25)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from svi_mapper_tpu import native
    from svi_mapper_tpu.io.cloud import load_cloud
    from svi_mapper_tpu.mapping.bitstats import match_probabilistic
    from svi_mapper_tpu.ops.descriptors import unpack_bits
    from svi_mapper_tpu.ops.hamming import match_nearest

    clouds = [load_cloud(p) for p in args.clouds]
    if len(clouds) < 2:
        raise SystemExit("need at least 2 clouds (query + references)")
    query = clouds[0]
    refs = clouds[1:]
    q = jnp.asarray(query.descriptors)
    train = np.concatenate([c.descriptors for c in refs], axis=0)
    t_j = jnp.asarray(train)
    print(f"{len(q)} query descriptors vs {len(train)} stored "
          f"({len(refs)} clouds)")

    # --- device brute force (exact reference) ---
    bf = jax.jit(lambda a, b: match_nearest(a, b, cutoff=args.cutoff))
    idx, dist, ok = bf(q, t_j)
    jax.block_until_ready(ok)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        idx, dist, ok = bf(q, t_j)
    jax.block_until_ready(ok)
    dt_bf = (time.perf_counter() - t0) / args.reps
    idx, ok = np.asarray(idx), np.asarray(ok)
    n_exact = int(ok.sum())
    print(f"brute-force device:   {n_exact} matches   "
          f"{len(q) / dt_bf:,.0f} queries/s")

    # --- native tree index ---
    if native.available():
        index = native.DescriptorIndex()
        for k, c in enumerate(refs):
            index.add(c.descriptors, k)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            votes = index.query(np.asarray(query.descriptors),
                                cutoff=args.cutoff)
        dt_nat = (time.perf_counter() - t0) / args.reps
        print(f"native tree index:    {int(votes.sum())} votes      "
              f"{len(q) / dt_nat:,.0f} queries/s "
              f"(per-keyframe vote counts: {list(votes[:len(refs)])})")
    else:
        print("native tree index:    unavailable (no toolchain)")

    # --- probabilistic expected-Hamming (binary pools -> exact agreement) ---
    mean_bits = unpack_bits(t_j).astype(jnp.float32)
    pm = jax.jit(lambda a: match_probabilistic(
        a, mean_bits, jnp.ones(len(train), bool), cutoff=float(args.cutoff)))
    pidx, pdist, pok = pm(q)
    jax.block_until_ready(pok)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        pidx, pdist, pok = pm(q)
    jax.block_until_ready(pok)
    dt_p = (time.perf_counter() - t0) / args.reps
    pidx, pok = np.asarray(pidx), np.asarray(pok)
    both = ok & pok
    agree = float((pidx[both] == idx[both]).mean()) if both.any() else 1.0
    print(f"probabilistic matmul: {int(pok.sum())} matches   "
          f"{len(q) / dt_p:,.0f} queries/s   "
          f"agreement with brute force: {agree * 100:.1f} %")


if __name__ == "__main__":
    main()
