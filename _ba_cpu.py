import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
import bench
v = bench.bench_ba(quick=True)
print(f"CPU BA iters/sec (32x4096): {v:.2f}")
