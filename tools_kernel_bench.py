"""Microbenchmark for the fused MLP kernel in isolation (round-4 perf
attack): times forward and value_and_grad at the bench config's coarse
(65,536) and fine (196,608) point counts, plus the full train step, so
kernel-level changes can be attributed before running bench.py.

Sync caveat: host readback, not block_until_ready (see bench_common).

Usage: python tools_kernel_bench.py [--tile-fwd N] [--tile-bwd N]
"""

import argparse
import time

import numpy as np


def timeit(fn, sync, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile-fwd", type=int, default=None)
    ap.add_argument("--tile-bwd", type=int, default=None)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--save-bf16", action="store_true")
    ap.add_argument("--vmem-mb", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from intrinsicnerf_tpu.models.mlp import MLPConfig, init_mlp_params
    from intrinsicnerf_tpu.ops import fused_mlp

    if args.tile_fwd:
        fused_mlp.TILE_FWD = args.tile_fwd
    if args.tile_bwd:
        fused_mlp.TILE_BWD = args.tile_bwd
    if args.save_bf16:
        fused_mlp.SAVE_DTYPE = jnp.bfloat16
    if args.vmem_mb:
        fused_mlp.VMEM_LIMIT_BYTES = args.vmem_mb * 1024 * 1024

    n_classes = 27
    mcfg = MLPConfig(
        pos_scalar_factor=10.0,
        enable_semantic=True,
        num_semantic_classes=n_classes,
        compute_dtype=jnp.bfloat16,
        use_fused_kernel=True,
    )
    params = init_mlp_params(jax.random.key(0), mcfg)
    packed = fused_mlp.pack_weights(params, mcfg)

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print(f"# device {dev.platform}:{dev.device_kind}  "
          f"TILE_FWD={fused_mlp.TILE_FWD} TILE_BWD={fused_mlp.TILE_BWD} "
          f"OUT_DTYPE={fused_mlp.OUT_DTYPE.__name__} "
          f"SAVE={fused_mlp.SAVE_DTYPE.__name__} VMEM={fused_mlp.VMEM_LIMIT_BYTES>>20}MB")

    def mk_in8(n_pts):
        pts = rng.uniform(-2, 2, (n_pts, 1, 3)).astype(np.float32)
        dirs = rng.normal(size=(n_pts, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        return jnp.asarray(
            fused_mlp.build_in8(mcfg, jnp.asarray(pts), jnp.asarray(dirs))
        )

    # per-point FLOPs of the packed kernel (padded shapes, MACs x2):
    # trunk 521k MAC + heads 291k MAC
    flops_pt = 2 * (
        128 * 256  # w0
        + 4 * 256 * 256  # w1-4
        + 128 * 256 + 256 * 256  # w5x + w5h
        + 2 * 256 * 256  # w6, w7
        + 256 * 128  # w_sig
        + 256 * 128 + 128 * 128  # a1, a2
        + 256 * 128 + 128 * 128  # s1, s2
        + 256 * 128 + 128 * 128  # m1, m2
        + 256 * 256 + 256 * 128 + 128 * 128  # f, wv_f, wv_d
        + 128 * 128  # w_r
    )

    for label, n in (("coarse 65k", 65536), ("fine 192k", 196608)):
        in8 = mk_in8(n)

        fwd = jax.jit(lambda i8: fused_mlp.fused_mlp_apply(packed, mcfg, i8))
        t_f = timeit(
            lambda: fwd(in8), lambda o: float(o[0, 0]), iters=args.iters
        )

        def loss(pk, i8):
            return jnp.sum(
                fused_mlp.fused_mlp_apply(pk, mcfg, i8).astype(jnp.float32)
            )

        vg = jax.jit(jax.value_and_grad(loss))
        t_g = timeit(
            lambda: vg(packed, in8),
            lambda o: float(o[0]),
            iters=args.iters,
        )
        tf_fwd = n * flops_pt / (t_f * 1e-3) / 1e12
        tf_vg = 4 * n * flops_pt / (t_g * 1e-3) / 1e12
        print(
            f"{label}: fwd {t_f:.3f} ms ({tf_fwd:.0f} TF/s)   "
            f"fwd+bwd {t_g:.3f} ms ({tf_vg:.0f} TF/s eff, remat=4x fwd)"
        )


if __name__ == "__main__":
    main()
