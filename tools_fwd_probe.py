"""Attribution probe for the fused forward kernel (round-4 perf attack).

The fine fwd measures ~99 TF/s vs 197 peak; this times stripped-down
variants of the SAME kernel structure in one process to localize the
gap: PE sin cost, trunk-only rate, epilogue (bias+relu+cast) cost,
launch overhead, and tile-size response.  Pure diagnostic — production
kernel code stays in ops/fused_mlp.py.

Usage: python tools_fwd_probe.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PTS = 196608
W = 256
IN_W = 128
OUT_W = 128
VMEM = 64 * 1024 * 1024


def timeit(fn, iters=30, warmup=4):
    for _ in range(warmup):
        o = fn()
    float(o[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn()
    float(o[0, 0])
    return (time.perf_counter() - t0) / iters * 1e3


def _mm(a, b):
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def make_kernel(n_layers, variant):
    def kernel(in8_ref, pe_ref, sm_ref, *refs):
        out_ref = refs[-1]
        ws = refs[:-1]
        in8 = in8_ref[...]
        # PE
        if variant == "nosin":
            z = in8[:, 0:1] * pe_ref[0:1, :]
            for d in range(1, 7):
                z = z + in8[:, d : d + 1] * pe_ref[d : d + 1, :]
            feat = z
        elif variant == "nope":
            feat = jnp.broadcast_to(in8[:, 0:1], (in8.shape[0], IN_W)) * 0.01
        else:
            z = in8[:, 0:1] * pe_ref[0:1, :]
            for d in range(1, 7):
                z = z + in8[:, d : d + 1] * pe_ref[d : d + 1, :]
            sm = sm_ref[...]
            feat = sm * jnp.sin(z) + (1.0 - sm) * z

        h = feat
        for i in range(n_layers):
            w = ws[i][...]
            b = ws[n_layers + i][...]
            o = _mm(h, w)
            if variant == "norelu":
                h = o
            elif variant == "nobias":
                h = jnp.maximum(o, 0.0)
            else:
                h = jnp.maximum(o + b, 0.0)
        out_ref[...] = h[:, :OUT_W].astype(out_ref.dtype)

    return kernel


def run(n_layers=8, variant="full", tile=2048, out_dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    in8 = jnp.asarray(rng.normal(size=(N_PTS, 8)).astype(np.float32))
    pe = jnp.asarray(rng.normal(size=(8, IN_W)).astype(np.float32))
    sm = jnp.asarray((rng.uniform(size=(1, IN_W)) > 0.3).astype(np.float32))
    shapes = [(IN_W, W)] + [(W, W)] * (n_layers - 1)
    ws = [
        jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.05)
        for s in shapes
    ]
    bs = [jnp.asarray(np.zeros((1, W), np.float32)) for _ in range(n_layers)]

    def rep(s):
        return pl.BlockSpec(s, lambda i: tuple(0 for _ in s), memory_space=pltpu.VMEM)

    f = pl.pallas_call(
        make_kernel(n_layers, variant),
        grid=(N_PTS // tile,),
        in_specs=[
            pl.BlockSpec((tile, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            rep(pe.shape),
            rep(sm.shape),
            *[rep(w.shape) for w in ws],
            *[rep(b.shape) for b in bs],
        ],
        out_specs=pl.BlockSpec((tile, OUT_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_PTS, OUT_W), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM),
    )
    jf = jax.jit(lambda: f(in8, pe, sm, *ws, *bs))
    ms = timeit(jf)
    flops = 2 * N_PTS * sum(a * b for a, b in shapes)
    print(
        f"layers={n_layers:2d} variant={variant:7s} tile={tile:5d}: "
        f"{ms:7.3f} ms  ({flops / (ms * 1e-3) / 1e12:6.1f} TF/s)"
    )
    return ms


def main():
    dev = jax.devices()[0]
    print(f"# {dev.platform}:{dev.device_kind}, n={N_PTS}")
    run(8, "full", 2048)
    run(8, "nosin", 2048)
    run(8, "nope", 2048)
    run(8, "norelu", 2048)
    run(8, "nobias", 2048)
    for t in (512, 1024, 4096, 8192, 16384):
        run(8, "full", t)
    run(1, "full", 2048)
    run(2, "full", 2048)
    run(4, "full", 2048)
    run(16, "full", 2048)
    run(8, "full", 2048, out_dtype=jnp.float32)


if __name__ == "__main__":
    main()
