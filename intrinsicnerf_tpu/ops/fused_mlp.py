"""Fused trunk + heads MLP evaluation as a single Pallas TPU kernel.

Why: the XLA path lowers the 8x256 trunk into per-layer [P, 256] x
[256, 256] matmuls whose activations round-trip HBM every layer; at
N=256 those run ~23 TFLOPs on v5e (memory-bound, measured).  This
kernel keeps the whole activation tile in VMEM, runs all trunk layers
and every head per tile, and writes one packed [T, 128] output — HBM
traffic per point drops from ~16 KB to ~1 KB, making the op
compute-bound.

The positional encoding is computed *inside* the kernel: the input is
a tiny packed ``[P, 8]`` block ``[x, y, z, dx, dy, dz, 1, 0]`` and the
PE expands in VMEM to the ``[P, 128]`` feature layout ``[pos-PE(63) |
pad | dir-PE(27)@64 | pad]`` (so every contraction dim is a 128
multiple).  The expansion is closed-form: ``feat = m*sin(z) +
(1-m)*z`` with ``z = in8 @ F`` for a constant frequency matrix ``F``
[8, 128] whose columns encode ``2^k/scale`` factors (cosines get a
``pi/2`` phase through the constant-1 input column) and a 0/1 mask
``m`` marking sinusoid columns.  ``z`` is accumulated on the VPU as 7
broadcast FMAs (exact fp32 — bf16 MXU passes would corrupt the
high-frequency angles).  This removes the former host-side feature
build (~1.6 ms/step) and shrinks the kernel's HBM input traffic 16x
(the backward remat re-read included).

Output layout (``OUT_DTYPE`` [P, 128]): ``[0]=sigma, [1:4]=albedo_logit,
[4]=shading_logit, [5:8]=residual_logit, [8:8+C]=sem_logits`` —
sigmoids are applied by the caller (XLA fuses them), keeping the
kernel linear+relu and the VJP simple.  The packed output crosses HBM
in bf16 (the logits carry bf16-matmul noise regardless; fp32 bytes
bought nothing) and is cast back to fp32 inside the consumers.

The custom VJP computes *weight/bias gradients only* — NeRF sample
positions and view dirs never need grads (coarse z has no param
dependence, fine z is stop_gradient'ed; zeros are mathematically
exact).  The backward Pallas kernel recomputes the forward per tile
(remat) and accumulates dW into VMEM-resident whole-array output
blocks across the sequential TPU grid.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intrinsicnerf_tpu.core.compositing import RawOutputs
from intrinsicnerf_tpu.models.mlp import MLPConfig, Params

TILE_FWD = 2048  # points per fwd grid step (tuned on v5e: 3.78 ms vs 3.86 @1024)
TILE_BWD = 1024  # points per bwd grid step (VMEM-bound: keeps all acts)
SAVE_DTYPE = jnp.float32  # remat activation dtype in the bwd kernel
# packed-output dtype: the head logits come from bf16 MXU matmuls
# (fp32 accumulate), so a bf16 output loses ~nothing while halving the
# kernel's [P, 128] HBM write + the caller's read + the bwd g read.
# NOTE the backward cotangent is quantized too: the grad of the fp32
# cast delivers g to _bwd_kernel in bf16, so all weight/bias grads see
# bf16-rounded upstream gradients (fp32 accumulation inside the kernel
# notwithstanding).  Gated by the convergence gate (CONVERGENCE_r*.json)
# at full PSNR thresholds, not just op-level parity.
OUT_DTYPE = jnp.bfloat16
# the bwd kernel's weights+grads+activations sit right at Mosaic's 16MB
# default scoped-vmem limit; raise it explicitly (v5e has far more VMEM)
VMEM_LIMIT_BYTES = 32 * 1024 * 1024
IN_W = 128  # packed PE width in VMEM: pos-PE at 0, dir-PE at DIR_OFF
DIR_OFF = 64
OUT_W = 128
IN8_W = 8  # packed kernel input: [x, y, z, dx, dy, dz, 1, 0]


def pe_constants(cfg: MLPConfig):
    """Constant frequency matrix F [IN8_W, IN_W] and sinusoid mask
    [1, IN_W] such that ``feat = m*sin(in8 @ F) + (1-m)*(in8 @ F)``
    reproduces ``positional_encoding`` (reference ordering: raw input,
    then per-frequency sin/cos blocks) in the kernel's packed layout.
    Cosines come from a pi/2 phase injected via the constant-1 column."""
    F = np.zeros((IN8_W, IN_W), np.float32)
    m = np.zeros((1, IN_W), np.float32)

    def fill(col0, dim0, n_freqs, scale):
        col = col0
        for d in range(3):  # identity block
            F[dim0 + d, col + d] = 1.0 / scale
        col += 3
        for k in range(n_freqs):
            for trig in range(2):  # sin then cos
                for d in range(3):
                    F[dim0 + d, col] = (2.0**k) / scale
                    if trig == 1:
                        F[6, col] = np.pi / 2.0
                    m[0, col] = 1.0
                    col += 1

    fill(0, 0, cfg.n_freqs_pos, cfg.pos_scalar_factor)
    fill(DIR_OFF, 3, cfg.n_freqs_dir, 1.0)
    return jnp.asarray(F), jnp.asarray(m)


def _compute_feat(in8, pe_mat, sin_mask):
    """[T, IN8_W] -> [T, IN_W] PE features, entirely in VMEM.

    The angle accumulation ``z = in8 @ F`` runs on the MXU at
    ``Precision.HIGHEST`` (multi-pass bf16 ~ fp32 accuracy: measured
    max |err| 8e-6 on 2^9-scaled angles, vs the fused sigmoids' own
    bf16-matmul noise ~1e-3).  The previous 7 broadcast VPU FMAs over
    ``[T, 1]`` column slices were the kernel's single largest fixed
    cost (~0.27 ms per 196k-point pass on v5e): a [T, 1] slice occupies
    one lane of a 128-lane vreg, so every broadcast paid a cross-lane
    shuffle.  A plain bf16 MXU pass is NOT enough — it would corrupt
    high-frequency angles (2^9 * x needs ~17 mantissa bits)."""
    z = jax.lax.dot_general(
        in8, pe_mat, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    return sin_mask * jnp.sin(z) + (1.0 - sin_mask) * z


def _pad2(a, rows: int, cols: int, row_off: int = 0, col_off: int = 0):
    a = jnp.asarray(a, jnp.float32)
    out = jnp.zeros((rows, cols), jnp.float32)
    return out.at[row_off : row_off + a.shape[0],
                  col_off : col_off + a.shape[1]].set(a)


def _padb(b, cols: int, col_off: int = 0):
    b = jnp.asarray(b, jnp.float32)
    out = jnp.zeros((1, cols), jnp.float32)
    return out.at[0, col_off : col_off + b.shape[0]].set(b)


def pack_weights(params: Params, cfg: MLPConfig) -> Dict[str, jnp.ndarray]:
    """Pad/shift the model pytree into the dense blocks the kernel
    consumes.  Runs inside jit, so the custom VJP's packed-weight grads
    flow back through these (linear) ops onto the original pytree."""
    W = cfg.width
    H = W // 2
    C = max(cfg.num_semantic_classes, 1)
    in_ch = cfg.input_ch  # 63
    assert cfg.depth == 8 and tuple(cfg.skips) == (4,), (
        "fused kernel implements the reference architecture (D=8, skip 4)"
    )
    assert 8 + C <= OUT_W, "too many semantic classes for the packed output"
    assert cfg.input_ch <= DIR_OFF, (
        f"pos-PE dim {cfg.input_ch} exceeds the packed slot ({DIR_OFF})"
    )
    assert cfg.input_ch_views <= IN_W - DIR_OFF, (
        f"dir-PE dim {cfg.input_ch_views} exceeds the packed slot"
    )
    trunk = params["trunk"]
    p: Dict[str, jnp.ndarray] = {
        "w0": _pad2(trunk[0]["kernel"], IN_W, W),
        "b0": _padb(trunk[0]["bias"], W),
    }
    for i in range(1, 5):
        p[f"w{i}"] = _pad2(trunk[i]["kernel"], W, W)
        p[f"b{i}"] = _padb(trunk[i]["bias"], W)
    w5 = trunk[5]["kernel"]  # rows = [input_pts(63) | h(256)]
    p["w5x"] = _pad2(w5[:in_ch], IN_W, W)
    p["w5h"] = _pad2(w5[in_ch:], W, W)
    p["b5"] = _padb(trunk[5]["bias"], W)
    for i in (6, 7):
        p[f"w{i}"] = _pad2(trunk[i]["kernel"], W, W)
        p[f"b{i}"] = _padb(trunk[i]["bias"], W)

    # heads: second-stage weights land in disjoint column slots of the
    # shared [*, OUT_W] output matmul
    p["w_sig"] = _pad2(params["sigma"]["kernel"], W, OUT_W, col_off=0)
    p["b_sig"] = _padb(params["sigma"]["bias"], OUT_W, col_off=0)
    p["w_a1"] = _pad2(params["albedo1"]["kernel"], W, H)
    p["b_a1"] = _padb(params["albedo1"]["bias"], H)
    p["w_a2"] = _pad2(params["albedo2"]["kernel"], H, OUT_W, col_off=1)
    p["b_a2"] = _padb(params["albedo2"]["bias"], OUT_W, col_off=1)
    p["w_s1"] = _pad2(params["shading1"]["kernel"], W, H)
    p["b_s1"] = _padb(params["shading1"]["bias"], H)
    p["w_s2"] = _pad2(params["shading2"]["kernel"], H, OUT_W, col_off=4)
    p["b_s2"] = _padb(params["shading2"]["bias"], OUT_W, col_off=4)
    p["w_f"] = _pad2(params["feature"]["kernel"], W, W)
    p["b_f"] = _padb(params["feature"]["bias"], W)
    wv = params["views"]["kernel"]  # [W + in_ch_views, H]
    p["wv_f"] = _pad2(wv[:W], W, H)
    p["wv_d"] = _pad2(wv[W:], IN_W, H, row_off=DIR_OFF)
    p["b_v"] = _padb(params["views"]["bias"], H)
    p["w_r"] = _pad2(params["residual"]["kernel"], H, OUT_W, col_off=5)
    p["b_r"] = _padb(params["residual"]["bias"], OUT_W, col_off=5)
    if cfg.enable_semantic:
        p["w_m1"] = _pad2(params["sem1"]["kernel"], W, H)
        p["b_m1"] = _padb(params["sem1"]["bias"], H)
        p["w_m2"] = _pad2(params["sem2"]["kernel"], H, OUT_W, col_off=8)
        p["b_m2"] = _padb(params["sem2"]["bias"], OUT_W, col_off=8)
    else:
        p["w_m1"] = jnp.zeros((W, H), jnp.float32)
        p["b_m1"] = jnp.zeros((1, H), jnp.float32)
        p["w_m2"] = jnp.zeros((H, OUT_W), jnp.float32)
        p["b_m2"] = jnp.zeros((1, OUT_W), jnp.float32)
    return p


_PACKED_KEYS = tuple(
    ["w0", "b0", "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4",
     "w5x", "w5h", "b5", "w6", "b6", "w7", "b7",
     "w_sig", "b_sig", "w_a1", "b_a1", "w_a2", "b_a2",
     "w_s1", "b_s1", "w_s2", "b_s2", "w_f", "b_f",
     "wv_f", "wv_d", "b_v", "w_r", "b_r",
     "w_m1", "b_m1", "w_m2", "b_m2"]
)


def is_packed(params) -> bool:
    """True when ``params`` is already the kernel's packed dict (the
    training state stores packed weights so the per-step pack/unpack
    pad+slice traffic — measured ~1.8 ms/step on v5e — never happens)."""
    return isinstance(params, dict) and "w0" in params and "trunk" not in params


def unpack_weights(p: Dict[str, jnp.ndarray], cfg: MLPConfig) -> Params:
    """Inverse of :func:`pack_weights`: slice the dense padded blocks
    back into the model pytree (checkpoints, XLA-path eval, tools)."""
    W = cfg.width
    H = W // 2
    C = cfg.num_semantic_classes
    in_ch, in_ch_views = cfg.input_ch, cfg.input_ch_views

    def lay(wk, bk, rows, cols, row_off=0, col_off=0):
        return {
            "kernel": p[wk][row_off : row_off + rows, col_off : col_off + cols],
            "bias": p[bk][0, col_off : col_off + cols],
        }

    trunk = [lay("w0", "b0", in_ch, W)]
    for i in range(1, 5):
        trunk.append(lay(f"w{i}", f"b{i}", W, W))
    trunk.append(
        {
            "kernel": jnp.concatenate([p["w5x"][:in_ch], p["w5h"][:W]], axis=0),
            "bias": p["b5"][0, :W],
        }
    )
    for i in (6, 7):
        trunk.append(lay(f"w{i}", f"b{i}", W, W))

    out: Params = {"trunk": trunk}
    out["sigma"] = lay("w_sig", "b_sig", W, 1, col_off=0)
    out["albedo1"] = lay("w_a1", "b_a1", W, H)
    out["albedo2"] = lay("w_a2", "b_a2", H, 3, col_off=1)
    out["shading1"] = lay("w_s1", "b_s1", W, H)
    out["shading2"] = lay("w_s2", "b_s2", H, 1, col_off=4)
    out["feature"] = lay("w_f", "b_f", W, W)
    out["views"] = {
        "kernel": jnp.concatenate(
            [p["wv_f"][:W], p["wv_d"][DIR_OFF : DIR_OFF + in_ch_views]], axis=0
        ),
        "bias": p["b_v"][0, :H],
    }
    out["residual"] = lay("w_r", "b_r", H, 3, col_off=5)
    if cfg.enable_semantic:
        out["sem1"] = lay("w_m1", "b_m1", W, H)
        out["sem2"] = lay("w_m2", "b_m2", H, C, col_off=8)
    return out


def packed_grad_masks(params_template: Params, cfg: MLPConfig):
    """0/1 masks over the packed blocks marking real parameter slots.

    Training on packed state must project gradients onto the reference
    architecture: the padded columns (e.g. ``w_sig[:, 1:]``, which alias
    other heads' output slots) receive *nonzero* cross-head gradients
    from the shared output matmul, and updating them would add
    cross-head mixing capacity the reference model doesn't have."""
    ones = jax.tree_util.tree_map(jnp.ones_like, params_template)
    return pack_weights(ones, cfg)


def _mm(a, b):
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _mm_tn(a, b):
    """``a.T @ b`` via dot_general contraction on dim 0 — no explicit
    transpose relayout in VMEM (dW accumulation in the backward)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mm_nt(a, b):
    """``a @ b.T`` via dot_general contraction on dim 1 (dX chains)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _forward_tile(w, feat, save_dtype=jnp.float32, want_out=True):
    """feat: [T, IN_W] packed PE block.  Returns (out, saved acts).
    ``save_dtype=bfloat16`` halves the backward kernel's VMEM residency
    (the saved activations only feed bf16 matmuls and relu masks).
    ``want_out=False`` (backward remat) skips the five head-output
    matmuls — their result is never a residual, only the intermediate
    activations are, so recomputing them would waste ~4% of the
    backward kernel's MXU time."""
    sv = lambda x: x.astype(save_dtype)
    h = jax.nn.relu(_mm(feat, w["w0"]) + w["b0"])
    acts = [sv(h)]
    for i in range(1, 5):
        h = jax.nn.relu(_mm(h, w[f"w{i}"]) + w[f"b{i}"])
        acts.append(sv(h))
    h = jax.nn.relu(_mm(h, w["w5h"]) + _mm(feat, w["w5x"]) + w["b5"])
    acts.append(sv(h))
    h = jax.nn.relu(_mm(h, w["w6"]) + w["b6"])
    acts.append(sv(h))
    H = jax.nn.relu(_mm(h, w["w7"]) + w["b7"])
    acts.append(sv(H))

    a1 = jax.nn.relu(_mm(H, w["w_a1"]) + w["b_a1"])
    s1 = jax.nn.relu(_mm(H, w["w_s1"]) + w["b_s1"])
    m1 = jax.nn.relu(_mm(H, w["w_m1"]) + w["b_m1"])
    f = _mm(H, w["w_f"]) + w["b_f"]
    v = jax.nn.relu(_mm(f, w["wv_f"]) + _mm(feat, w["wv_d"]) + w["b_v"])

    out = None
    if want_out:
        out = (
            _mm(H, w["w_sig"]) + w["b_sig"]
            + _mm(a1, w["w_a2"]) + w["b_a2"]
            + _mm(s1, w["w_s2"]) + w["b_s2"]
            + _mm(v, w["w_r"]) + w["b_r"]
            + _mm(m1, w["w_m2"]) + w["b_m2"]
        )
    return out, {
        "acts": acts, "a1": sv(a1), "s1": sv(s1), "m1": sv(m1),
        "f": sv(f), "v": sv(v),
    }


def _fwd_kernel(in8_ref, pe_ref, sm_ref, *refs):
    out_ref = refs[-1]
    w = {k: r[...] for k, r in zip(_PACKED_KEYS, refs[:-1])}
    feat = _compute_feat(in8_ref[...], pe_ref[...], sm_ref[...])
    out, _ = _forward_tile(w, feat)
    out_ref[...] = out.astype(out_ref.dtype)


def _bwd_kernel(in8_ref, g_ref, pe_ref, sm_ref, *refs):
    n_w = len(_PACKED_KEYS)
    w_refs, grad_refs = refs[:n_w], refs[n_w:]
    w = {k: r[...] for k, r in zip(_PACKED_KEYS, w_refs)}
    g = {k: r for k, r in zip(_PACKED_KEYS, grad_refs)}

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    feat = _compute_feat(in8_ref[...], pe_ref[...], sm_ref[...])
    _, st = _forward_tile(w, feat, save_dtype=SAVE_DTYPE, want_out=False)
    acts = st["acts"]
    H = acts[7]
    # fp32: the bias grads are plain row sums of go (no fp32-accumulate
    # matmul to save them) and must not accumulate in bf16
    go = g_ref[...].astype(jnp.float32)

    # relu masks compare in fp32: Mosaic rejects bf16 cmpf on v5e, and
    # the cast is free for fp32 saves / one VPU pass for bf16 saves
    def pos(x):
        return x.astype(jnp.float32) > 0

    def acc(wkey, bkey, a, gb):
        g[wkey][...] += _mm_tn(a, gb)
        g[bkey][...] += jnp.sum(gb, axis=0, keepdims=True)

    dH = _mm_nt(go, w["w_sig"])
    acc("w_sig", "b_sig", H, go)

    ga1 = _mm_nt(go, w["w_a2"]) * pos(st["a1"])
    acc("w_a2", "b_a2", st["a1"], go)
    dH += _mm_nt(ga1, w["w_a1"])
    acc("w_a1", "b_a1", H, ga1)

    gs1 = _mm_nt(go, w["w_s2"]) * pos(st["s1"])
    acc("w_s2", "b_s2", st["s1"], go)
    dH += _mm_nt(gs1, w["w_s1"])
    acc("w_s1", "b_s1", H, gs1)

    gm1 = _mm_nt(go, w["w_m2"]) * pos(st["m1"])
    acc("w_m2", "b_m2", st["m1"], go)
    dH += _mm_nt(gm1, w["w_m1"])
    acc("w_m1", "b_m1", H, gm1)

    gv = _mm_nt(go, w["w_r"]) * pos(st["v"])
    acc("w_r", "b_r", st["v"], go)
    gf = _mm_nt(gv, w["wv_f"])
    g["wv_f"][...] += _mm_tn(st["f"], gv)
    g["wv_d"][...] += _mm_tn(feat, gv)
    g["b_v"][...] += jnp.sum(gv, axis=0, keepdims=True)
    dH += _mm_nt(gf, w["w_f"])
    acc("w_f", "b_f", H, gf)

    gh = dH * pos(H)
    acc("w7", "b7", acts[6], gh)
    gh = _mm_nt(gh, w["w7"]) * pos(acts[6])
    acc("w6", "b6", acts[5], gh)
    gh = _mm_nt(gh, w["w6"]) * pos(acts[5])
    g["w5h"][...] += _mm_tn(acts[4], gh)
    g["w5x"][...] += _mm_tn(feat, gh)
    g["b5"][...] += jnp.sum(gh, axis=0, keepdims=True)
    gh = _mm_nt(gh, w["w5h"]) * pos(acts[4])
    for i in range(4, 0, -1):
        acc(f"w{i}", f"b{i}", acts[i - 1], gh)
        gh = _mm_nt(gh, w[f"w{i}"]) * pos(acts[i - 1])
    g["w0"][...] += _mm_tn(feat, gh)
    g["b0"][...] += jnp.sum(gh, axis=0, keepdims=True)


def _rep_spec(shape):
    return pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@jax.custom_vjp
def _fused_packed(packed_tuple, pe_consts, in8):
    return _run_fwd(packed_tuple, pe_consts, in8)


def _run_fwd(packed_tuple, pe_consts, in8):
    n = in8.shape[0]
    grid = n // TILE_FWD
    pe_mat, sin_mask = pe_consts
    return pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE_FWD, IN8_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _rep_spec(pe_mat.shape),
            _rep_spec(sin_mask.shape),
            *[_rep_spec(t.shape) for t in packed_tuple],
        ],
        out_specs=pl.BlockSpec(
            (TILE_FWD, OUT_W), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, OUT_W), OUT_DTYPE),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=_interpret(),
    )(in8, pe_mat, sin_mask, *packed_tuple)


def _fused_fwd(packed_tuple, pe_consts, in8):
    return _run_fwd(packed_tuple, pe_consts, in8), (packed_tuple, pe_consts, in8)


def _fused_bwd(res, g_out):
    packed_tuple, pe_consts, in8 = res
    pe_mat, sin_mask = pe_consts
    n = in8.shape[0]
    grid = n // TILE_BWD
    grads = pl.pallas_call(
        _bwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE_BWD, IN8_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BWD, OUT_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _rep_spec(pe_mat.shape),
            _rep_spec(sin_mask.shape),
            *[_rep_spec(t.shape) for t in packed_tuple],
        ],
        out_specs=tuple(_rep_spec(t.shape) for t in packed_tuple),
        out_shape=tuple(
            jax.ShapeDtypeStruct(t.shape, jnp.float32) for t in packed_tuple
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=_interpret(),
    )(in8, g_out, pe_mat, sin_mask, *packed_tuple)
    return (
        tuple(grads),
        (jnp.zeros_like(pe_mat), jnp.zeros_like(sin_mask)),
        jnp.zeros_like(in8),
    )


_fused_packed.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp_apply(
    params: Params, cfg: MLPConfig, in8: jnp.ndarray
) -> jnp.ndarray:
    """in8: packed [P, IN8_W] point block -> packed [P, OUT_W] raw outputs.
    ``params`` may be the model pytree or an already-packed dict (the
    packed training state skips the per-step pad/slice traffic)."""
    packed = params if is_packed(params) else pack_weights(params, cfg)
    packed_tuple = tuple(packed[k] for k in _PACKED_KEYS)
    n = in8.shape[0]
    pad = (-n) % max(TILE_FWD, TILE_BWD)
    if pad:
        in8 = jnp.concatenate([in8, jnp.zeros((pad, IN8_W), in8.dtype)])
    out = _fused_packed(packed_tuple, pe_constants(cfg), in8)[:n]
    # consumers (compositing, losses) stay fp32; the cast fuses into
    # them, so only the bf16 bytes cross HBM
    return out.astype(jnp.float32)


def build_in8(
    cfg: MLPConfig, pts: jnp.ndarray, viewdirs: jnp.ndarray
) -> jnp.ndarray:
    """[N, S, 3] pts + [N, 3] dirs -> packed [N*S, IN8_W] kernel input
    ``[x, y, z, dx, dy, dz, 1, 0]`` (the PE expands in-kernel).

    ``viewdirs`` is required: the constant-1 phase column makes the
    dir-PE cosine columns evaluate to cos(0)=1 for zero dirs (not 0),
    so a dirs-off mode cannot be faked with zeros — the model-level
    ``eval_points`` routes viewdirs=None to the XLA path instead."""
    if viewdirs is None:
        raise ValueError(
            "fused kernel requires viewdirs; use models.mlp.eval_points "
            "(XLA path) for the viewdirs-off architecture"
        )
    n, s, _ = pts.shape
    pts = pts.reshape(n * s, 3).astype(jnp.float32)
    dirs = jnp.broadcast_to(
        viewdirs.astype(jnp.float32)[:, None, :], (n, s, 3)
    ).reshape(n * s, 3)
    ones = jnp.ones((n * s, 1), jnp.float32)
    zeros = jnp.zeros((n * s, 1), jnp.float32)
    return jnp.concatenate([pts, dirs, ones, zeros], axis=-1)


def fused_eval_points(
    params: Params,
    cfg: MLPConfig,
    pts: jnp.ndarray,  # [N, S, 3]
    viewdirs: jnp.ndarray,  # [N, 3] (required — see build_in8)
    want_endpoint_feat: bool = False,
) -> RawOutputs:
    """Drop-in replacement for ``models.mlp.eval_points`` on the
    reference architecture (D=8, skip 4, viewdirs on)."""
    assert not want_endpoint_feat, "endpoint_feat uses the XLA path"
    n, s, _ = pts.shape
    c = cfg.num_semantic_classes
    in8 = build_in8(cfg, pts, viewdirs)
    out = fused_mlp_apply(params, cfg, in8).reshape(n, s, OUT_W)

    sigma = out[..., 0]
    albedo = jax.nn.sigmoid(out[..., 1:4])
    shading = jax.nn.sigmoid(out[..., 4])
    residual = jax.nn.sigmoid(out[..., 5:8])
    sem_logits = out[..., 8 : 8 + c] if cfg.enable_semantic else None
    rgb = albedo * shading[..., None] + residual
    return RawOutputs(
        rgb=rgb,
        sigma=sigma,
        albedo=albedo,
        shading=shading,
        residual=residual,
        sem_logits=sem_logits,
        endpoint_feat=None,
    )
