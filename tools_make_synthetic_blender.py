"""Generate a synthetic Blender-intrinsic OBJECT dataset for the
object-level head-to-head (VERDICT r4 next-round item 4).

Layout matches BOTH reference loaders at once:

- ``transforms_{train,val,test}.json`` + ``{split}/r_N.png`` (RGBA) —
  the standard NeRF-blender layout ``load_blender.py`` reads (the
  reference's ``dataset_type=blender_intrinsic`` path actually loads
  images through ``load_blender_data``, ``run_nerf.py:699-711``, and
  uses the alpha channel as the object mask).
- ``{split}/color/r_N.png`` + ``{split}/albedo/r_N_albedo_0001.png`` —
  the GT-albedo companion layout ``load_blender_intrinsic.py:44-77``
  defines (and our ``data/blender.load_blender_intrinsic_data`` reads).

The object is a lambertian cluster of spheres + boxes with ~9 flat
albedo colors inside radius ~1.2, lit by two directional lights +
ambient, so ``rgb = albedo * shading`` exactly, residual == 0, and the
decomposition is well-posed.  Cameras sit on the radius-4 sphere
looking at the origin (near 2 / far 6, the blender defaults
``run_nerf.py:706-707``).

Usage: python tools_make_synthetic_blender.py out_dir [--width 64]
       [--train 24 --test 5 --val 1]
"""

import argparse
import json
import os

import numpy as np

CAMERA_ANGLE_X = 0.6911112070083618  # the standard blender synthetic fov

# flat albedo palette (9 colors)
ALBEDOS = np.array(
    [
        [0.85, 0.25, 0.20],  # sphere A upper
        [0.20, 0.45, 0.85],  # sphere A lower
        [0.25, 0.75, 0.30],  # sphere B
        [0.90, 0.80, 0.25],  # sphere C
        [0.80, 0.35, 0.75],  # box A side
        [0.30, 0.75, 0.75],  # box A top/bottom
        [0.95, 0.55, 0.20],  # box B side
        [0.45, 0.30, 0.80],  # box B top/bottom
        [0.80, 0.80, 0.80],  # pedestal
    ],
    np.float32,
)

SPHERES = [  # (center, radius, upper-color idx, lower-color idx)
    (np.array([0.0, 0.0, 0.45]), 0.45, 0, 1),
    (np.array([0.65, 0.25, 0.25]), 0.25, 2, 2),
    (np.array([-0.55, -0.35, 0.2]), 0.2, 3, 3),
]
BOXES = [  # (center, halfwidths, side-color idx, topbottom-color idx)
    (np.array([-0.35, 0.55, 0.2]), np.array([0.22, 0.22, 0.2]), 4, 5),
    (np.array([0.35, -0.6, 0.15]), np.array([0.18, 0.18, 0.15]), 6, 7),
    (np.array([0.0, 0.0, -0.1]), np.array([1.0, 1.0, 0.1]), 8, 8),  # pedestal
]

L1 = np.array([0.5, 0.3, 0.8])
L2 = np.array([-0.6, -0.2, 0.5])
AMBIENT = 0.25


def pose_spherical(theta_deg, phi_deg, radius):
    """Blender-convention c2w on the sphere (load_blender.py:11-33)."""
    th, phi = np.deg2rad(theta_deg), np.deg2rad(phi_deg)
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius
    rx = np.eye(4, dtype=np.float32)
    rx[1, 1] = rx[2, 2] = np.cos(phi)
    rx[1, 2], rx[2, 1] = -np.sin(phi), np.sin(phi)
    ry = np.eye(4, dtype=np.float32)
    ry[0, 0] = ry[2, 2] = np.cos(th)
    ry[0, 2], ry[2, 0] = -np.sin(th), np.sin(th)
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float32
    )
    return flip @ ry @ rx @ trans


def _ray_sphere(o, d, c, r):
    oc = o - c
    b = np.sum(oc * d, -1)
    disc = b * b - (np.sum(oc * oc, -1) - r * r)
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0))
    return np.where(hit & (t > 0), t, np.inf)


def _ray_box(o, d, c, hw):
    inv = 1.0 / np.where(np.abs(d) < 1e-9, 1e-9, d)
    t0 = (c - hw - o) * inv
    t1 = (c + hw - o) * inv
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    hit = (tf > tn) & (tf > 0)
    return np.where(hit & (tn > 0), tn, np.inf)


def render_view(c2w, h, w, focal):
    j, i = np.meshgrid(np.arange(w), np.arange(h))
    dirs = np.stack(
        [
            (j - w * 0.5) / focal,
            -(i - h * 0.5) / focal,
            -np.ones_like(i, np.float32),
        ],
        -1,
    ).astype(np.float32)
    d = dirs @ c2w[:3, :3].T
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(c2w[:3, 3], d.shape)
    d = d.reshape(-1, 3)
    o = o.reshape(-1, 3)

    best_t = np.full(len(d), np.inf, np.float32)
    normal = np.zeros((len(d), 3), np.float32)
    color_idx = np.zeros(len(d), np.int64)
    for c, r, iu, il in SPHERES:
        t = _ray_sphere(o, d, c, r)
        m = t < best_t
        best_t = np.where(m, t, best_t)
        p = o + t[:, None] * d
        n = (p - c) / r
        normal[m] = n[m]
        # hemisphere split in object frame (distinct palette entries)
        color_idx[m] = np.where(n[m][:, 2] >= 0, iu, il)
    for c, hw, iside, itop in BOXES:
        t = _ray_box(o, d, c, hw)
        m = t < best_t
        best_t = np.where(m, t, best_t)
        p = o + t[:, None] * d
        rel = (p - c) / hw
        ax = np.argmax(np.abs(rel), -1)
        n = np.zeros_like(p)
        n[np.arange(len(p)), ax] = np.sign(rel[np.arange(len(p)), ax])
        normal[m] = n[m]
        color_idx[m] = np.where(ax[m] == 2, itop, iside)

    hit = np.isfinite(best_t)
    albedo = ALBEDOS[color_idx]
    l1 = L1 / np.linalg.norm(L1)
    l2 = L2 / np.linalg.norm(L2)
    shade = (
        AMBIENT
        + 0.55 * np.maximum(normal @ l1, 0)
        + 0.35 * np.maximum(normal @ l2, 0)
    )
    rgb = np.clip(albedo * shade[:, None], 0, 1)
    rgba = np.concatenate([rgb, hit[:, None].astype(np.float32)], -1)
    alb_rgba = np.concatenate(
        [albedo, hit[:, None].astype(np.float32)], -1
    )
    rgba[~hit, :3] = 0.0
    alb_rgba[~hit, :3] = 0.0
    return rgba.reshape(h, w, 4), alb_rgba.reshape(h, w, 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--train", type=int, default=24)
    ap.add_argument("--test", type=int, default=5)
    ap.add_argument("--val", type=int, default=1)
    args = ap.parse_args()

    import imageio.v2 as imageio

    h, w = args.height, args.width
    focal = 0.5 * w / np.tan(0.5 * CAMERA_ANGLE_X)
    splits = {
        "train": [
            (th, (-20.0, -35.0, -50.0)[k % 3])
            for k, th in enumerate(
                np.linspace(-180, 180, args.train, endpoint=False)
            )
        ],
        "val": [
            (th + 7.0, -25.0)
            for th in np.linspace(-180, 180, args.val, endpoint=False)
        ],
        "test": [
            (th + 11.0, -30.0)
            for th in np.linspace(-180, 180, args.test, endpoint=False)
        ],
    }
    for split, cams in splits.items():
        os.makedirs(os.path.join(args.out_dir, split, "color"), exist_ok=True)
        os.makedirs(os.path.join(args.out_dir, split, "albedo"), exist_ok=True)
        frames = []
        for n, (th, phi) in enumerate(cams):
            c2w = pose_spherical(th, phi, 4.0)
            rgba, alb = render_view(c2w, h, w, focal)
            name = f"r_{n}"
            img8 = (rgba * 255).astype(np.uint8)
            alb8 = (alb * 255).astype(np.uint8)
            # standard blender layout (load_blender.py reads this) ...
            imageio.imwrite(
                os.path.join(args.out_dir, split, name + ".png"), img8
            )
            # ... and the blender_intrinsic companion layout
            imageio.imwrite(
                os.path.join(args.out_dir, split, "color", name + ".png"),
                img8,
            )
            imageio.imwrite(
                os.path.join(
                    args.out_dir, split, "albedo", name + "_albedo_0001.png"
                ),
                alb8,
            )
            frames.append(
                {
                    "file_path": f"./{split}/{name}",
                    "transform_matrix": c2w.tolist(),
                }
            )
        with open(
            os.path.join(args.out_dir, f"transforms_{split}.json"), "w"
        ) as f:
            json.dump(
                {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}, f
            )
    with open(os.path.join(args.out_dir, "albedo_colors.json"), "w") as f:
        json.dump({"albedos": ALBEDOS.tolist()}, f)
    print(
        f"wrote blender-intrinsic object set to {args.out_dir} "
        f"({args.train} train / {args.val} val / {args.test} test at "
        f"{w}x{h}, {len(ALBEDOS)} albedos)"
    )


if __name__ == "__main__":
    main()
