"""Generate a synthetic Replica-format scene for end-to-end validation.

Round-4 "hard" scene (VERDICT r3 missing #3: the old 4-class axis-
aligned cube passed the gate at thresholds that couldn't catch a subtly
broken intrinsic decomposition).  This one ray-traces a textured
multi-object room:

- **10 semantic classes**: walls / floor / ceiling + 7 objects
  (two cabinets, a table with four *thin* legs, a thin pillar, two
  spheres, a wall panel).
- **38 distinct flat albedo colors** (of 48 generated) (checkerboard floor, striped
  walls, per-face cabinet colors, hemisphere spheres, checker panel) so
  the reflectance mean-shift has a real palette to recover, per class.
- **Thin structures** (0.04-halfwidth table legs, 0.09 pillar) that
  uniform coarse sampling must actually resolve.
- **Smooth shading** (two-light lambertian + ambient on curved and flat
  surfaces) with ``rgb = albedo * shading`` exactly and residual == 0,
  so the intrinsic decomposition is well-posed and the residual head's
  job is to vanish.

Writes ``rgb/ depth/ semantic_class/ semantic_instance/ traj_w_c.txt``
in the exact layout ``data/replica.py`` loads (and the reference's
loader reads), plus ground-truth ``gt_albedo/`` images and
``albedo_colors.json`` (the exact palette) for decomposition-fidelity
checks in the convergence gate.

Usage: python tools_make_synthetic_replica.py out_dir [--frames 60]
       [--width 160 --height 120] [--simple]
"""

import argparse
import json
import os

import numpy as np

# semantic classes
WALL, FLOOR, CEIL, CAB_A, CAB_B, TABLE, PILLAR, SPH_A, SPH_B, PANEL = range(
    1, 11
)
N_CLASSES = 10
ROOM = 2.0  # half-extent in x/z; y in [0, 2]
LIGHT1 = np.array([0.3, 0.9, 0.2]) / np.linalg.norm([0.3, 0.9, 0.2])
LIGHT2 = np.array([-0.55, 0.7, -0.45]) / np.linalg.norm([-0.55, 0.7, -0.45])


def _palette(n, seed):
    """n distinct, well-separated flat albedos (deterministic)."""
    rng = np.random.default_rng(seed)
    h = (np.arange(n) / n + rng.uniform(0, 1 / n, n)) % 1.0
    s = rng.uniform(0.35, 0.9, n)
    v = rng.uniform(0.35, 0.95, n)
    i = (h * 6).astype(int) % 6
    f = h * 6 - np.floor(h * 6)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    rgb = np.select(
        [(i == k)[:, None] for k in range(6)],
        [
            np.stack([v, t, p], -1), np.stack([q, v, p], -1),
            np.stack([p, v, t], -1), np.stack([p, q, v], -1),
            np.stack([t, p, v], -1), np.stack([v, p, q], -1),
        ],
    )
    return np.clip(rgb, 0.12, 0.95)


PAL = _palette(48, seed=20220414)
_next = iter(range(len(PAL)))


def _take(k):
    return np.stack([PAL[next(_next)] for _ in range(k)])


# material palettes (deterministic slot assignment; 38 of the 48
# generated colors are used: 4+4+4+1+6+6+2+5+2+2+2)
FLOOR_COLS = _take(4)  # 2x2 checker
WALL_X_COLS = _take(4)  # x-facing walls: 4 y-stripes
WALL_Z_COLS = _take(4)  # z-facing walls: 4 y-stripes
CEIL_COLS = _take(1)
CAB_A_COLS = _take(6)  # per-face
CAB_B_COLS = _take(6)
TABLE_COLS = _take(2)  # top, legs
PILLAR_COLS = _take(5)  # 4 sides + top
SPH_A_COLS = _take(2)  # hemispheres
SPH_B_COLS = _take(2)
PANEL_COLS = _take(2)  # checker

ALL_ALBEDOS = np.concatenate(
    [FLOOR_COLS, WALL_X_COLS, WALL_Z_COLS, CEIL_COLS, CAB_A_COLS, CAB_B_COLS,
     TABLE_COLS, PILLAR_COLS, SPH_A_COLS, SPH_B_COLS, PANEL_COLS]
)

# boxes: (center, half-extent, class, instance, material).  Placement
# keeps every object clear of the camera orbit (radius 1.15, y in
# [0.75, 1.25]): the cabinets hug the corners, the table sits well
# inside the orbit.
_t_top = 0.62  # table-top center height
BOXES = [
    (np.array([1.45, 0.45, -1.30]), np.array([0.35, 0.45, 0.40]), CAB_A, 10,
     ("faces", CAB_A_COLS)),
    (np.array([-1.50, 0.30, 1.30]), np.array([0.35, 0.30, 0.35]), CAB_B, 11,
     ("faces", CAB_B_COLS)),
    # table: thin top slab + 4 thin legs
    (np.array([0.00, _t_top, 0.45]), np.array([0.50, 0.03, 0.35]), TABLE, 12,
     ("flat", TABLE_COLS[0])),
    *[
        (np.array([sx * 0.42, (_t_top - 0.03) / 2, 0.45 + sz * 0.27]),
         np.array([0.04, (_t_top - 0.03) / 2, 0.04]), TABLE, 12,
         ("flat", TABLE_COLS[1]))
        for sx in (-1, 1)
        for sz in (-1, 1)
    ],
    # thin pillar, floor to ceiling
    (np.array([-0.55, 1.0, -0.70]), np.array([0.09, 1.0, 0.09]), PILLAR, 13,
     ("faces", PILLAR_COLS[[0, 1, 2, 3, 4, 4]])),
    # wall panel (checker picture) on the +z wall, 6cm proud
    (np.array([0.35, 1.15, ROOM - 0.03]), np.array([0.55, 0.40, 0.03]),
     PANEL, 14, ("checker_xy", PANEL_COLS)),
]
SPHERES = [  # (center, radius, class, instance, hemisphere cols)
    (np.array([0.85, 0.22, 0.15]), 0.22, SPH_A, 15, SPH_A_COLS),
    # resting on the table top (top surface y = _t_top + 0.03)
    (np.array([0.00, _t_top + 0.03 + 0.18, 0.45]), 0.18, SPH_B, 16,
     SPH_B_COLS),
]


def _box_hit(o, d, center, half):
    """Entry t and face normal for rays hitting an AABB from outside."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = (center - half - o) / d
        t1 = (center + half - o) / d
    tmin = np.nanmax(np.minimum(t0, t1), axis=1)
    tmax = np.nanmin(np.maximum(t0, t1), axis=1)
    hit = (tmax > tmin) & (tmax > 1e-4) & (tmin > 1e-4)
    t = np.where(hit, tmin, np.inf)
    p = o + d * t[:, None]
    axis = np.argmax(np.abs((p - center) / half), axis=1)
    sign = np.sign((p - center)[np.arange(len(p)), axis])
    normal = np.zeros_like(p)
    normal[np.arange(len(p)), axis] = sign
    face = axis * 2 + (sign > 0).astype(int)  # 0:-x 1:+x 2:-y 3:+y 4:-z 5:+z
    return t, normal, hit, face


def _sphere_hit(o, d, center, r):
    """d need not be unit length (camera dirs are unit-z)."""
    oc = o - center
    a = np.sum(d * d, axis=1)
    b = np.sum(oc * d, axis=1)
    c = np.sum(oc * oc, axis=1) - r * r
    disc = b * b - a * c
    ok = disc > 0
    sq = np.sqrt(np.where(ok, disc, 0.0))
    t = (-b - sq) / a
    hit = ok & (t > 1e-4)
    t = np.where(hit, t, np.inf)
    p = o + d * t[:, None]
    normal = (p - center) / r
    return t, normal, hit


def _room_hit(o, d):
    """Exit t of the room interior + inward face normal + wall id."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t0 = (-ROOM - o[:, [0, 2]]) / d[:, [0, 2]]  # x,z walls
        t1 = (ROOM - o[:, [0, 2]]) / d[:, [0, 2]]
        ty0 = (0.0 - o[:, 1]) / d[:, 1]  # floor y=0
        ty1 = (2.0 - o[:, 1]) / d[:, 1]  # ceiling y=2
    cand = np.stack(
        [t0[:, 0], t1[:, 0], t0[:, 1], t1[:, 1], ty0, ty1], axis=1
    )
    cand = np.where(cand > 1e-4, cand, np.inf)
    idx = np.argmin(cand, axis=1)
    t = cand[np.arange(len(cand)), idx]
    cls = np.where(idx == 4, FLOOR, np.where(idx == 5, CEIL, WALL))
    normals = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 0, 1], [0, 0, -1], [0, 1, 0], [0, -1, 0]],
        np.float64,
    )
    return t, normals[idx], cls, idx


def _checker(u, v, cols, cell=0.5):
    iu = np.floor(u / cell).astype(int) & 1
    iv = np.floor(v / cell).astype(int) & 1
    return cols[iu * 2 + iv]


def _stripes(y, cols, y0=0.0, y1=2.0):
    k = np.clip(((y - y0) / (y1 - y0) * len(cols)).astype(int), 0,
                len(cols) - 1)
    return cols[k]


def trace(o, d, simple=False):
    """Returns (rgb, albedo, depth_t, class, instance) per ray."""
    n = len(o)
    t_best, n_best, cls, wall_idx = _room_hit(o, d)
    inst = cls.copy()
    albedo = np.zeros((n, 3))
    p = o + d * t_best[:, None]

    # room surfaces
    floor_m = cls == FLOOR
    albedo[floor_m] = _checker(
        p[floor_m, 0] + ROOM, p[floor_m, 2] + ROOM, FLOOR_COLS
    )
    ceil_m = cls == CEIL
    albedo[ceil_m] = CEIL_COLS[0]
    wx = (cls == WALL) & (wall_idx < 2)
    albedo[wx] = _stripes(p[wx, 1], WALL_X_COLS)
    wz = (cls == WALL) & (wall_idx >= 2)
    albedo[wz] = _stripes(p[wz, 1], WALL_Z_COLS)

    if simple:
        boxes = BOXES[:2]
        spheres = []
    else:
        boxes, spheres = BOXES, SPHERES

    for center, half, bcls, binst, mat in boxes:
        t, nrm, hit, face = _box_hit(o, d, center, half)
        closer = hit & (t < t_best)
        if not closer.any():
            continue
        ph = o + d * t[:, None]
        kind, cols = mat
        if kind == "faces":
            a = np.asarray(cols)[face]
        elif kind == "checker_xy":
            a = _checker(
                ph[:, 0] - center[0], ph[:, 1] - center[1],
                np.asarray([cols[0], cols[1], cols[1], cols[0]]), cell=0.18,
            )
        else:  # flat
            a = np.broadcast_to(cols, (n, 3))
        t_best = np.where(closer, t, t_best)
        n_best = np.where(closer[:, None], nrm, n_best)
        cls = np.where(closer, bcls, cls)
        inst = np.where(closer, binst, inst)
        albedo = np.where(closer[:, None], a, albedo)

    for center, r, scls, sinst, cols in spheres:
        t, nrm, hit = _sphere_hit(o, d, center, r)
        closer = hit & (t < t_best)
        if not closer.any():
            continue
        a = np.where((nrm[:, 1] > 0)[:, None], cols[0], cols[1])
        t_best = np.where(closer, t, t_best)
        n_best = np.where(closer[:, None], nrm, n_best)
        cls = np.where(closer, scls, cls)
        inst = np.where(closer, sinst, inst)
        albedo = np.where(closer[:, None], a, albedo)

    shade = (
        0.35
        + 0.45 * np.clip(n_best @ LIGHT1, 0, 1)
        + 0.20 * np.clip(n_best @ LIGHT2, 0, 1)
    )
    rgb = np.clip(albedo * shade[:, None], 0, 1)
    return rgb, albedo, t_best, cls, inst


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--width", type=int, default=160)
    parser.add_argument("--height", type=int, default=120)
    parser.add_argument(
        "--simple", action="store_true",
        help="legacy 5-class cube room (2 boxes, no spheres/thin parts)",
    )
    args = parser.parse_args()

    import imageio.v2 as imageio

    h, w = args.height, args.width
    fx = w / 2.0  # hfov 90 like Replica
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    i = np.arange(w)[None, :].repeat(h, 0)
    j = np.arange(h)[:, None].repeat(w, 1)
    dirs_cam = np.stack(
        [(i - cx) / fx, (j - cy) / fx, np.ones_like(i, np.float64)], -1
    ).reshape(-1, 3)  # opencv convention

    for sub in (
        "rgb", "depth", "semantic_class", "semantic_instance", "gt_albedo"
    ):
        os.makedirs(os.path.join(args.out_dir, sub), exist_ok=True)

    traj = []
    for f in range(args.frames):
        ang = 2 * np.pi * f / args.frames
        # camera orbits the room center at varying height, looking inward
        pos = np.array(
            [1.15 * np.cos(ang), 1.0 + 0.25 * np.sin(2 * ang), 1.15 * np.sin(ang)]
        )
        fwd = np.array([-np.cos(ang), 0.12 - 0.2 * np.sin(2 * ang), -np.sin(ang)])
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])  # opencv y-down
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, fwd, pos
        traj.append(c2w.reshape(-1))

        d_world = dirs_cam @ c2w[:3, :3].T
        o = np.broadcast_to(pos, d_world.shape)
        rgb, albedo, t, cls, inst = trace(o, d_world, simple=args.simple)
        depth_z = t * dirs_cam[:, 2]  # z-depth for unit-z camera dirs

        imageio.imwrite(
            os.path.join(args.out_dir, "rgb", f"rgb_{f}.png"),
            (rgb.reshape(h, w, 3) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(args.out_dir, "gt_albedo", f"albedo_{f}.png"),
            (albedo.reshape(h, w, 3) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(args.out_dir, "depth", f"depth_{f}.png"),
            np.clip(depth_z.reshape(h, w) * 1000, 0, 65535).astype(np.uint16),
        )
        imageio.imwrite(
            os.path.join(args.out_dir, "semantic_class", f"semantic_class_{f}.png"),
            cls.reshape(h, w).astype(np.uint8),
        )
        imageio.imwrite(
            os.path.join(
                args.out_dir, "semantic_instance", f"semantic_instance_{f}.png"
            ),
            inst.reshape(h, w).astype(np.uint8),
        )
    np.savetxt(
        os.path.join(args.out_dir, "traj_w_c.txt"), np.stack(traj), delimiter=" "
    )
    with open(os.path.join(args.out_dir, "albedo_colors.json"), "w") as fjs:
        json.dump(
            {
                "n_classes": N_CLASSES,
                "albedos": np.round(ALL_ALBEDOS, 6).tolist(),
                "shading_range": [0.30, 1.0],
            },
            fjs,
            indent=1,
        )
    print(
        f"wrote {args.frames} frames to {args.out_dir} "
        f"({'simple' if args.simple else 'hard'} scene, "
        f"{len(ALL_ALBEDOS)} palette albedos)"
    )


if __name__ == "__main__":
    main()
