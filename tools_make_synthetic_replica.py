"""Generate a synthetic Replica-format scene for end-to-end validation.

Ray-traces a cube room (4 walls + floor + ceiling, distinct albedos)
containing two boxes with their own semantic classes, writes
``rgb/ depth/ semantic_class/ semantic_instance/ traj_w_c.txt`` in the
exact layout ``data/replica.py`` loads (and the reference's loader
reads), so the full scene pipeline — semantic CE, depth eval, cluster
tree over classes — runs without the real dataset.

Usage: python tools_make_synthetic_replica.py out_dir [--frames 60]
       [--width 160 --height 120]
"""

import argparse
import os

import numpy as np

# semantic classes: 0 void (unused), walls 1, floor 2, ceiling 3, box1 4, box2 5
WALL, FLOOR, CEIL, BOX1, BOX2 = 1, 2, 3, 4, 5
ALBEDO = {
    WALL: (0.75, 0.72, 0.65),
    FLOOR: (0.45, 0.30, 0.18),
    CEIL: (0.9, 0.9, 0.92),
    BOX1: (0.75, 0.15, 0.12),
    BOX2: (0.12, 0.35, 0.75),
}
ROOM = 2.0  # half-extent of the room cube
BOXES = [  # (center, half-extent, class)
    (np.array([0.8, 0.55, -0.6]), np.array([0.4, 0.55, 0.4]), BOX1),
    (np.array([-0.9, 0.3, 0.7]), np.array([0.3, 0.3, 0.3]), BOX2),
]
LIGHT_DIR = np.array([0.3, 0.9, 0.2]) / np.linalg.norm([0.3, 0.9, 0.2])


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
    return t, normal, hit


def _room_hit(o, d):
    """Exit t of the room interior + inward face normal + class."""
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
    return t, normals[idx], cls


def trace(o, d):
    """Returns (rgb, depth_z, class, instance) per ray."""
    n = len(o)
    t_best, n_best, cls = _room_hit(o, d)
    inst = cls.copy()
    for i, (c, h, bcls) in enumerate(BOXES):
        t, nrm, hit = _box_hit(o, d, c, h)
        closer = hit & (t < t_best)
        t_best = np.where(closer, t, t_best)
        n_best = np.where(closer[:, None], nrm, n_best)
        cls = np.where(closer, bcls, cls)
        inst = np.where(closer, 10 + i, inst)
    albedo = np.zeros((n, 3))
    for k, v in ALBEDO.items():
        albedo[cls == k] = v
    shade = 0.35 + 0.65 * np.clip(n_best @ LIGHT_DIR, 0, 1)
    rgb = np.clip(albedo * shade[:, None], 0, 1)
    return rgb, t_best, cls, inst


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--width", type=int, default=160)
    parser.add_argument("--height", type=int, default=120)
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

    for sub in ("rgb", "depth", "semantic_class", "semantic_instance"):
        os.makedirs(os.path.join(args.out_dir, sub), exist_ok=True)

    traj = []
    for f in range(args.frames):
        ang = 2 * np.pi * f / args.frames
        # camera orbits the room center at fixed height, looking inward
        pos = np.array([1.1 * np.cos(ang), 1.0, 1.1 * np.sin(ang)])
        fwd = np.array([-np.cos(ang), 0.15, -np.sin(ang)])
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
        rgb, t, cls, inst = trace(o, d_world)
        depth_z = t * dirs_cam[:, 2]  # z-depth for unit-z camera dirs

        imageio.imwrite(
            os.path.join(args.out_dir, "rgb", f"rgb_{f}.png"),
            (rgb.reshape(h, w, 3) * 255).astype(np.uint8),
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
    print(f"wrote {args.frames} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
