"""Generate the large triangle-mesh benchmark scene (BASELINE config 5).

Builds a procedural OBJ (subdivided icosphere + faceted terrain) plus a
scene file at 1920×1080 — the reference format extended with the ``mesh``
object type. Run from the repo root:

    python scripts/make_mesh_scene.py [--subdiv 5] [--out scenes]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def icosphere(subdiv: int):
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        cache = {}
        vlist = [v for v in verts]

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (vlist[a] + vlist[b]) / 2
                m /= np.linalg.norm(m)
                cache[key] = len(vlist)
                vlist.append(m)
            return cache[key]

        new_faces = []
        for f in faces:
            a, b, c = (int(x) for x in f)
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, np.int64)
    return verts, faces


def terrain(n: int, size: float, rng):
    xs = np.linspace(-size, size, n)
    zs = np.linspace(-size, size, n)
    xx, zz = np.meshgrid(xs, zs)
    yy = (
        0.6 * np.sin(xx * 0.7) * np.cos(zz * 0.6)
        + 0.3 * np.sin(xx * 1.9 + 1.3) * np.cos(zz * 2.1)
    )
    verts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    return verts, np.asarray(faces, np.int64)


def write_obj(path, verts, faces):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in faces:
            f.write(f"f {t[0]+1} {t[1]+1} {t[2]+1}\n")


SCENE_TEMPLATE = """// Large triangle-mesh benchmark scene (1080p, BVH + mesh extension)
MATERIAL 0
RGB         1 1 1
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   5

MATERIAL 1
RGB         .85 .81 .78
SPECEX      0
SPECRGB     0 0 0
REFL        0
REFR        0
REFRIOR     0
EMITTANCE   0

MATERIAL 2
RGB         .4 .6 .9
SPECEX      0
SPECRGB     .9 .9 .9
REFL        .6
REFR        .7
REFRIOR     0
EMITTANCE   0

CAMERA
RES         1920 1080
FOVY        35
ITERATIONS  200
DEPTH       8
FILE        mesh1080p
EYE         0 3.5 12
LOOKAT      0 1.5 0
UP          0 1 0

OBJECT 0
cube
material 0
TRANS       0 11 2
ROTAT       0 0 0
SCALE       6 .3 6

OBJECT 1
mesh
material 2
FILE {sphere_obj}
TRANS       0 2.2 0
ROTAT       0 20 0
SCALE       2 2 2

OBJECT 2
mesh
material 1
FILE {terrain_obj}
TRANS       0 0 0
ROTAT       0 0 0
SCALE       1 1 1
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=5,
                    help="icosphere subdivisions (5 → 20480 faces)")
    ap.add_argument("--terrain", type=int, default=96,
                    help="terrain grid resolution (96 → 18050 faces)")
    ap.add_argument("--out", default="scenes")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(0)
    sv, sf = icosphere(args.subdiv)
    tv, tf = terrain(args.terrain, 14.0, rng)
    sphere_obj = os.path.join(args.out, "mesh_sphere.obj")
    terrain_obj = os.path.join(args.out, "mesh_terrain.obj")
    write_obj(sphere_obj, sv, sf)
    write_obj(terrain_obj, tv, tf)
    scene_path = os.path.join(args.out, "mesh1080p.txt")
    with open(scene_path, "w") as f:
        f.write(
            SCENE_TEMPLATE.format(
                sphere_obj=os.path.basename(sphere_obj),
                terrain_obj=os.path.basename(terrain_obj),
            )
        )
    total = len(sf) + len(tf)
    print(f"wrote {scene_path} ({total} triangles)")


if __name__ == "__main__":
    main()
