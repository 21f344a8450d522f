"""Icosahedral mesh used for descriptor orientation binning.

Reproduces the geometry of the reference (`Src/cUtil.cc:19-55` vertex/face
tables, `Src/cUtil.cc:113-175` Initialize_geometry): a regular icosahedron
inscribed in the unit sphere, with each face's vertex order swapped when the
outward normal test ``dot(cross(v2-v1, v1-v0), v0) < 0`` fails.

Everything here is computed once in NumPy at import time; the arrays become
compile-time constants of the TPU kernels.
"""

from __future__ import annotations

import numpy as np

from .config import ICOS_NFACES, ICOS_NVERT

GOLDEN_RATIO = 1.6180339887  # Src/cUtil.cc:19

_gr = GOLDEN_RATIO

# Vertices of a regular icosahedron (Src/cUtil.cc:22-33), rows = (x, y, z).
VERTS_RAW = np.array(
    [
        [0, 1, _gr],
        [0, -1, _gr],
        [0, 1, -_gr],
        [0, -1, -_gr],
        [1, _gr, 0],
        [-1, _gr, 0],
        [1, -_gr, 0],
        [-1, -_gr, 0],
        [_gr, 0, 1],
        [-_gr, 0, 1],
        [_gr, 0, -1],
        [-_gr, 0, -1],
    ],
    dtype=np.float64,
)

# Vertex index triplets per face (Src/cUtil.cc:36-55).
FACES = np.array(
    [
        [0, 1, 8],
        [0, 8, 4],
        [0, 4, 5],
        [0, 5, 9],
        [0, 9, 1],
        [1, 6, 8],
        [8, 6, 10],
        [8, 10, 4],
        [4, 10, 2],
        [4, 2, 5],
        [5, 2, 11],
        [5, 11, 9],
        [9, 11, 7],
        [9, 7, 1],
        [1, 7, 6],
        [3, 6, 7],
        [3, 7, 11],
        [3, 11, 2],
        [3, 2, 10],
        [3, 10, 6],
    ],
    dtype=np.int32,
)


def build_mesh() -> tuple[np.ndarray, np.ndarray]:
    """Return (tri_verts, tri_idx).

    tri_verts: (20, 3, 3) float32 — per face, the three unit-sphere vertex
        coordinates, in the winding order the reference ends up with after
        its normal-fix swap (Src/cUtil.cc:156-171).
    tri_idx: (20, 3) int32 — per face, vertex indices into the 12-vertex
        solid. NOTE the reference swaps only the *coordinates* v[0]<->v[1]
        when fixing winding, NOT the idx[] array (Src/cUtil.cc:166-171); the
        descriptor scatter uses idx[] while barycentric weights follow the
        swapped coordinates, so the two arrays intentionally disagree on
        swapped faces. We replicate this exactly.
    """
    # Normalise each vertex to unit length in float32 like the reference
    # (SIFT3D_CVEC_L2_NORM returns float; scale by 1/mag).
    verts32 = VERTS_RAW.astype(np.float32)
    tri_verts = np.zeros((ICOS_NFACES, 3, 3), dtype=np.float32)
    tri_idx = FACES.copy()

    for i in range(ICOS_NFACES):
        v = np.empty((3, 3), dtype=np.float32)
        for j in range(3):
            vj = verts32[FACES[i, j]].astype(np.float32)
            mag = np.float32(np.sqrt(np.float32(vj[0] * vj[0] + vj[1] * vj[1] + vj[2] * vj[2])))
            v[j] = (vj.astype(np.float64) * (1.0 / float(mag))).astype(np.float32)
        t1 = v[2] - v[1]
        t2 = v[1] - v[0]
        n = np.cross(t1.astype(np.float64), t2.astype(np.float64)).astype(np.float32)
        if float(np.dot(n.astype(np.float64), v[0].astype(np.float64))) < 0:
            v[[0, 1]] = v[[1, 0]]
        tri_verts[i] = v

    return tri_verts, tri_idx


TRI_VERTS, TRI_IDX = build_mesh()


def moller_trumbore_constants() -> dict[str, np.ndarray]:
    """Precompute the gradient-independent parts of cart2bary
    (Src/cSIFT3D.cc:1592-1637) for all 20 faces.

    cart2bary computes, for ray direction D (the gradient) and triangle
    (v0, v1, v2):
        e1 = v1 - v0, e2 = v2 - v0, t = -v0
        p = D x e2, q = t x e1
        det = e1 . p
        bary_y = (p . t) / det, bary_z = (D . q) / det, bary_x = 1 - y - z
        k = (q . e2) / det
    Only e1, e2, t, q depend purely on the face.
    """
    v0 = TRI_VERTS[:, 0, :].astype(np.float32)
    v1 = TRI_VERTS[:, 1, :].astype(np.float32)
    v2 = TRI_VERTS[:, 2, :].astype(np.float32)
    e1 = v1 - v0
    e2 = v2 - v0
    t = -v0
    q = np.cross(t, e1).astype(np.float32)
    return {"v0": v0, "e1": e1, "e2": e2, "t": t, "q": q}


MESH_CONST = moller_trumbore_constants()


def argmax_face_constants() -> dict[str, np.ndarray]:
    """Constant tables for the argmax-over-normals face path.

    The containing face of a direction on a face-transitive polyhedron with
    a common insphere (the icosahedron) is the argmax of ``dot(g, n̂_f)``
    over outward unit normals — the equivalence the independent CPU baseline
    uses in place of the reference's first-hit loop
    (native/cpu_baseline.cc:454-461; reference loop Src/cSIFT3D.cc:1542-1573)
    and verified there on 2e5 random directions. With the face known, the
    Möller–Trumbore ratios reduce to three dot products with per-face
    constant vectors:

        det = g·(e2 × e1),  by = g·(e2 × t)/det,  bz = g·q/det,
        k   = (q·e2)/det   (q·e2 a per-face scalar).

    Returns: normals (20, 3) f32 outward unit normals; c_det, c_by, c_bz
    (20, 3) f32 dot constants; qe2 (20,) f32.
    """
    v0 = TRI_VERTS[:, 0, :].astype(np.float64)
    v1 = TRI_VERTS[:, 1, :].astype(np.float64)
    v2 = TRI_VERTS[:, 2, :].astype(np.float64)
    e1 = v1 - v0
    e2 = v2 - v0
    t = -v0
    q = np.cross(t, e1)
    n = np.cross(e1, e2)
    centroid = (v0 + v1 + v2) / 3.0
    sign = np.where(np.sum(n * centroid, axis=-1) < 0, -1.0, 1.0)
    n = n * sign[:, None]
    n = n / np.linalg.norm(n, axis=-1, keepdims=True)
    c_det = np.cross(e2, e1)
    # Face transitivity makes det degenerate with the argmax dot itself:
    # c_det = C * n̂ with ONE scalar C = 2*area > 0 for every face, and
    # q·e2 is a single positive per-face constant too. Folding 1/C into the
    # by/bz tables removes det/qe2 from the per-face selection entirely:
    #   det_ok  ⟺ |n̂·g| >= BARY_EPS / C
    #   k >= 0  ⟺ n̂·g > 0
    #   by = (c_by/C)·g / (n̂·g),  bz = (c_bz/C)·g / (n̂·g)
    c_scale = np.sum(c_det * n, axis=-1)  # (20,) ~= +-C (truncated-phi
    # GOLDEN_RATIO makes the solid minutely irregular; winding sets signs)
    assert np.allclose(np.abs(c_scale), np.abs(c_scale[0]), rtol=1e-5)
    qe2 = np.sum(q * e2, axis=-1)
    assert np.allclose(np.abs(qe2), np.abs(qe2[0]), rtol=1e-5)
    assert np.all(qe2 * np.sign(c_scale) > 0)  # k >= 0 iff det > 0
    return {
        "normals": n.astype(np.float32),
        "c_det": c_det.astype(np.float32),
        "c_by": np.cross(e2, t).astype(np.float32),
        "c_bz": q.astype(np.float32),
        "qe2": qe2.astype(np.float32),
        # argmax-degenerate forms (descriptor kernel v4): per-face exact
        # signed division, one global |det| threshold, packed vids + the
        # det-sign bit at bit 12.
        "c_by_n": (np.cross(e2, t) / c_scale[:, None]).astype(np.float32),
        "c_bz_n": (q / c_scale[:, None]).astype(np.float32),
        "c_scale": np.float32(np.median(np.abs(c_scale))),
        "vid_pack": np.array(
            [
                f[0] | (f[1] << 4) | (f[2] << 8)
                | ((1 << 12) if c_scale[k] > 0 else 0)
                for k, f in enumerate(TRI_IDX)
            ],
            np.int32,
        ),
    }


ARGMAX_CONST = argmax_face_constants()
