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


def sym_face_constants() -> dict | None:
    """Sign-symmetry decomposition of the 20-face argmax tables.

    The icosahedron's 20 outward normals are exactly (bitwise, in the f32
    tables) the images of 4 base directions under per-axis sign flips:
    one corner group of 8 faces (n ~ (c,c,c)) and three cyclic groups of 4
    (one zero component each). Consequently the argmax over 20 dots
    collapses to an argmax over 4 group maxima computed on |g|:

        max_{f in group m} n_f . g  =  sum_k |n_rep_k| * |g_k|

    bitwise equal to the winning face's ndot (products commute with sign
    flips exactly; adding the zero-component +-0 term is a no-op), and the
    winning face is recovered from (group, sign bits of g). The per-face
    barycentric constant vectors decompose the same way: each face's
    (c_by_n, c_bz_n) is a sign-pattern times one of THREE per-group base
    vectors {cb, cq, cr} (cr = the third bary numerator, role-permuted by
    the reference's winding-fix vertex swaps, build_mesh note) — verified
    bitwise below for all 20 faces; returns None (callers fall back to the
    20-way fold) if any face fails to decompose.

    Tables returned:
      reps (4,) int32, coef (4, 3) f32 = |n_rep| (zeros on unaligned),
      aligned (4, 3) bool, cands (4, 3, 3) f32 = [cb, cq, cr] per group,
      entry (4, 8) int32 = per (group, signbits) packed
        vid0 | vid1<<4 | vid2<<8 | role_by<<12 | role_bz<<14,
      signbits = (gx<0)<<2 | (gy<0)<<1 | (gz<0); unaligned bits ignored
      (entries duplicated over them). All faces verified det>0 (the
      winding fix makes every vid_pack sign bit 1), so k >= 0 iff best > 0.
    """
    import itertools

    N = ARGMAX_CONST["normals"]
    CB = ARGMAX_CONST["c_by_n"]
    CQ = ARGMAX_CONST["c_bz_n"]
    VPK = ARGMAX_CONST["vid_pack"]
    if not all((int(v) >> 12) & 1 for v in VPK):
        return None

    order: list[bytes] = []
    groups: dict[bytes, list[int]] = {}
    for i in range(ICOS_NFACES):
        k = np.abs(N[i]).tobytes()
        if k not in groups:
            order.append(k)
        groups.setdefault(k, []).append(i)
    if len(order) != 4:
        return None

    reps = np.zeros(4, np.int32)
    coef = np.zeros((4, 3), np.float32)
    aligned = np.zeros((4, 3), bool)
    cands = np.zeros((4, 3, 3), np.float32)
    entry = np.full((4, 8), -1, np.int32)

    for gi, key in enumerate(order):
        faces = groups[key]
        rep = faces[0]
        reps[gi] = rep
        coef[gi] = np.abs(N[rep])
        aligned[gi] = np.abs(N[rep]) != 0.0
        zidx = np.where(~aligned[gi])[0]
        cand = [CB[rep].copy(), CQ[rep].copy(), None]

        def sign_opts(f):
            sp0 = np.where(
                N[f] * N[rep] > 0, 1.0, np.where(N[f] * N[rep] < 0, -1.0, 1.0)
            ).astype(np.float32)
            for signs in itertools.product([1.0, -1.0], repeat=len(zidx)):
                s = sp0.copy()
                for j, zi in enumerate(zidx):
                    s[zi] = signs[j]
                yield s

        resolved: dict[int, tuple] = {}
        for _ in range(4):  # fixpoint: cr derivable after a partial match
            for f in faces:
                if f in resolved:
                    continue
                for s in sign_opts(f):
                    rb = rq = None
                    for r, c in enumerate(cand):
                        if c is None:
                            continue
                        if np.array_equal(CB[f], (s * c).astype(np.float32)):
                            rb = r
                        if np.array_equal(CQ[f], (s * c).astype(np.float32)):
                            rq = r
                    if rb is not None and rq is not None:
                        resolved[f] = (s, rb, rq)
                        break
                    if rb is not None and rq is None and cand[2] is None:
                        cand[2] = (s * CQ[f]).astype(np.float32)
                        resolved[f] = (s, rb, 2)
                        break
                    if rq is not None and rb is None and cand[2] is None:
                        cand[2] = (s * CB[f]).astype(np.float32)
                        resolved[f] = (s, 2, rq)
                        break
        if len(resolved) != len(faces):
            return None
        if cand[2] is None:
            cand[2] = np.zeros(3, np.float32)  # never role-selected
        cands[gi] = np.stack(cand)

        # unaligned components must never need a sign flip (h uses raw g)
        for f, (s, rb, rq) in resolved.items():
            if any(s[zi] != 1.0 for zi in zidx):
                return None

        # The runtime key is the sign of g itself, and the winning face is
        # the one whose OWN normal signs match sign(g) on aligned
        # components — so the entry key must be sigma_f = (N[f] < 0), not
        # the rep-relative pattern s = sigma_f * sigma_rep. Fold sigma_rep
        # into the candidate vectors (exact sign flips) so the runtime dot
        # h-vector is plain |g| on aligned components:
        #   cb_f . g = sum_k s_k cand_k g_k = sum_k (sigma_rep,k cand_k)
        #              * (sigma_f,k g_k) = cand'_k * |g_k|  (winner).
        srep = np.where(N[rep] < 0, np.float32(-1.0), np.float32(1.0))
        srep = np.where(aligned[gi], srep, np.float32(1.0))
        cands[gi] = (cands[gi] * srep[None, :]).astype(np.float32)

        # entry table over all 8 signbit keys; unaligned bits ignored
        for sb in range(8):
            bits = np.array([(sb >> 2) & 1, (sb >> 1) & 1, sb & 1])
            match = None
            for f, (s, rb, rq) in resolved.items():
                fb = (N[f] < 0).astype(int)
                if np.all(fb[aligned[gi]] == bits[aligned[gi]]):
                    match = (f, rb, rq)
                    break
            if match is None:
                return None
            f, rb, rq = match
            v = int(VPK[f])
            entry[gi, sb] = (v & 0xFFF) | (rb << 12) | (rq << 14)

    # full bitwise verification: reconstruct every face's tables from its
    # own-normal-sign key (sigma_f on aligned comps, +1 on unaligned)
    for gi in range(4):
        for f in groups[order[gi]]:
            sigf = np.where(N[f] < 0, np.float32(-1.0), np.float32(1.0))
            sigf = np.where(aligned[gi], sigf, np.float32(1.0))
            bits = (sigf < 0).astype(int)
            sb = (bits[0] << 2) | (bits[1] << 1) | bits[2]
            e = int(entry[gi, sb])
            rb, rq = (e >> 12) & 3, (e >> 14) & 3
            if not (
                (e & 0xFFF) == (int(VPK[f]) & 0xFFF)
                and np.array_equal(CB[f], (sigf * cands[gi, rb]).astype(np.float32))
                and np.array_equal(CQ[f], (sigf * cands[gi, rq]).astype(np.float32))
                and np.array_equal(np.abs(N[f]), coef[gi])
            ):
                return None

    return {
        "reps": reps, "coef": coef, "aligned": aligned,
        "cands": cands, "entry": entry,
    }


SYM_CONST = sym_face_constants()
