"""Outer-surface extraction filter for stage-1 meshes.

Stage-1's deliverable is the OUTER transparent surface, but on hollow-glass
scenes the photometric optimum also places SDF zero level on the interior
object (through thin glass the inner object is sharply visible and the thin
shell bends light little), so marching the full zero level yields a mesh
that is mostly interior junk (round-4 measurement: 68% of vertices far
inside the true surface despite stage-1 PSNR 25.9).  The reference sidesteps
this only by scene curation; its stage-2 assumes the mesh IS the outer
surface (network/renderer.py:992-998).

This filter recovers the outer surface geometrically:

1. drop connected components with < ``min_area_frac`` of total area
   (kills floaters that would occlude pass 2);
2. keep faces whose centroid is the FIRST hit from at least one of
   ``n_views`` exterior viewpoints (Fibonacci sphere at ``radius``) — the
   on-chip intersector makes this a few million rays, seconds on TPU;
3. drop leftover components < ``min_area_frac_final`` of the largest.
"""

from __future__ import annotations

import numpy as np


def face_components(tris: np.ndarray) -> np.ndarray:
    """Connected-component label per face (faces adjacent = shared edge).
    Pure-numpy union-find."""
    n = len(tris)
    parent = np.arange(n)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    # map each undirected edge to the faces using it
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                            tris[:, [2, 0]]], axis=0)
    edges = np.sort(edges, axis=1)
    face_ids = np.tile(np.arange(n), 3)
    key = edges[:, 0].astype(np.int64) * (tris.max() + 1) + edges[:, 1]
    order = np.argsort(key, kind="stable")
    key_s, face_s = key[order], face_ids[order]
    same = key_s[1:] == key_s[:-1]
    for a, b in zip(face_s[:-1][same], face_s[1:][same]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    return np.array([find(i) for i in range(n)])


def _face_areas(verts, tris):
    p = verts[tris]
    return 0.5 * np.linalg.norm(
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]), axis=-1)


def _fibonacci_sphere(n):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(phi)], -1)


def drop_small_components(verts, tris, min_area_frac):
    labels = face_components(tris)
    areas = _face_areas(verts, tris)
    total = areas.sum()
    keep = np.zeros(len(tris), bool)
    for lab in np.unique(labels):
        m = labels == lab
        if areas[m].sum() >= min_area_frac * total:
            keep[m] = True
    return keep


def visible_faces(verts, tris, n_views=64, radius=2.0, chunk=65536):
    """Boolean per-face mask: centroid is the first intersector hit from at
    least one exterior viewpoint."""
    import jax.numpy as jnp
    from nunerf_tpu.tracing.scene import Scene

    scene = Scene((verts, tris))
    centers = verts[tris].mean(1).astype(np.float32)
    nf = len(centers)
    views = (_fibonacci_sphere(n_views) * radius).astype(np.float32)
    keep = np.zeros(nf, bool)
    for v in views:
        d = centers - v[None, :]
        d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-12
        o = np.broadcast_to(v[None, :], d.shape).astype(np.float32)
        for i0 in range(0, nf, chunk):
            sl = slice(i0, min(i0 + chunk, nf))
            res = scene.dintersect(jnp.asarray(o[sl]), jnp.asarray(d[sl]))
            hit = np.asarray(res["hit"])
            tri_idx = np.asarray(res["tri_idx"])
            first = hit & (tri_idx == np.arange(i0, sl.stop))
            keep[sl] |= first
    return keep


def filter_outer(verts, tris, n_views=64, radius=2.0,
                 min_area_frac=0.01, min_area_frac_final=0.05):
    """Returns the filtered (verts, tris) + stats dict."""
    keep0 = drop_small_components(verts, tris, min_area_frac)
    t1 = tris[keep0]
    keep1 = visible_faces(verts, t1, n_views=n_views, radius=radius)
    t2 = t1[keep1]
    labels = face_components(t2)
    areas = _face_areas(verts, t2)
    best = 0.0
    sizes = {}
    for lab in np.unique(labels):
        sizes[lab] = areas[labels == lab].sum()
        best = max(best, sizes[lab])
    keep2 = np.array([sizes[l] >= min_area_frac_final * best for l in labels])
    t3 = t2[keep2]
    used = np.unique(t3)
    remap = np.full(len(verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    stats = {"faces_in": int(len(tris)), "after_floaters": int(len(t1)),
             "after_visibility": int(len(t2)), "faces_out": int(len(t3)),
             "verts_out": int(len(used))}
    return verts[used], remap[t3], stats


def taubin_smooth(verts, tris, iters=20, lam=0.5, mu=-0.53):
    """Taubin lambda/mu smoothing (volume-preserving, unlike plain
    Laplacian).  The extracted glass surface is physically smooth; marching
    noise feeds straight into the shell mode's angle-defect curvature
    (r = 1/sqrt|K|, stage2_shell.py), so smoothing the outer mesh stabilizes
    the refraction geometry."""
    v = verts.astype(np.float64).copy()
    n = len(v)
    # uniform-weight vertex adjacency
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]],
                        tris[:, [1, 0]], tris[:, [2, 1]], tris[:, [0, 2]]], 0)
    order = np.argsort(e[:, 0], kind="stable")
    src, dst = e[order, 0], e[order, 1]
    deg = np.bincount(src, minlength=n)[:, None].astype(np.float64)
    deg = np.maximum(deg, 1.0)

    def lap(x):
        s = np.zeros_like(x)
        np.add.at(s, src, x[dst])
        return s / deg - x

    for _ in range(iters):
        v = v + lam * lap(v)
        v = v + mu * lap(v)
    return v.astype(np.float32)


def convex_hull_mesh(verts):
    """Convex hull of a vertex set as a (verts, tris) mesh.

    Round-5 bootstrap mask prior (net-new vs the reference): an unmasked
    stage-1 pass on a transparent container reconstructs the inner object
    plus outer-surface FRAGMENTS (specular rims), so its rendered silhouette
    under-covers the true outline (measured 49% GT coverage on the synthetic
    capture) — but the fragments SPAN the object, so the visual hull of the
    reconstruction bounds it.  Glass containers (NU-NeRF's domain) have
    near-convex outer surfaces, making the hull silhouette a sound acc
    target for the mask-supervised second pass.
    """
    import numpy as np
    from scipy.spatial import ConvexHull

    hull = ConvexHull(np.asarray(verts, np.float64))
    v = np.asarray(verts, np.float32)[hull.vertices]
    remap = np.full(len(verts), -1, np.int64)
    remap[hull.vertices] = np.arange(len(hull.vertices))
    tris = remap[hull.simplices].astype(np.int32)
    # orient faces outward (qhull simplices are unordered): flip any face
    # whose normal points toward the hull centroid
    c = v.mean(0)
    n = np.cross(v[tris[:, 1]] - v[tris[:, 0]], v[tris[:, 2]] - v[tris[:, 0]])
    inward = np.sum(n * (v[tris].mean(1) - c), -1) < 0
    tris[inward] = tris[inward][:, ::-1]
    return v, tris


def density_filtered_hull(points, k: int = 5, thresh: float = 2.0):
    """Convex hull of the density-filtered point set.

    COLMAP object clouds carry sparse outlier halos (the reference's own
    normalization tolerates them by construction, database.py:387-391 takes
    the max-radius point as scale); a raw hull of the cloud therefore
    over-covers the object (measured +38% silhouette area on the synthetic
    capture).  Points whose k-th-NN distance exceeds ``thresh`` x the median
    are dropped first — surface features are dense, halo noise is not
    (measured: exactly separates the two on the synthetic capture, final
    silhouette IoU 0.997 vs GT).
    """
    import numpy as np
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float32)
    dk = cKDTree(pts).query(pts, k=k + 1)[0][:, k]
    keep = dk < thresh * np.median(dk)
    return convex_hull_mesh(pts[keep])
