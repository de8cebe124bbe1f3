"""Host-side mesh operations: isosurface extraction, PLY IO, normals,
curvature, decimation.

Replaces the reference's mesh stack — PyMCubes (``network/field.py:1310-1317``),
trimesh/pymesh vertex attributes (``network/DiffRender.py:330-394``), and the
pymeshlab isotropic remesh (``extract_mesh_stage1.py:46-50``) — with the
native C++ ``meshops`` library (ctypes) plus numpy fallbacks.
"""

from __future__ import annotations

import ctypes
from typing import Callable, Tuple

import numpy as np

from nunerf_tpu.native.build import get_lib


# ---------------------------------------------------------------------------
# Isosurface extraction
# ---------------------------------------------------------------------------

def _extract_native(grid: np.ndarray, iso: float):
    lib = get_lib()
    if lib is None:
        return None
    from ctypes import POINTER, byref, c_float, c_int32, c_int64
    grid = np.ascontiguousarray(grid, np.float32)
    vp = POINTER(c_float)()
    tp = POINTER(c_int32)()
    nv = c_int64()
    nt = c_int64()
    lib.extract_isosurface(
        grid.ctypes.data_as(POINTER(c_float)), grid.shape[0], grid.shape[1],
        grid.shape[2], c_float(iso), byref(vp), byref(nv), byref(tp), byref(nt))
    nv, nt = nv.value, nt.value
    verts = np.ctypeslib.as_array(vp, shape=(nv, 3)).copy() if nv else np.zeros((0, 3), np.float32)
    tris = np.ctypeslib.as_array(tp, shape=(nt, 3)).copy() if nt else np.zeros((0, 3), np.int32)
    lib.meshops_free(vp)
    lib.meshops_free(tp)
    return verts, tris


def marching_tetrahedra_np(grid: np.ndarray, iso: float):
    """Pure-numpy fallback isosurface extractor (slow; for tests/fallback).

    Returns per-triangle soup deduplicated by coordinates.
    """
    # simple scalar implementation via the native algorithm's logic is too
    # slow in python loops; use a vectorized variant over crossing cubes.
    from itertools import product
    nx, ny, nz = grid.shape
    # Identify crossing cubes
    sign = grid < iso
    cs = np.zeros((nx - 1, ny - 1, nz - 1), bool)
    any_in = np.zeros_like(cs)
    all_in = np.ones_like(cs)
    for dx, dy, dz in product((0, 1), repeat=3):
        s = sign[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
        any_in |= s
        all_in &= s
    cs = any_in & ~all_in
    idxs = np.argwhere(cs)

    verts_list = []
    tris_list = []
    # face-consistent 6-tet path decomposition around diagonal 0-7 (matches
    # the native extractor)
    TETS = [(0, 1, 3, 7), (0, 5, 1, 7), (0, 3, 2, 7),
            (0, 2, 6, 7), (0, 4, 5, 7), (0, 6, 4, 7)]
    C = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
         (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]

    def interp(pa, pb, va, vb):
        t = np.clip((iso - va) / (vb - va), 0, 1)
        return pa + t * (pb - pa)

    vcount = 0
    for (x, y, z) in idxs:
        cp = [np.array([x + c[0], y + c[1], z + c[2]], np.float32) for c in C]
        cv = [grid[x + c[0], y + c[1], z + c[2]] for c in C]
        for T in TETS:
            inside = [k for k in range(4) if cv[T[k]] < iso]
            outside = [k for k in range(4) if cv[T[k]] >= iso]
            if len(inside) in (0, 4):
                continue
            ref = (np.mean([cp[T[k]] for k in outside], 0)
                   - np.mean([cp[T[k]] for k in inside], 0))

            def emit(p0, p1, p2):
                nonlocal vcount
                n = np.cross(p1 - p0, p2 - p0)
                if np.dot(n, ref) < 0:
                    p1, p2 = p2, p1
                verts_list.extend([p0, p1, p2])
                tris_list.append([vcount, vcount + 1, vcount + 2])
                vcount += 3

            if len(inside) == 1:
                a = inside[0]
                pts = [interp(cp[T[a]], cp[T[b]], cv[T[a]], cv[T[b]])
                       for b in outside]
                emit(*pts)
            elif len(inside) == 3:
                b = outside[0]
                pts = [interp(cp[T[a]], cp[T[b]], cv[T[a]], cv[T[b]])
                       for a in inside]
                emit(*pts)
            else:  # 2-2: quad
                a, b = inside
                c, d = outside
                q0 = interp(cp[T[a]], cp[T[c]], cv[T[a]], cv[T[c]])
                q1 = interp(cp[T[a]], cp[T[d]], cv[T[a]], cv[T[d]])
                q2 = interp(cp[T[b]], cp[T[d]], cv[T[b]], cv[T[d]])
                q3 = interp(cp[T[b]], cp[T[c]], cv[T[b]], cv[T[c]])
                emit(q0, q1, q2)
                emit(q0, q2, q3)

    if not verts_list:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    verts = np.stack(verts_list, 0)
    tris = np.asarray(tris_list, np.int32)
    verts, tris = dedup_vertices(verts, tris)
    return verts, tris


def dedup_vertices(verts: np.ndarray, tris: np.ndarray, decimals: int = 5):
    key = np.round(verts, decimals)
    uniq, inverse = np.unique(key, axis=0, return_inverse=True)
    new_tris = inverse[tris].astype(np.int32)
    good = ((new_tris[:, 0] != new_tris[:, 1])
            & (new_tris[:, 1] != new_tris[:, 2])
            & (new_tris[:, 0] != new_tris[:, 2]))
    return uniq.astype(np.float32), new_tris[good]


def extract_fields(query_fn: Callable[[np.ndarray], np.ndarray],
                   resolution: int, bound: float = 1.0,
                   outside_val: float = 1.0, batch: int = 64) -> np.ndarray:
    """Chunked SDF grid evaluation (field.py:1286-1307): outside-unit-sphere
    points are set to ``outside_val``."""
    xs = np.linspace(-bound, bound, resolution, dtype=np.float32)
    grid = np.empty((resolution,) * 3, np.float32)
    for i0 in range(0, resolution, batch):
        xi = xs[i0:i0 + batch]
        xx, yy, zz = np.meshgrid(xi, xs, xs, indexing="ij")
        pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
        vals = np.asarray(query_fn(pts)).reshape(-1)
        outside = np.linalg.norm(pts, axis=-1) >= 1.0
        vals = np.where(outside, outside_val, vals)
        grid[i0:i0 + len(xi)] = vals.reshape(len(xi), resolution, resolution)
    return grid


def extract_geometry(query_fn, resolution: int = 512, bound: float = 1.0,
                     threshold: float = 0.0, outside_val: float = 1.0,
                     slab: int = 128):
    """Grid-evaluate + extract the isosurface, processing z-slabs to bound
    memory at high resolutions (the reference runs res 1024,
    extract_mesh_stage1.py:56).  Returns (verts [V,3] world coords, tris)."""
    xs = np.linspace(-bound, bound, resolution, dtype=np.float32)
    all_verts, all_tris = [], []
    voff = 0
    for i0 in range(0, resolution - 1, slab - 1):
        i1 = min(i0 + slab, resolution)
        xi = xs[i0:i1]
        xx, yy, zz = np.meshgrid(xi, xs, xs, indexing="ij")
        pts = np.stack([xx, yy, zz], -1).reshape(-1, 3)
        vals = np.asarray(query_fn(pts)).reshape(-1)
        outside = np.linalg.norm(pts, axis=-1) >= 1.0
        vals = np.where(outside, outside_val, vals).astype(np.float32)
        grid = vals.reshape(len(xi), resolution, resolution)

        res = _extract_native(grid, threshold)
        if res is None:
            res = marching_tetrahedra_np(grid, threshold)
        verts, tris = res
        if len(verts) == 0:
            continue
        verts = verts.copy()
        verts[:, 0] += i0  # slab offset in index space
        all_verts.append(verts)
        all_tris.append(tris + voff)
        voff += len(verts)
        if i1 == resolution:
            break

    if not all_verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    verts = np.concatenate(all_verts, 0)
    tris = np.concatenate(all_tris, 0)
    verts, tris = dedup_vertices(verts, tris)
    # index space -> world
    verts = verts / (resolution - 1.0) * 2.0 * bound - bound
    return verts.astype(np.float32), tris


# ---------------------------------------------------------------------------
# Normals / curvature / remesh
# ---------------------------------------------------------------------------

def vertex_normals_curvature(verts: np.ndarray, tris: np.ndarray):
    """Angle-weighted vertex normals + angle-defect Gaussian curvature
    (replaces DiffRender.py:342-360 trimesh/pymesh attributes).  Curvature is
    clipped to +-10 like the reference (DiffRender.py:360)."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    if lib is not None:
        from ctypes import POINTER, c_float, c_int32
        normals = np.zeros_like(verts)
        curv = np.zeros(len(verts), np.float32)
        lib.vertex_normals_curvature(
            verts.ctypes.data_as(POINTER(c_float)), len(verts),
            tris.ctypes.data_as(POINTER(c_int32)), len(tris),
            normals.ctypes.data_as(POINTER(c_float)),
            curv.ctypes.data_as(POINTER(c_float)))
        return normals, np.clip(curv, -10.0, 10.0)

    # numpy fallback
    e01 = verts[tris[:, 1]] - verts[tris[:, 0]]
    e02 = verts[tris[:, 2]] - verts[tris[:, 0]]
    e12 = verts[tris[:, 2]] - verts[tris[:, 1]]
    fn = np.cross(e01, e02)
    fl = np.linalg.norm(fn, axis=-1, keepdims=True)
    area = 0.5 * fl[:, 0]
    fn = fn / np.maximum(fl, 1e-20)

    def ang(a, b):
        cosv = np.sum(a * b, -1) / np.maximum(
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-20)
        return np.arccos(np.clip(cosv, -1, 1))

    a0 = ang(e01, e02)
    a1 = ang(-e01, e12)
    a2 = np.pi - a0 - a1
    normals = np.zeros_like(verts)
    angle_sum = np.zeros(len(verts))
    area_sum = np.zeros(len(verts))
    for k, a in ((0, a0), (1, a1), (2, a2)):
        np.add.at(normals, tris[:, k], fn * a[:, None])
        np.add.at(angle_sum, tris[:, k], a)
        np.add.at(area_sum, tris[:, k], area / 3)
    normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-20)
    curv = np.where(area_sum > 1e-12, (2 * np.pi - angle_sum) / np.maximum(area_sum, 1e-12), 0.0)
    return normals.astype(np.float32), np.clip(curv, -10, 10).astype(np.float32)


def smooth_vertex_scalar(values: np.ndarray, tris: np.ndarray,
                         iters: int = 10) -> np.ndarray:
    """Jacobi-average a per-vertex scalar over 1-ring neighborhoods.

    Per-vertex angle-defect curvature is hyper-sensitive to triangulation
    noise: on a marched+remeshed sphere whose true Gaussian curvature is a
    constant +4, the raw estimate railed at the +-10 clips with 55% of
    vertices NEGATIVE (measured round 4, nested_shell mesh) — and the
    curvature-shell refraction (stage2_shell.py) branches on that sign, so
    the shell crossing was noise and training shut the shell off
    (thickness -> 0).  Diffusing the field recovers the smooth underlying
    curvature the physics needs."""
    n = len(values)
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]],
                        tris[:, [1, 0]], tris[:, [2, 1]], tris[:, [0, 2]]], 0)
    src, dst = e[:, 0], e[:, 1]
    deg = np.bincount(src, minlength=n).astype(np.float64) + 1.0
    v = values.astype(np.float64).copy()
    for _ in range(iters):
        s = v.copy()  # include self
        np.add.at(s, src, v[dst])
        v = s / deg
    return v.astype(np.float32)


def isotropic_remesh(verts: np.ndarray, tris: np.ndarray,
                     target_edge: float = 0.01):
    """Uniform decimation by grid vertex clustering — stands in for the
    pymeshlab isotropic remesh of ``extract_mesh_stage1.py:46-50``."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, np.float32)
    tris = np.ascontiguousarray(tris, np.int32)
    if lib is not None and len(verts):
        from ctypes import POINTER, byref, c_float, c_int32, c_int64
        vp = POINTER(c_float)()
        tp = POINTER(c_int32)()
        nv = c_int64()
        nt = c_int64()
        lib.cluster_remesh(
            verts.ctypes.data_as(POINTER(c_float)), len(verts),
            tris.ctypes.data_as(POINTER(c_int32)), len(tris),
            c_float(target_edge), byref(vp), byref(nv), byref(tp), byref(nt))
        nv, nt = nv.value, nt.value
        out_v = np.ctypeslib.as_array(vp, shape=(nv, 3)).copy()
        out_t = np.ctypeslib.as_array(tp, shape=(nt, 3)).copy()
        lib.meshops_free(vp)
        lib.meshops_free(tp)
        return out_v, out_t
    # numpy fallback: snap to grid
    key = np.round(verts / target_edge).astype(np.int64)
    uniq, inverse = np.unique(key, axis=0, return_inverse=True)
    pos = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq))
    np.add.at(pos, inverse, verts)
    np.add.at(cnt, inverse, 1)
    pos /= cnt[:, None]
    new_tris = inverse[tris].astype(np.int32)
    good = ((new_tris[:, 0] != new_tris[:, 1])
            & (new_tris[:, 1] != new_tris[:, 2])
            & (new_tris[:, 0] != new_tris[:, 2]))
    return pos.astype(np.float32), new_tris[good]


# ---------------------------------------------------------------------------
# PLY IO (binary little-endian + ascii read)
# ---------------------------------------------------------------------------

def save_ply(path: str, verts: np.ndarray, tris: np.ndarray):
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(tris)}\n"
        "property list uchar int vertex_indices\nend_header\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(verts.astype("<f4").tobytes())
        face = np.empty(len(tris), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        face["n"] = 3
        face["idx"] = tris
        f.write(face.tobytes())


def load_ply(path: str):
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            line = f.readline()
            if not line:
                raise ValueError(f"bad ply header in {path}")
            header += line
        text = header.decode()
        lines = text.strip().split("\n")
        fmt = [l for l in lines if l.startswith("format")][0].split()[1]
        nv = int([l for l in lines if l.startswith("element vertex")][0].split()[2])
        nf = int([l for l in lines if l.startswith("element face")][0].split()[2])
        # count vertex properties (assume all float32 scalars)
        vprops = []
        in_vertex = False
        for l in lines:
            if l.startswith("element vertex"):
                in_vertex = True
                continue
            if l.startswith("element"):
                in_vertex = False
            if in_vertex and l.startswith("property"):
                vprops.append(l.split()[-1])

        if fmt == "binary_little_endian":
            vdata = np.frombuffer(f.read(nv * 4 * len(vprops)), "<f4")
            vdata = vdata.reshape(nv, len(vprops))
            verts = vdata[:, :3].astype(np.float32)
            tris = np.empty((nf, 3), np.int32)
            face_dtype = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
            fdata = np.frombuffer(f.read(nf * face_dtype.itemsize), face_dtype)
            tris = fdata["idx"].astype(np.int32)
        elif fmt == "ascii":
            verts = np.zeros((nv, 3), np.float32)
            for i in range(nv):
                verts[i] = [float(x) for x in f.readline().split()[:3]]
            tris = np.zeros((nf, 3), np.int32)
            for i in range(nf):
                parts = f.readline().split()
                tris[i] = [int(x) for x in parts[1:4]]
        else:
            raise NotImplementedError(fmt)
    return verts, tris
