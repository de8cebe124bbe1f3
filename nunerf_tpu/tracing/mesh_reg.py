"""Mesh regularizers and mesh-topology machinery.

Re-implementation of the reference ``Scene`` mesh-optimization extras
(``network/DiffRender.py``): the watertight edge table (init_edge :362-379),
the uniform Laplacian matrix (init_weightM :381-394), and the regularizer
energies — edge-length variance (edge_var :418-427), face-area variance
(area_var :429-442), dihedral-angle energy (dihedral_angle :444-462 region),
and the Laplacian smoothing hook (laplac_hook :464-467).

Topology is built once on host (numpy); the energies are pure JAX functions
of the vertex array, so they can regularize any vertex-optimization loop
under ``jit``/``grad``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MeshTopology(NamedTuple):
    edges: np.ndarray        # [E,2] unique undirected edges
    edge_faces: np.ndarray   # [E,2] the two faces sharing each edge (-1 pad)
    neighbors: np.ndarray    # [V,K] vertex one-ring (padded with self)
    neighbor_mask: np.ndarray  # [V,K] valid-neighbor mask
    tris: np.ndarray         # [F,3]


def build_topology(tris: np.ndarray, n_verts: int) -> MeshTopology:
    """Edge table + edge->face adjacency + one-rings (DiffRender.py:362-394)."""
    tris = np.asarray(tris, np.int64)
    raw = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]], 0)
    face_ids = np.tile(np.arange(len(tris)), 3)
    key = np.sort(raw, axis=1)
    uniq, inverse = np.unique(key, axis=0, return_inverse=True)

    edge_faces = np.full((len(uniq), 2), -1, np.int64)
    slot = np.zeros(len(uniq), np.int64)
    for e, f in zip(inverse, face_ids):
        if slot[e] < 2:
            edge_faces[e, slot[e]] = f
            slot[e] += 1

    # one-rings
    nbr_sets = [[] for _ in range(n_verts)]
    for a, b in uniq:
        nbr_sets[a].append(b)
        nbr_sets[b].append(a)
    k = max((len(s) for s in nbr_sets), default=1)
    neighbors = np.tile(np.arange(n_verts)[:, None], (1, k))
    mask = np.zeros((n_verts, k), bool)
    for v, s in enumerate(nbr_sets):
        neighbors[v, :len(s)] = s
        mask[v, :len(s)] = True
    return MeshTopology(edges=uniq.astype(np.int32),
                        edge_faces=edge_faces.astype(np.int32),
                        neighbors=neighbors.astype(np.int32),
                        neighbor_mask=mask,
                        tris=np.asarray(tris, np.int32))


def edge_length_variance(verts: jnp.ndarray, topo: MeshTopology) -> jnp.ndarray:
    """Variance of edge lengths (DiffRender.py:418-427)."""
    e = jnp.asarray(topo.edges)
    lengths = jnp.linalg.norm(verts[e[:, 0]] - verts[e[:, 1]], axis=-1)
    return jnp.var(lengths)


def face_area_variance(verts: jnp.ndarray, topo: MeshTopology) -> jnp.ndarray:
    """Variance of face areas (DiffRender.py:429-442)."""
    t = jnp.asarray(topo.tris)
    e1 = verts[t[:, 1]] - verts[t[:, 0]]
    e2 = verts[t[:, 2]] - verts[t[:, 0]]
    areas = 0.5 * jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)
    return jnp.var(areas)


def dihedral_angle_energy(verts: jnp.ndarray, topo: MeshTopology) -> jnp.ndarray:
    """Mean (1 - cos) of dihedral angles over interior edges — penalizes
    creases (DiffRender.py dihedral_angle)."""
    t = jnp.asarray(topo.tris)
    fn = jnp.cross(verts[t[:, 1]] - verts[t[:, 0]],
                   verts[t[:, 2]] - verts[t[:, 0]])
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    ef = jnp.asarray(topo.edge_faces)
    valid = (ef[:, 0] >= 0) & (ef[:, 1] >= 0)
    f0 = jnp.clip(ef[:, 0], 0, len(topo.tris) - 1)
    f1 = jnp.clip(ef[:, 1], 0, len(topo.tris) - 1)
    cos = jnp.sum(fn[f0] * fn[f1], axis=-1)
    return jnp.sum((1.0 - cos) * valid) / jnp.maximum(jnp.sum(valid), 1)


def laplacian_smooth(verts: jnp.ndarray, topo: MeshTopology) -> jnp.ndarray:
    """Uniform-Laplacian residual per vertex (DiffRender.py:381-394,464-467):
    v - mean(one-ring).  Returns [V,3]; its norm is the smoothing energy."""
    nb = jnp.asarray(topo.neighbors)
    m = jnp.asarray(topo.neighbor_mask, jnp.float32)[..., None]
    ring = verts[nb] * m
    mean = jnp.sum(ring, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-8)
    return verts - mean


def is_watertight(topo: MeshTopology) -> bool:
    return bool(np.all(topo.edge_faces >= 0))
