"""On-device ray synthesis must reproduce the host-side batch constructors
exactly, for both camera conventions."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.scene_utils import make_test_scene
from nunerf_tpu.data.database import get_database_split, parse_database_name
from nunerf_tpu.data.device_rays import (build_compact_store, num_rays,
                                         sample_rays)
from nunerf_tpu.data.ray_store import (build_imgs_info,
                                       construct_nerf_ray_batch,
                                       construct_ray_batch)


@pytest.fixture(scope="module")
def info(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    make_test_scene(str(root / "tiny_sphere"), h=20, w=24)
    db = parse_database_name("nerf/tiny_sphere", str(root))
    train_ids, _ = get_database_split(db)
    return build_imgs_info(db, train_ids, with_mask=True)


def _check(batch_ref, store, idx):
    sampled = sample_rays(store, jnp.asarray(idx))
    assert set(sampled) == set(batch_ref)
    for k in batch_ref:
        np.testing.assert_allclose(
            np.asarray(sampled[k]), batch_ref[k][idx],
            atol=1e-5, err_msg=k)


def test_nerf_convention_matches(info):
    batch, h, w = construct_nerf_ray_batch(info)
    store = build_compact_store(info, is_nerf=True)
    assert num_rays(store) == batch["rays_o"].shape[0]
    # uint8 pixel storage is exact for uint8-sourced images
    assert store["rgbs"].dtype == np.uint8
    rs = np.random.RandomState(0)
    idx = rs.randint(0, num_rays(store), 257)
    _check(batch, store, idx)


def test_nero_convention_matches(info):
    # reinterpret the poses as w2c to exercise the NeRO path on real data
    batch, h, w = construct_ray_batch(info)
    store = build_compact_store(info, is_nerf=False)
    rs = np.random.RandomState(1)
    idx = rs.randint(0, num_rays(store), 257)
    _check(batch, store, idx)


def test_nero_fixed_camera_human_poses(info):
    batch, _, _ = construct_ray_batch(info, fixed_camera=True)
    store = build_compact_store(info, is_nerf=False, fixed_camera=True)
    idx = np.arange(0, num_rays(store), 97)
    _check(batch, store, idx)
