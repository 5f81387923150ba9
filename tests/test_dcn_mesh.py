"""DCN-aware hybrid mesh (SURVEY §2.3): dcn_data granules multiply the data
axis granule-major; model/expert axes stay within a granule (ICI-only)."""

import jax
import numpy as np
import pytest

from recommendations_tpu.core.mesh import MeshConfig, build_mesh


def test_explicit_dcn_data_splits_data_axis_granule_major():
    mesh = build_mesh(MeshConfig(data=-1, dcn_data=2))
    assert dict(mesh.shape) == {"data": 8, "model": 1, "expert": 1}
    ids = [d.id for d in mesh.devices.reshape(-1)]
    # granule 0 = devices 0..3 first, then granule 1 = devices 4..7
    assert ids == sorted(ids)


def test_dcn_with_model_axis_keeps_model_inside_granule():
    mesh = build_mesh(MeshConfig(data=-1, model=2, dcn_data=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2, "expert": 1}
    arr = mesh.devices  # (4, 2, 1)
    # every model pair must come from one granule (devices 0-3 vs 4-7)
    for row in arr.reshape(4, 2):
        g = {d.id // 4 for d in row}
        assert len(g) == 1, f"model pair spans granules: {[d.id for d in row]}"
    # data rows 0-1 from granule 0, rows 2-3 from granule 1
    row_granules = [arr[i, 0, 0].id // 4 for i in range(4)]
    assert row_granules == [0, 0, 1, 1]


def test_dcn_data_one_is_flat_mesh():
    flat = build_mesh(MeshConfig(data=-1, dcn_data=1))
    auto = build_mesh(MeshConfig(data=-1))  # single process → auto = flat
    assert dict(flat.shape) == dict(auto.shape) == {
        "data": 8, "model": 1, "expert": 1
    }


def test_dcn_indivisible_raises():
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(data=-1, dcn_data=3))
    with pytest.raises(ValueError):
        build_mesh(MeshConfig(data=4, dcn_data=8))


def test_dcn_mesh_runs_a_sharded_reduction():
    """Gradient-reduction shape: psum over the hybrid data axis works."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = build_mesh(MeshConfig(data=-1, dcn_data=2))
    x = np.arange(16, dtype=np.float64).reshape(8, 2)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    got = jax.jit(lambda a: jnp.sum(a, axis=0))(xs)
    np.testing.assert_allclose(np.asarray(got), x.sum(axis=0))
