"""IO tests: OBJ parsing, sidecars, PLY round-trip, material loaders."""

import os
import textwrap

import numpy as np

from lidar_brdf_tpu.io import materials as mats
from lidar_brdf_tpu.io import obj as obj_mod
from lidar_brdf_tpu.io import ply as ply_mod
from lidar_brdf_tpu.io import synthetic
from lidar_brdf_tpu.core.config import ASPRSClass


OBJ_TEXT = """
# test scene
o ground_floor
v -1 0 -1
v 1 0 -1
v 1 0 1
v -1 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 1 0
f 1/1/1 2/2/1 3/3/1 4/4/1
o water_pool
v -0.5 0.1 -0.5
v 0.5 0.1 -0.5
v 0.0 0.1 0.5
f 5 6 7
"""


def test_parse_obj_quads_and_components(tmp_path):
    p = tmp_path / "scene.obj"
    p.write_text(OBJ_TEXT)
    comps = obj_mod.parse_obj(str(p))
    assert len(comps) == 2
    assert comps[0].name == "ground_floor"
    assert len(comps[0].faces) == 2          # quad fanned into 2 tris
    assert len(comps[1].faces) == 1
    assert comps[0].uvs.shape[1] == 2


def test_scene_semantics_from_names(tmp_path):
    p = tmp_path / "scene.obj"
    p.write_text(OBJ_TEXT)
    scene = obj_mod.load_obj_scene(str(p), use_cache=False)
    asprs = np.asarray(scene.comp_asprs)
    surf = np.asarray(scene.comp_surface)
    assert asprs[0] == int(ASPRSClass.GROUND)
    assert asprs[1] == int(ASPRSClass.WATER)
    assert surf[0] & 1          # terrain bit
    assert surf[1] & 2          # water bit


def test_sidecar_override(tmp_path):
    p = tmp_path / "scene.obj"
    p.write_text(OBJ_TEXT)
    (tmp_path / "scene.LiDARMaterial").write_text(
        "ground WOOD\nwater CRYSTAL_GLASS\n")
    scene = obj_mod.load_obj_scene(str(p), use_cache=False)
    mat = np.asarray(scene.comp_material)
    assert mat[0] == mats.MATERIAL_ID["WOOD"]
    assert mat[1] == mats.MATERIAL_ID["CRYSTAL_GLASS"]


def test_obj_cache_roundtrip(tmp_path):
    p = tmp_path / "scene.obj"
    p.write_text(OBJ_TEXT)
    s1 = obj_mod.load_obj_scene(str(p))
    assert os.path.exists(str(p) + obj_mod.CACHE_SUFFIX)
    s2 = obj_mod.load_obj_scene(str(p))
    np.testing.assert_array_equal(np.asarray(s1.vertices),
                                  np.asarray(s2.vertices))
    np.testing.assert_array_equal(np.asarray(s1.comp_material),
                                  np.asarray(s2.comp_material))


def test_ply_roundtrip(rng, tmp_path):
    from lidar_brdf_tpu.api import simulate
    from lidar_brdf_tpu.core.config import SensorConfig, LiDARType, ShadingMode
    scene = synthetic.terrain_with_boxes(rng, num_boxes=2)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 8.0, 0.0),
        tls_resolution_horizontal=24, tls_resolution_vertical=12,
        tls_fov_vertical=80.0, tls_middle_angle_vertical=-40.0,
        rays_per_pulse=1, max_returns=1, chunk_pulses=512,
        shading_mode=ShadingMode.LAMBERTIAN,
        include_shiny_surface_error=False)
    cloud = simulate(scene, cfg)
    out = tmp_path / "cloud.ply"
    n = ply_mod.write_ply(str(out), cloud)
    assert n == int(np.asarray(cloud.mask).sum())
    back = ply_mod.read_ply(str(out))
    compact = cloud.compact_host()
    np.testing.assert_allclose(back["x"], np.asarray(compact.position)[:, 0],
                               rtol=1e-6)
    np.testing.assert_allclose(back["intensity"],
                               np.asarray(compact.intensity), rtol=1e-6)
    assert (back["numReturns"] >= 1).all()


def test_refractive_index_parser(tmp_path):
    # micrometer-style file (reference WATER.txt format)
    p = tmp_path / "WATER.txt"
    p.write_text("wl\tn\n0.200\t1.396\n1.000\t1.327\n2.000\t1.300\n")
    rows = mats.parse_refractive_index_file(str(p))
    wl = [r[0] for r in rows]
    assert min(wl) == 200.0 and max(wl) == 2000.0
    n = mats.refractive_index_at(rows, 1000.0)
    assert abs(n - 1.327) < 1e-6
    # nanometer-style with k column (reference LEAF.txt format)
    p2 = tmp_path / "LEAF.txt"
    p2.write_text("Wavelength(nm)\tn\tk\n380\t1.4897\t0\n1000\t1.40\t0\n")
    rows2 = mats.parse_refractive_index_file(str(p2))
    assert rows2[0][0] == 380.0
    assert abs(mats.refractive_index_at(rows2, 1000.0) - 1.40) < 1e-6


def test_material_library_tables():
    lib = mats.MaterialLibrary.default()
    table = lib.table_at(1064)
    assert table.brdf_table.shape == (mats.NUM_MATERIALS, 360, 91)
    assert (table.brdf_table >= 0).all() and (table.brdf_table <= 1).all()
    water = mats.MATERIAL_ID["WATER"]
    assert abs(float(table.refractive_index[water]) - 1.324) < 0.01
    # wavelength dependence
    t2 = lib.table_at(532)
    assert float(t2.refractive_index[water]) > float(
        table.refractive_index[water])


def test_match_keyword_longest_wins():
    m = {"wood": "WOOD", "dark_wood": "DARK_WOOD"}
    assert mats.match_keyword("my_dark_wood_table", m) == "DARK_WOOD"
    assert mats.match_keyword("woodwork", m) == "WOOD"
    assert mats.match_keyword("metal", m) is None


def test_bundled_spectra_ship_full_resolution():
    """The packaged dataset (data/refractive_index.npz) provides the 17
    full public optical-constant tables the reference redistributes."""
    bundled = mats.bundled_spectra()
    assert len(bundled) == 17
    # full tables, not the 2-5 point fallback sketches
    assert len(bundled["WATER"]) > 100
    assert len(bundled["GOLD"]) >= 200
    # default() consumes them
    lib = mats.MaterialLibrary.default()
    water = mats.MATERIAL_ID["WATER"]
    assert len(lib.spectra[water]) > 100
    t = lib.table_at(1064)
    assert abs(float(t.refractive_index[water]) - 1.324) < 0.004
    gold = mats.MATERIAL_ID["GOLD"]
    assert float(t.refractive_index[gold]) < 1.0   # Au n(1064nm) ~ 0.26
    air = mats.MATERIAL_ID["AIR"]
    assert abs(float(t.refractive_index[air]) - 1.0003) < 5e-4


def test_async_ply_writer(rng, tmp_path):
    """AsyncPlyWriter produces byte-identical files to write_ply, joins all
    pending writes on close, and propagates writer errors."""
    import pytest

    from lidar_brdf_tpu.api import simulate
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode)
    scene = synthetic.terrain_with_boxes(rng, num_boxes=1)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 8.0, 0.0),
        tls_resolution_horizontal=16, tls_resolution_vertical=8,
        tls_fov_vertical=80.0, tls_middle_angle_vertical=-40.0,
        rays_per_pulse=1, max_returns=1, chunk_pulses=128,
        shading_mode=ShadingMode.LAMBERTIAN,
        include_shiny_surface_error=False)
    cloud = simulate(scene, cfg)
    n_sync = ply_mod.write_ply(str(tmp_path / "sync.ply"), cloud)
    with ply_mod.AsyncPlyWriter() as w:
        f0 = w.submit(str(tmp_path / "async0.ply"), cloud)
        w.submit(str(tmp_path / "async1.ply"), cloud)
        counts = w.join()
    assert counts == [n_sync, n_sync] and f0.result() == n_sync
    assert (tmp_path / "sync.ply").read_bytes() == \
        (tmp_path / "async0.ply").read_bytes()
    # error propagation: unwritable path surfaces at join()
    w2 = ply_mod.AsyncPlyWriter()
    w2.submit(str(tmp_path / "no_such_dir" / "x.ply"), cloud)
    with pytest.raises(OSError):
        w2.join()
    w2._pool.shutdown(wait=False)


def test_simulate_tls_path_writes_per_waypoint(rng, tmp_path):
    """simulate_tls_path(out_dir=...) dumps <i>.ply per waypoint on the
    background writer (reference Results/Paths/TLS/<i>.ply,
    LiDARPointCloud.cpp:56-61)."""
    from lidar_brdf_tpu.api import simulate_tls_path
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode)
    scene = synthetic.terrain_with_boxes(rng, num_boxes=1)
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        tls_position=(0.0, 8.0, 0.0),
        tls_resolution_horizontal=16, tls_resolution_vertical=8,
        tls_fov_vertical=80.0, tls_middle_angle_vertical=-40.0,
        rays_per_pulse=1, max_returns=1, chunk_pulses=128,
        shading_mode=ShadingMode.LAMBERTIAN,
        include_shiny_surface_error=False)
    positions = np.array([[0, 8, 0], [4, 8, 0], [4, 8, 4]], np.float32)
    out = tmp_path / "paths"
    clouds = simulate_tls_path(scene, cfg, positions, out_dir=str(out))
    assert len(clouds) == 3
    for i, cloud in enumerate(clouds):
        back = ply_mod.read_ply(str(out / f"{i}.ply"))
        assert len(back["x"]) == int(np.asarray(cloud.mask).sum())
