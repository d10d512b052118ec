"""RGL/EPFL measured-BRDF ingestion (powitacq-equivalent path)."""

import numpy as np
import pytest

from lidar_brdf_tpu.io import rgl_bsdf as R


def test_tensor_file_roundtrip(tmp_path):
    path = str(tmp_path / "t.bsdf")
    fields = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.array([7], np.uint8),
        "c": np.linspace(0, 1, 5).astype(np.float64),
    }
    R.write_tensor_file(path, fields)
    out = R.read_tensor_file(path)
    assert set(out) == set(fields)
    for k in fields:
        assert out[k].dtype == fields[k].dtype
        np.testing.assert_array_equal(out[k], fields[k])


def test_marginal2d_eval_bilinear():
    data = np.array([[0.0, 1.0], [2.0, 3.0]])
    m = R.Marginal2D(data, normalize=False, build_cdf=False)
    pos = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                    [1.0, 1.0], [0.5, 0.5]])
    np.testing.assert_allclose(m.eval(pos), [0, 1, 2, 3, 1.5])


def test_marginal2d_invert_uniform_is_identity():
    # a constant density's CDF inversion maps position -> same position
    m = R.Marginal2D(np.ones((8, 8)), build_cdf=True)
    pos = np.random.default_rng(0).random((64, 2))
    out, pdf = m.invert(pos)
    np.testing.assert_allclose(out, pos, atol=1e-12)
    np.testing.assert_allclose(pdf, 1.0, rtol=1e-12)


def test_marginal2d_invert_matches_numeric_cdf():
    # 1-D varying density along x: invert.x must match the analytic CDF
    nx = 33
    x = np.linspace(0, 1, nx)
    density = 1.0 + x                       # CDF ~ (x + x^2/2) / 1.5
    data = np.tile(density, (4, 1))
    m = R.Marginal2D(data, build_cdf=True)
    pos = np.stack([np.linspace(0.01, 0.99, 21),
                    np.full(21, 0.5)], axis=1)
    out, _ = m.invert(pos)
    expect = (pos[:, 0] + pos[:, 0] ** 2 / 2.0) / 1.5
    np.testing.assert_allclose(out[:, 0], expect, atol=2e-3)


def test_rgl_eval_flat_vndf_closed_form(tmp_path):
    path = str(tmp_path / "synth.bsdf")
    R.synthetic_tensor_file(path, diffuse=0.4, seed=3)
    brdf = R.RGLBrdf(path)
    # constant ndf=1, sigma=0.25, uniform vndf, spectra constant per wl:
    # eval == spectra * 1 / (4 * 0.25) == spectra
    fields = R.read_tensor_file(path)
    expect = fields["spectra"][0, 0, :, 0, 0]
    w = np.array([[0.3, 0.1, 0.95]])
    w = w / np.linalg.norm(w)
    fr = brdf.eval(w, w)
    np.testing.assert_allclose(fr[0], expect, rtol=1e-5)
    # below-horizon directions are zero
    assert (brdf.eval(np.array([[0.0, 0.5, -0.5]]),
                      np.array([[0.0, 0.5, -0.5]])) == 0).all()


def test_retro_table_shape_and_cache(tmp_path):
    R.synthetic_tensor_file(str(tmp_path / "mat_a.bsdf"), diffuse=0.3, seed=1)
    R.synthetic_tensor_file(str(tmp_path / "mat_b.bsdf"), diffuse=0.7, seed=2)
    db = R.BRDFDatabase(str(tmp_path))
    assert db.names == ["mat_a", "mat_b"]
    assert db.tables.shape[2:] == (360, 91)
    assert np.isfinite(db.tables).all()
    table = db.lookup(db.material_id("mat_b"), 1064.0)
    assert table.shape == (360, 91)
    # cache round-trip: second construction loads database.npz
    db2 = R.BRDFDatabase(str(tmp_path))
    np.testing.assert_array_equal(db2.tables, db.tables)
    assert (tmp_path / "database.npz").exists()


def test_material_library_with_measured(tmp_path):
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    R.synthetic_tensor_file(str(tmp_path / "leaf_maple.bsdf"), diffuse=0.5)
    lib = MaterialLibrary.default().with_measured(
        str(tmp_path), reflectivity_map={"LEAF": "leaf_maple"})
    assert lib.spectral_tables is not None
    mt = lib.table_at(700.0)
    leaf = lib.names.index("LEAF")
    other = (leaf + 1) % len(lib.names)
    # LEAF table replaced by the measured one, others untouched
    assert not np.allclose(np.asarray(mt.brdf_table)[leaf], lib.tables[leaf])
    np.testing.assert_array_equal(np.asarray(mt.brdf_table)[other],
                                  lib.tables[other])


def test_with_measured_default_reflectivity_map(tmp_path):
    """No-map with_measured applies the reference's Reflectivity.txt pairing
    (MaterialDatabase.cpp:69-99), preferring the "_spec"-suffixed database
    entry like `lookUpMaterial(name + "_spec")`."""
    from lidar_brdf_tpu.io.materials import MaterialLibrary
    R.synthetic_tensor_file(str(tmp_path / "leaf_maple_spec.bsdf"),
                            diffuse=0.5, seed=3)
    R.synthetic_tensor_file(str(tmp_path / "cardboard.bsdf"),
                            diffuse=0.8, seed=4)
    lib = MaterialLibrary.default().with_measured(str(tmp_path))
    mt = lib.table_at(700.0)
    leaf = lib.names.index("LEAF")     # -> leaf_maple(_spec)
    wood = lib.names.index("WOOD")     # -> cardboard (bare fallback)
    stone = lib.names.index("STONE")   # -> cm_white (absent: untouched)
    assert not np.allclose(np.asarray(mt.brdf_table)[leaf], lib.tables[leaf])
    assert not np.allclose(np.asarray(mt.brdf_table)[wood], lib.tables[wood])
    np.testing.assert_array_equal(np.asarray(mt.brdf_table)[stone],
                                  lib.tables[stone])
