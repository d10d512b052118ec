"""PNG decode/encode, GL-style sampling, and texture->vertex baking.

Parity target: `Model3D::retrieveColorsGPU` (Model3D.cpp:292-330) +
`retrieveColors-comp.glsl:33-47` — texture albedo/specular baked into
vertex kad/ks/ns at load, before BVH build, so textured scenes drive the
shininess/loss model.
"""

import struct
import zlib

import numpy as np

from lidar_brdf_tpu.io.png import read_png, sample_bilinear, write_png


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, (13, 7, ch), dtype=np.uint8)
        p = str(tmp_path / f"t{ch}.png")
        write_png(p, img)
        back = read_png(p)
        np.testing.assert_allclose(back, img.astype(np.float32) / 255.0,
                                   atol=1e-6)


def test_png_all_filters(tmp_path):
    """Decode scanlines using every PNG filter type (Sub/Up/Avg/Paeth)."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        ftype = y % 5
        raw.append(ftype)
        for x in range(stride):
            a = int(cur[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            v = int(cur[x])
            if ftype == 0:
                enc = v
            elif ftype == 1:
                enc = v - a
            elif ftype == 2:
                enc = v - b
            elif ftype == 3:
                enc = v - ((a + b) >> 1)
            else:
                enc = v - paeth(a, b, c)
            raw.append(enc & 0xFF)
        prev = cur

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    p = str(tmp_path / "filters.png")
    with open(p, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                 + chunk(b"IDAT", zlib.compress(bytes(raw)))
                 + chunk(b"IEND", b""))
    np.testing.assert_allclose(read_png(p), img.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_sample_bilinear_semantics():
    """Texel centers, REPEAT wrap, and the reference's vertical flip
    (v=0 samples the image BOTTOM, Image.cpp:20)."""
    img = np.array([[[1.0], [0.0]],      # top row:    white, black
                    [[0.0], [1.0]]])     # bottom row: black, white
    # v=0.25 -> bottom row center; u=0.25 -> left column center
    assert sample_bilinear(img, np.array([0.25, 0.25]))[0] == 0.0
    assert sample_bilinear(img, np.array([0.75, 0.25]))[0] == 1.0
    # v=0.75 -> top row center
    assert sample_bilinear(img, np.array([0.25, 0.75]))[0] == 1.0
    # midpoint blends all four texels equally
    np.testing.assert_allclose(
        sample_bilinear(img, np.array([0.5, 0.5]))[0], 0.5, atol=1e-6)
    # REPEAT wrap: u=1.25 == u=0.25
    np.testing.assert_allclose(
        sample_bilinear(img, np.array([1.25, 0.25]))[0], 0.0, atol=1e-6)


def _write_textured_quad(tmp_path, ks_img, kd_img):
    """A unit quad in XZ (y=0) with UVs spanning the textures."""
    from lidar_brdf_tpu.io.png import write_png
    write_png(str(tmp_path / "ks.png"), ks_img)
    write_png(str(tmp_path / "kd.png"), kd_img)
    (tmp_path / "scene.mtl").write_text(
        "newmtl painted\nKd 0.2 0.2 0.2\nKs 0.0 0.0 0.0\nNs 1.0\n"
        "map_Kd kd.png\nmap_Ks ks.png\n")
    # UVs inset to 0.25/0.75: u=0/1 would REPEAT-wrap across the texture
    # seam and blend both halves (GL semantics the sampler reproduces)
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\no ground\nusemtl painted\n"
        "v -10 0 -10\nv 10 0 -10\nv -10 0 10\nv 10 0 10\n"
        "vt 0.25 0.25\nvt 0.75 0.25\nvt 0.25 0.75\nvt 0.75 0.75\n"
        "f 1/1 3/3 2/2\nf 2/2 3/3 4/4\n")
    return str(tmp_path / "scene.obj")


def test_texture_bakes_into_vertex_attributes(tmp_path):
    """map_Kd/map_Ks samples land in vertex kad/ks at the vertex UVs."""
    from lidar_brdf_tpu.io.obj import load_obj_scene
    # ks: left half black (0), right half white (1); constant-row image
    ks_img = np.zeros((4, 8, 1), np.float32)
    ks_img[:, 4:] = 1.0
    kd_img = np.zeros((4, 8, 3), np.float32)
    kd_img[..., 0] = 1.0                        # pure red albedo
    path = _write_textured_quad(tmp_path, ks_img, kd_img)
    scene = load_obj_scene(path, use_cache=False)
    ks = np.asarray(scene.vertex_ks)
    v = np.asarray(scene.vertices)
    left = ks[v[:, 0] < 0]
    right = ks[v[:, 0] > 0]
    assert (left < 0.1).all(), left            # u=0 -> black half
    assert (right > 0.9).all(), right          # u=1 -> white half
    kad = np.asarray(scene.vertex_kad)
    np.testing.assert_allclose(kad[:, 0], 1.0, atol=0.01)
    np.testing.assert_allclose(kad[:, 1:], 0.0, atol=0.01)


def test_texture_ks_drives_loss_model(tmp_path):
    """End-to-end: the shiny (ks=1) half of a textured quad loses returns
    through the loss model, the matte half keeps them
    (`getLossThreshold`, reduceCollisions-comp.glsl:91-96)."""
    import jax
    from lidar_brdf_tpu.api import simulate
    from lidar_brdf_tpu.core.config import (LiDARType, SensorConfig,
                                            ShadingMode)
    from lidar_brdf_tpu.core.types import RayBundle
    from lidar_brdf_tpu.io.obj import load_obj_scene

    ks_img = np.zeros((4, 8, 1), np.float32)
    ks_img[:, 4:] = 1.0
    kd_img = np.full((4, 8, 3), 0.5, np.float32)
    path = _write_textured_quad(tmp_path, ks_img, kd_img)
    scene = load_obj_scene(path, use_cache=False)

    P = 256
    xs = np.linspace(-9.0, 9.0, P, dtype=np.float32)
    origin = np.stack([xs, np.full(P, 5.0, np.float32),
                       np.zeros(P, np.float32)], -1)[:, None, :]
    direction = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (P, 1))[
        :, None, :]
    rays = RayBundle(origin=origin, direction=direction,
                     gps_time=np.zeros(P, np.float32))
    # STONE roughness ~0.8: shininess = ks^ns * roughness -> matte half 0,
    # shiny half ~0.8; loss: certain above threshold 0.5
    cfg = SensorConfig(
        lidar_type=LiDARType.TERRESTRIAL_SPHERICAL,
        rays_per_pulse=1, max_returns=1, chunk_pulses=P,
        loss_threshold=0.5, loss_mult_coefficient=10.0,
        loss_add_coefficient=0.5, loss_power=1.0,
        include_shiny_surface_error=False,
        shading_mode=ShadingMode.LAMBERTIAN)
    cloud = simulate(scene, cfg, rays=rays)
    m = np.asarray(cloud.mask)
    pos = np.asarray(cloud.position)[m]
    n_matte = int((pos[:, 0] < -0.5).sum())
    n_shiny = int((pos[:, 0] > 0.5).sum())
    assert n_matte > 100, n_matte              # matte half fully returns
    assert n_shiny == 0, n_shiny               # shiny half all lost
