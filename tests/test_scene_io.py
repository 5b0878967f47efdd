"""Scene parser, asset IO, mesh loading, checkpoint, denoiser tests."""

import os
import struct
import zlib

import numpy as np
import pytest

from fspt_tpu import materials as M
from fspt_tpu.scene.parser import load_scene
from fspt_tpu.utils import image as img_mod

SCENE_PATH = os.path.join(os.path.dirname(__file__), "..", "scenes", "cornell.scene")


def test_parse_cornell_scene():
    b = load_scene(SCENE_PATH)
    scene = b.compile()
    counts = scene.geometry.counts
    assert counts["quads"] == 6
    assert counts["spheres"] == 2
    assert counts["cuboids"] == 1
    # Factory rules (scene.cpp:283-303).
    mt = np.asarray(scene.materials.mtype)
    assert (mt == M.LIGHT).sum() == 2  # lamp + ambient sky
    assert (mt == M.MIRROR).sum() == 1  # metallic 1.0
    assert (mt == M.METAL).sum() == 1  # metallic 0.3
    assert (mt == M.CERAMIC).sum() == 1  # roughness 0.7
    assert len(b.cameras) == 1
    cam = b.cameras[0]
    np.testing.assert_allclose(np.asarray(cam.origin), [0, 0, -145])
    assert float(cam.aperture_size) == 0.0
    # Sky wired to 'ambient'.
    sky_t = int(np.asarray(scene.materials.mtype)[int(scene.sky_mat)])
    assert sky_t == M.LIGHT


def test_scene_renders(tmp_path):
    import jax

    from fspt_tpu.config import RenderConfig
    from fspt_tpu.render import framebuffer as fb_mod
    from fspt_tpu.render import integrator

    b = load_scene(SCENE_PATH)
    scene = b.compile()
    cfg = RenderConfig(width=24, height=16, spp=1, max_depth=3)
    fb = fb_mod.create(cfg.height, cfg.width)
    step = jax.jit(integrator.render_step, static_argnames=("cfg",))
    fb, segs = step(scene, b.cameras[0], cfg, fb, 3, 0)
    assert int(segs) > 0
    assert float(np.asarray(fb.mean).max()) > 0.0


def test_bmp_roundtrip(tmp_path):
    """Hand-built 24-bit BMP with row padding; BGR→RGB, bottom-up rows."""
    w, h = 3, 2
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],  # bottom row (B,G,R tuples)
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    stride = (w * 3 + 3) & ~3
    pix = b""
    for row in rows:
        line = b"".join(bytes(c) for c in row)
        pix += line + b"\x00" * (stride - len(line))
    header = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 0, 0, 0, 0)
    p = tmp_path / "t.bmp"
    p.write_bytes(header + pix)
    img = img_mod.load_bmp(str(p))
    assert img.shape == (2, 3, 3)
    np.testing.assert_allclose(img[0, 0], [0, 0, 1], atol=1e-6)  # BGR→RGB
    np.testing.assert_allclose(img[1, 2], [90 / 255, 80 / 255, 70 / 255], atol=1e-6)


def test_exr_reader_none_compression(tmp_path):
    """Hand-built uncompressed scanline EXR, HALF channels."""
    w, h = 2, 2
    vals = np.arange(w * h * 3, dtype=np.float16).reshape(h, w, 3) / 10.0

    def attr(name, atype, payload):
        return name.encode() + b"\x00" + atype.encode() + b"\x00" + \
            struct.pack("<I", len(payload)) + payload

    chan = b""
    for cname in ("B", "G", "R"):
        # name\0 + pixelType(4) + pLinear(1) + reserved(3) + x/ySampling(8)
        chan += cname.encode() + b"\x00" + struct.pack("<i", 1) + b"\x00" * 4 + \
            struct.pack("<ii", 1, 1)
    chan += b"\x00"
    header = struct.pack("<iI", 20000630, 2)
    header += attr("channels", "chlist", chan)
    header += attr("compression", "compression", b"\x00")
    header += attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    line_bytes = w * 2  # half = 2 bytes
    block_size = 3 * line_bytes
    offset_table_pos = len(header)
    data_start = offset_table_pos + 8 * h
    blocks = b""
    offsets = []
    for y in range(h):
        offsets.append(data_start + len(blocks))
        payload = b""
        # channels alphabetical: B, G, R
        for ci, cname in enumerate(("B", "G", "R")):
            comp = {"R": 0, "G": 1, "B": 2}[cname]
            payload += vals[y, :, comp].tobytes()
        blocks += struct.pack("<iI", y, len(payload)) + payload
    exr = header + struct.pack(f"<{h}Q", *offsets) + blocks
    p = tmp_path / "t.exr"
    p.write_bytes(exr)

    img = img_mod.load_exr(str(p))
    assert img.shape == (h, w, 3)
    np.testing.assert_allclose(img, vals.astype(np.float32), atol=1e-3)


def test_obj_loader(tmp_path):
    obj = """
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
"""
    p = tmp_path / "quad.obj"
    p.write_text(obj)
    from fspt_tpu.scene.mesh import load_mesh, parse_obj

    parsed = parse_obj(str(p))
    assert parsed["faces"].shape == (2, 3, 3)  # quad → 2 triangles (fan)

    tris = load_mesh(str(p), translation=(1, 2, 3), scale=(2, 2, 2))
    assert tris["v0"].shape == (2, 3)
    # winding flipped + T·R·S applied: first tri corners reversed.
    np.testing.assert_allclose(tris["v0"][0], [3.0, 4.0, 3.0])  # (1,1,0)*2+T
    np.testing.assert_allclose(tris["v2"][0], [1.0, 2.0, 3.0])  # (0,0,0)*2+T


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from fspt_tpu.render import framebuffer as fb_mod
    from fspt_tpu.utils import checkpoint as ckpt

    fb = fb_mod.create(4, 6)
    fb = fb._replace(mean=fb.mean + 0.5, count=fb.count + 3)
    path = str(tmp_path / "state.npz")
    ckpt.save(path, fb, frame=7, extra={"lr": 0.1})
    fb2, frame, extra = ckpt.load(path, with_extra=True)
    assert frame == 7
    np.testing.assert_allclose(np.asarray(fb2.mean), np.asarray(fb.mean))
    assert float(extra["lr"]) == pytest.approx(0.1)
    assert ckpt.load(str(tmp_path / "missing.npz")) is None


def test_denoiser_improves_mse():
    """AOV-guided denoise of a low-spp render should beat ~3x the samples
    (the reference README's '300% effective spp' claim, README.md:11)."""
    import jax

    from conftest import build_cornell_box
    from fspt_tpu.config import RenderConfig
    from fspt_tpu.render import framebuffer as fb_mod
    from fspt_tpu.render import integrator
    from fspt_tpu.render.denoiser import denoise

    b = build_cornell_box()
    scene = b.compile()
    cam = b.cameras[0]
    cfg = RenderConfig(width=32, height=24, spp=1, max_depth=3)
    step = jax.jit(integrator.render_step, static_argnames=("cfg",))

    def render(frames, seed):
        fb = fb_mod.create(cfg.height, cfg.width)
        for f in range(frames):
            fb, _ = step(scene, cam, cfg, fb, seed, f)
        return fb

    def tone(x):  # display space (frame.cpp:66-69) — what the claim is about
        return np.clip(np.asarray(x), 0, 1) ** (1 / 2.2)

    reference = tone(render(96, seed=123).mean)  # converged-ish target
    noisy_fb = render(4, seed=7)
    more_fb = render(16, seed=7)  # 4x the samples

    mse_noisy = float(np.mean((tone(noisy_fb.mean) - reference) ** 2))
    mse_denoised = float(np.mean((tone(denoise(noisy_fb)) - reference) ** 2))
    mse_4x = float(np.mean((tone(more_fb.mean) - reference) ** 2))

    assert mse_denoised < mse_noisy * 0.5, (mse_noisy, mse_denoised)
    assert mse_denoised < mse_4x, (mse_denoised, mse_4x)


def test_exr_reader_rle_compression(tmp_path):
    """Hand-built RLE scanline EXR (predictor + two-half interleave + RLE),
    matching tiny_exr_loader.h's RLE path."""
    w, h = 8, 2
    vals = np.zeros((h, w, 3), np.float16)
    vals[:, :, 0] = 0.5  # constant R plane → long runs
    vals[:, :, 1] = np.arange(w, dtype=np.float16) / 8.0
    vals[:, :, 2] = 0.25

    def rle_encode(src: bytes) -> bytes:
        out = bytearray()
        i = 0
        while i < len(src):
            run = 1
            while (i + run < len(src) and run < 127
                   and src[i + run] == src[i]):
                run += 1
            if run >= 3:
                out += bytes([run - 1, src[i]])
                i += run
            else:
                j = i + 1
                while (j < len(src) and j - i < 127
                       and not (j + 2 < len(src)
                                and src[j] == src[j + 1] == src[j + 2])):
                    j += 1
                out += bytes([256 - (j - i)]) + src[i:j]
                i = j
        return bytes(out)

    def predict(raw: bytes) -> bytes:
        t = np.concatenate([np.frombuffer(raw, np.uint8)[0::2],
                            np.frombuffer(raw, np.uint8)[1::2]]).astype(np.int64)
        d = np.empty_like(t)
        d[0] = t[0]
        d[1:] = (t[1:] - t[:-1] + 128) % 256
        return d.astype(np.uint8).tobytes()

    def attr(name, atype, payload):
        return name.encode() + b"\x00" + atype.encode() + b"\x00" + \
            struct.pack("<I", len(payload)) + payload

    chan = b""
    for cname in ("B", "G", "R"):
        chan += cname.encode() + b"\x00" + struct.pack("<i", 1) + b"\x00" * 4 + \
            struct.pack("<ii", 1, 1)
    chan += b"\x00"
    header = struct.pack("<iI", 20000630, 2)
    header += attr("channels", "chlist", chan)
    header += attr("compression", "compression", b"\x01")  # RLE
    header += attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += attr("lineOrder", "lineOrder", b"\x00")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\x00"

    offset_table_pos = len(header)
    data_start = offset_table_pos + 8 * h
    blocks = b""
    offsets = []
    for y in range(h):
        offsets.append(data_start + len(blocks))
        payload = b""
        for cname in ("B", "G", "R"):
            comp = {"R": 0, "G": 1, "B": 2}[cname]
            payload += vals[y, :, comp].tobytes()
        enc = rle_encode(predict(payload))
        assert len(enc) < len(payload)  # must actually compress
        blocks += struct.pack("<iI", y, len(enc)) + enc
    p = tmp_path / "t_rle.exr"
    p.write_bytes(header + struct.pack(f"<{h}Q", *offsets) + blocks)

    img = img_mod.load_exr(str(p))
    np.testing.assert_allclose(img, vals.astype(np.float32), atol=1e-3)


def test_exr_reader_unsupported_codec_clear_error(tmp_path):
    """Still-unsupported codecs fail with an actionable message
    (VERDICT r2 #10; PIZ itself decodes as of r4)."""
    import pytest

    def attr(name, atype, payload):
        return name.encode() + b"\x00" + atype.encode() + b"\x00" + \
            struct.pack("<I", len(payload)) + payload

    chan = b"R\x00" + struct.pack("<i", 1) + b"\x00" * 4 + \
        struct.pack("<ii", 1, 1) + b"\x00"
    header = struct.pack("<iI", 20000630, 2)
    header += attr("channels", "chlist", chan)
    header += attr("compression", "compression", b"\x05")  # PXR24
    header += attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, 1, 1))
    header += b"\x00"
    p = tmp_path / "t_pxr24.exr"
    p.write_bytes(header)
    with pytest.raises(ValueError, match="PXR24.*zip"):
        img_mod.load_exr(str(p))


def test_exr_reader_piz_compression():
    """PIZ (wavelet + Huffman) decode, bit-exact against golden decodes
    produced by an independent implementation (TinyEXR — the same codec
    the reference uses for its sky domes, tiny_exr_loader.h).  Covers a
    single odd-sized block (37×23) and a 3-block dome (64×80)."""
    import os

    import numpy as np

    from fspt_tpu.utils import image as img_mod

    base = os.path.join(os.path.dirname(__file__), "data")
    for stem in ("piz_pattern", "piz_dome"):
        gold_name = ("piz_pattern_gold" if stem == "piz_pattern"
                     else "piz_dome_gold")
        img = img_mod.load_exr(os.path.join(base, f"{stem}.exr"))
        gold = np.load(os.path.join(base, f"{gold_name}.npy"))
        np.testing.assert_array_equal(img, gold, err_msg=stem)
