"""Debug-surface rendering tests (the ConvolutionDebugView equivalent —
VERDICT r1 item 5: the data feeds must have an actual consumer that
produces images)."""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from vaudio.config import AuralizerConfig
from vaudio.utils.render import (curve_image, hue_matrix_image,
                                 signed_heatmap, spectrum_image,
                                 waveform_image, write_png)

CFG = AuralizerConfig()


def read_png(path):
    """Minimal decoder for the writer's own output (8-bit RGB, filter 0)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, w, h, idat = 8, None, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert depth == 8 and ctype == 2
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    rows = []
    for y in range(h):
        row = raw[y * stride:(y + 1) * stride]
        assert row[0] == 0, "writer only emits filter 0"
        rows.append(np.frombuffer(row[1:], np.uint8).reshape(w, 3))
    return np.stack(rows)


class TestPngWriter:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
        p = str(tmp_path / "x.png")
        write_png(p, img)
        np.testing.assert_array_equal(read_png(p), img)

    def test_rejects_bad_shape(self, tmp_path):
        with pytest.raises(ValueError):
            write_png(str(tmp_path / "y.png"), np.zeros((4, 4), np.uint8))


class TestImageBuilders:
    def test_signed_heatmap_colors(self):
        # Positive -> green channel, negative -> red (DebuggingView:125-128)
        img = signed_heatmap(np.array([[0.5, -0.5], [2.0, 0.0]], np.float32))
        assert img[0, 0, 1] == 128 and img[0, 0, 0] == 0
        assert img[0, 1, 0] == 128 and img[0, 1, 1] == 0
        assert img[1, 0, 1] == 255          # clamped to 1.0
        assert (img[1, 1] == 0).all()

    def test_heatmap_upscale(self):
        img = signed_heatmap(np.ones((3, 4), np.float32), upscale=4)
        assert img.shape == (12, 16, 3)

    def test_hue_matrix_swatches(self):
        hues = np.arange(16, dtype=np.int32) * 22
        img = hue_matrix_image(hues, CFG, cell_px=10, gap=1)
        assert img.shape == (45, 45, 3)
        # Cell 0: hue bin 0 -> pure red swatch.
        assert tuple(img[5, 5]) == (255, 0, 0)
        # Invalid bin -> gray.
        img2 = hue_matrix_image(np.full(16, 999, np.int32), CFG,
                                cell_px=10, gap=1)
        assert tuple(img2[5, 5]) == (77, 77, 77)

    def test_curve_is_connected(self):
        img = curve_image(np.array([0.0, 1.0]), np.array([0.0, 1.0]),
                          width=64, height=64)
        lit = (img != np.asarray([8, 8, 12], np.uint8)).any(-1)
        # A diagonal with dense sampling lights >= one pixel per column.
        assert lit.any(axis=0).all()

    def test_spectrum_and_waveform_images(self):
        rng = np.random.default_rng(1)
        spec = rng.normal(size=(CFG.num_bins, 2)).astype(np.float32)
        img = spectrum_image(spec, CFG)
        assert img.shape == (240, 640, 3) and img.std() > 0
        wav = waveform_image(np.sin(np.linspace(0, 40, 2048)))
        assert wav.shape == (160, 640, 3) and wav.std() > 0

    def test_input_preview_rgb(self):
        from vaudio.utils.render import input_preview_image
        rng = np.random.default_rng(2)
        frame = rng.integers(0, 256, (1080, 1920, 3), np.uint8)
        img = input_preview_image(frame, max_dim=256)
        assert img.dtype == np.uint8
        assert max(img.shape[:2]) <= 256
        # Strided subsample: pixels come straight from the frame
        # (step = ceil(1920 / 256) = 8).
        np.testing.assert_array_equal(img, frame[::8, ::8])
        # Float frames in [0, 1] quantize to the same u8 values.
        imgf = input_preview_image(frame.astype(np.float32) / 255.0,
                                   max_dim=256)
        np.testing.assert_array_equal(imgf, img)
        # Small frames pass through unscaled.
        small = frame[:64, :64]
        np.testing.assert_array_equal(
            input_preview_image(small, max_dim=256), small)
        with pytest.raises(ValueError):
            input_preview_image(np.zeros((4, 4), np.uint8))

    def test_input_preview_yuv_dict(self):
        from vaudio.io.sources import yuv420_to_rgb
        from vaudio.utils.render import input_preview_image
        rng = np.random.default_rng(3)
        frame = {"y": rng.integers(0, 256, (64, 64), np.uint8),
                 "u": rng.integers(0, 256, (32, 32), np.uint8),
                 "v": rng.integers(0, 256, (32, 32), np.uint8)}
        # The subsampled preview must equal convert-then-subsample
        # (chroma sampled at the same spatial sites as the luma), for
        # even AND odd steps.
        full = yuv420_to_rgb(frame["y"], frame["u"], frame["v"])
        np.testing.assert_array_equal(
            input_preview_image(frame, max_dim=256), full)  # step 1
        np.testing.assert_array_equal(
            input_preview_image(frame, max_dim=16), full[::4, ::4])
        np.testing.assert_array_equal(
            input_preview_image(frame, max_dim=13), full[::5, ::5])


class TestDebugCli:
    def test_end_to_end_synthetic(self, tmp_path):
        from vaudio.cli import main
        out = str(tmp_path / "dbg")
        rc = main(["debug", "synthetic", "--hue", "0.33", "--frames", "8",
                   "--mip-level", "2", "--spectrum-mixing", "0.5",
                   "-o", out])
        assert rc == 0
        names = os.listdir(out)
        # 12 heatmaps + hue matrix + spectrum + waveform + grid json
        assert len([n for n in names if n.startswith("heatmap_")]) == 12
        for required in ("hue_matrix.png", "spectrum.png", "waveform.png",
                         "grid_overlay.json", "index.html"):
            assert required in names
        # The HTML page must reference only images that exist.
        import re
        html = open(os.path.join(out, "index.html")).read()
        refs = re.findall(r'src="([^"]+)"', html)
        assert len(refs) == 15
        assert all(os.path.exists(os.path.join(out, r)) for r in refs)
        # Images are non-trivial (not a constant field).
        hue_img = read_png(os.path.join(out, "hue_matrix.png"))
        assert hue_img.std() > 0
        spec_img = read_png(os.path.join(out, "spectrum.png"))
        assert spec_img.std() > 0
        with open(os.path.join(out, "grid_overlay.json")) as f:
            grid = json.load(f)
        assert len(grid["hues"]) == 16
        assert set(grid["grads"]) == {"breathing", "vtilt", "htilt",
                                      "saddle"}
        # A green (hue 0.33) clip must land the hue matrix near green:
        # bin ~ 120 of 360.
        assert 100 <= max(grid["hues"]) <= 140

    def test_npy_input(self, tmp_path):
        from vaudio.cli import main
        frames = np.full((4, 64, 64, 3), [0.9, 0.1, 0.1], np.float32)
        p = str(tmp_path / "clip.npy")
        np.save(p, frames)
        out = str(tmp_path / "dbg2")
        rc = main(["debug", p, "--mip-level", "2", "-o", out])
        assert rc == 0
        assert os.path.exists(os.path.join(out, "hue_matrix.png"))
