"""Native C++ image loader: build, correctness vs PIL, datamanager path."""
import numpy as np
import pytest
from PIL import Image

from samnerf_tpu import native


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    arrays = []
    for i in range(6):
        img = rng.randint(0, 255, (64, 96, 3), dtype=np.uint8)
        p = d / f"im{i}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
        arrays.append(img)
    return paths, np.stack(arrays)


def test_native_build_and_png_exact(images):
    paths, ref = images
    if native.get_loader() is None:
        pytest.skip("native toolchain unavailable")
    out = native.decode_images(paths, 64, 96)
    assert out is not None
    np.testing.assert_array_equal(out, ref)


def test_native_downscale_box(images):
    paths, ref = images
    if native.get_loader() is None:
        pytest.skip("native toolchain unavailable")
    out = native.decode_images(paths[:2], 32, 48, downscale=2)
    # box average reference
    r = ref[:2].reshape(2, 32, 2, 48, 2, 3).astype(int).mean(axis=(2, 4))
    assert np.abs(out.astype(int) - r).max() <= 1  # integer truncation


def test_native_rgba_composites_over_white(tmp_path):
    """RGBA PNGs must train as rgb*a + white*(1-a) (blender alpha_color),
    matching the PIL fallback exactly."""
    if native.get_loader() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(2)
    rgba = rng.randint(0, 255, (16, 16, 4), dtype=np.uint8)
    rgba[:4, :4, 3] = 0       # fully transparent corner -> pure white
    rgba[4:8, :4, 3] = 255    # fully opaque block -> raw rgb
    p = tmp_path / "a.png"
    Image.fromarray(rgba, "RGBA").save(p)
    out = native.decode_images([p], 16, 16)
    assert out is not None
    a = rgba[..., 3:].astype(np.float64) / 255.0
    expect = np.round(rgba[..., :3] * a + 255.0 * (1 - a)).astype(np.uint8)
    np.testing.assert_array_equal(out[0], expect)
    # PIL fallback path gives the same pixels
    from samnerf_tpu.data.datamanager import _load_image
    np.testing.assert_array_equal(_load_image(p, 1), expect)


def test_native_size_mismatch_returns_none(tmp_path):
    """Oversized images must be reported, not silently top-left cropped."""
    if native.get_loader() is None:
        pytest.skip("native toolchain unavailable")
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    p = tmp_path / "big.png"
    Image.fromarray(img).save(p)
    assert native.decode_images([p], 16, 16) is None
    assert native.decode_images([p], 8, 8, downscale=2) is None


def test_native_failure_returns_none(tmp_path):
    if native.get_loader() is None:
        pytest.skip("native toolchain unavailable")
    bad = tmp_path / "nope.png"
    bad.write_bytes(b"not an image")
    assert native.decode_images([bad], 8, 8) is None


def test_native_corrupt_image_mid_batch(tmp_path):
    """One corrupt file among many valid ones: the whole batch is
    reported failed (caller falls back to PIL), the thread pool joins
    cleanly, and an immediately following good batch still decodes."""
    if native.get_loader() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(3)
    paths = []
    for i in range(9):
        img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        p = tmp_path / f"ok{i}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
    # corrupt variants exercising different decoder error paths:
    # garbage bytes, truncated PNG body, truncated JPEG body (longjmp)
    garbage = tmp_path / "garbage.png"
    garbage.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    trunc_png = tmp_path / "trunc.png"
    trunc_png.write_bytes(paths[0].read_bytes()[:40])
    jp = tmp_path / "full.jpg"
    Image.fromarray(rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)).save(jp)
    trunc_jpg = tmp_path / "trunc.jpg"
    trunc_jpg.write_bytes(jp.read_bytes()[:-32])
    for bad in (garbage, trunc_png, trunc_jpg):
        batch = paths[:4] + [bad] + paths[4:]
        assert native.decode_images(batch, 16, 16, num_threads=4) is None
    # the pool recovers: a clean batch right after decodes fine
    out = native.decode_images(paths, 16, 16, num_threads=4)
    assert out is not None and out.shape == (9, 16, 16, 3)


def test_datamanager_uses_native_path(tmp_path):
    from samnerf_tpu.data.datamanager import _load_images_batch
    rng = np.random.RandomState(1)
    paths = []
    for i in range(3):
        img = rng.randint(0, 255, (16, 16, 3), dtype=np.uint8)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
    out = _load_images_batch(paths, downscale=1)
    if out is None:
        pytest.skip("native loader unavailable")
    assert out.shape == (3, 16, 16, 3)
