"""Native C++ image pipeline vs PIL reference (tolerance: PIL's fixed-point)."""

import numpy as np
import pytest
from PIL import Image

from vlrlhf_tpu.data.collators import default_image_loader
from vlrlhf_tpu.data.native_image import (
    load_batch,
    load_image,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def jpeg_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(96, 64), (50, 120), (336, 336), (41, 37)]):
        # smooth gradient images: JPEG is lossy, so avoid high-freq noise
        y = np.linspace(0, 255, h)[:, None, None]
        x = np.linspace(0, 255, w)[None, :, None]
        c = rng.uniform(0, 1, (1, 1, 3))
        img = (y * c + x * (1 - c)).astype(np.uint8)
        p = str(d / f"img{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


@pytest.mark.parametrize("mode", ["squash", "shortest_edge_crop"])
def test_native_matches_pil(jpeg_files, mode):
    for p in jpeg_files:
        ours = load_image(p, 48, mode)
        assert ours is not None and ours.shape == (48, 48, 3)
        ref = default_image_loader(p, 48, mode)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        # PIL uses 8-bit fixed-point kernels; allow small rounding skew
        assert np.percentile(diff, 99) <= 3, (p, mode, diff.max())
        assert diff.mean() < 1.0, (p, mode, diff.mean())


def test_native_batch(jpeg_files):
    out = load_batch(jpeg_files + [None], 32, "squash", n_threads=4)
    assert out.shape == (5, 32, 32, 3)
    assert out[:4].any(axis=(1, 2, 3)).all()  # real images decoded
    assert not out[4].any()  # empty slot zeroed
    # batch result identical to single-image path
    single = load_image(jpeg_files[0], 32, "squash")
    np.testing.assert_array_equal(out[0], single)


def test_native_loader_fallback_on_png(tmp_path):
    from vlrlhf_tpu.data.native_image import native_image_loader

    p = str(tmp_path / "x.png")
    Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(p)
    out = native_image_loader(p, 16, "squash")
    assert out.shape == (16, 16, 3)


def test_collator_uses_native_batch_path(jpeg_files):
    """Default collator pipeline decodes JPEG batches through the native
    thread pool and matches per-image loading."""
    from tests.test_data import make_processor
    from vlrlhf_tpu.data.collators import CollatorConfig, SFTCollator

    p = make_processor()
    coll = SFTCollator(
        p, CollatorConfig(pad_token_id=0, bucket_multiple=16, image_size=32)
    )
    rows = [
        p.tokenize_row_sft({"prompt": "q", "answer": "a", "img_path": f})
        for f in jpeg_files[:2]
    ]
    batch = coll(rows)
    assert batch["pixel_values"].shape == (2, 1, 32, 32, 3)
    from vlrlhf_tpu.data.native_image import load_image

    want = load_image(jpeg_files[0], 32, "shortest_edge_crop")
    np.testing.assert_array_equal(batch["pixel_values"][0, 0], want)
