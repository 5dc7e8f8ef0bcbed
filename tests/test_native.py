"""Native data loader tests: C++ PNG decode must match PIL; prefetching
iterator preserves order under concurrency."""

import os
import time

import numpy as np
import pytest

from okvis_tpu.native import (
    NativeUnavailable,
    PrefetchingImageLoader,
    decode_png_gray,
)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
        p = str(d / f"{1000+i}.png")
        Image.fromarray(img).save(p)
        paths.append((p, img))
    return paths


def test_decode_matches_pil(png_dir):
    try:
        for path, expected in png_dir[:3]:
            img = decode_png_gray(path, 48, 64)
            np.testing.assert_array_equal(img.astype(np.uint8), expected)
    except NativeUnavailable as e:
        pytest.skip(f"no native toolchain: {e}")


def test_prefetching_loader_order(png_dir):
    try:
        paths = [p for p, _ in png_dir]
        loader = PrefetchingImageLoader(paths, 48, 64, n_threads=3, prefetch=4)
        got = list(loader)
        loader.close()
    except NativeUnavailable as e:
        pytest.skip(f"no native toolchain: {e}")
    assert [i for i, _ in got] == list(range(12))
    for (i, img), (_, expected) in zip(got, png_dir):
        np.testing.assert_array_equal(img.astype(np.uint8), expected)


def test_wrong_size_rejected(png_dir):
    try:
        with pytest.raises(IOError):
            decode_png_gray(png_dir[0][0], 100, 100)
    except NativeUnavailable as e:
        pytest.skip(f"no native toolchain: {e}")
