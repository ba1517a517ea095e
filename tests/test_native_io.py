"""Native (C++) IO kernel tests: decode/resize parity against cv2 and
GIL-free parallel speedup sanity."""
import io
import time

import cv2
import numpy as np
import pytest

from torchok_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def rgb_image():
    rng = np.random.default_rng(0)
    # smooth image: JPEG decode differences between libjpeg builds stay tiny
    base = rng.uniform(0, 255, size=(7, 9, 3))
    img = cv2.resize(base.astype(np.uint8), (96, 64),
                     interpolation=cv2.INTER_CUBIC)
    return img


def test_probe_and_info(rgb_image, tmp_path):
    ok, jpg = cv2.imencode(".jpg", rgb_image[..., ::-1])
    assert ok
    data = jpg.tobytes()
    assert native.probe(data) == 1
    assert native.image_info(data) == (64, 96, 3)

    ok, png = cv2.imencode(".png", rgb_image[..., ::-1])
    data = png.tobytes()
    assert native.probe(data) == 2
    h, w, c = native.image_info(data)
    assert (h, w, c) == (64, 96, 4)

    assert native.probe(b"not an image") == 0


def test_jpeg_decode_matches_cv2(rgb_image):
    ok, jpg = cv2.imencode(".jpg", rgb_image[..., ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 95])
    data = jpg.tobytes()
    ours = native.decode_image(data)
    theirs = cv2.cvtColor(cv2.imdecode(np.frombuffer(data, np.uint8),
                                       cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    assert ours.shape == theirs.shape
    # IDCT implementations differ slightly between libjpeg builds
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 3


def test_png_decode_lossless(rgb_image):
    ok, png = cv2.imencode(".png", rgb_image[..., ::-1])
    data = png.tobytes()
    ours = native.decode_image(data)
    assert ours.shape == (64, 96, 4)
    assert np.array_equal(ours[..., :3], rgb_image)  # PNG is lossless
    assert (ours[..., 3] == 255).all()


def test_fused_resize_matches_cv2(rgb_image):
    ok, png = cv2.imencode(".png", rgb_image[..., ::-1])
    data = png.tobytes()
    ours = native.decode_image(data, resize=(32, 48))
    ref = cv2.resize(np.dstack([rgb_image,
                                np.full(rgb_image.shape[:2], 255, np.uint8)]),
                     (48, 32), interpolation=cv2.INTER_LINEAR)
    assert ours.shape == (32, 48, 4)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_decode_file_and_dataset_path(rgb_image, tmp_path):
    path = str(tmp_path / "img.jpg")
    cv2.imwrite(path, rgb_image[..., ::-1])
    out = native.decode_file(path)
    assert out is not None and out.shape == (64, 96, 3)


def test_parallel_decode_scales(rgb_image):
    """GIL-free decode: two threads must beat one thread clearly."""
    from concurrent.futures import ThreadPoolExecutor
    big = cv2.resize(rgb_image, (1536, 1024))
    ok, jpg = cv2.imencode(".jpg", big[..., ::-1])
    data = jpg.tobytes()
    n = 24

    def run(workers):
        with ThreadPoolExecutor(workers) as pool:
            t0 = time.perf_counter()
            list(pool.map(lambda _: native.decode_image(data), range(n)))
            return time.perf_counter() - t0

    native.decode_image(data)  # warm the library
    # best-of-3: shared CI boxes can be transiently loaded; GIL-free decode
    # must beat 1.5x in at least one clean attempt
    best = 0.0
    for _ in range(3):
        t1 = run(1)
        t4 = run(4)
        best = max(best, t1 / t4)
        if best > 1.5:
            break
    assert best > 1.5, f"best 4-thread speedup {best:.2f}x"
