"""Native C++ library vs the Python/scipy/PIL oracles."""

import io

import numpy as np
import pytest
from PIL import Image

from jpdvt_mt_ntnu_tpu.ops import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_native_greedy_matches_python():
    import jax.numpy as jnp

    from jpdvt_mt_ntnu_tpu.ops import assignment

    rng = np.random.RandomState(0)
    d = rng.rand(16, 9, 9).astype(np.float32)
    ref = np.asarray(assignment.greedy_permutation(jnp.asarray(d)))
    out = native.greedy_permutation(d)
    np.testing.assert_array_equal(out, ref)


def test_native_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.RandomState(1)
    for n in (9, 16):
        d = rng.rand(8, n, n).astype(np.float32)
        out = native.hungarian_permutation(d)
        for b in range(8):
            rows, cols = linear_sum_assignment(d[b])
            # optimal cost must match (assignments may differ on ties)
            cost_ref = d[b][rows, cols].sum()
            cost_out = d[b][np.arange(n), out[b]].sum()
            np.testing.assert_allclose(cost_out, cost_ref, rtol=1e-5)
            assert sorted(out[b].tolist()) == list(range(n))


def _png_bytes(w, h, seed=0):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue(), np.asarray(img)


def _jpeg_bytes(w, h, seed=0):
    rng = np.random.default_rng(seed)
    # smooth image so JPEG loss is small
    base = rng.normal(size=(h // 8 + 1, w // 8 + 1, 3))
    arr = np.kron(base, np.ones((8, 8, 1)))[:h, :w]
    arr = ((arr - arr.min()) / (np.ptp(arr) + 1e-9) * 255).astype(np.uint8)
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=95)
    return buf.getvalue(), arr


def test_native_decode_png_exact_pixels():
    data, arr = _png_bytes(64, 64)
    out = native.decode_center_crop(data, 64)
    expect = arr.astype(np.float32) / 255.0 * 2 - 1
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_native_decode_jpeg_close_to_pil():
    from jpdvt_mt_ntnu_tpu.data import transforms as T

    data, _ = _jpeg_bytes(500, 375, seed=3)
    out = native.decode_center_crop(data, 192)
    ref = T.normalize(T.to_array(
        T.center_crop_arr(Image.open(io.BytesIO(data)).convert("RGB"), 192)))
    assert out.shape == ref.shape == (192, 192, 3)
    # decode+resample parity within ~2/255
    diff = np.abs(out - ref)
    assert diff.mean() < 0.01, diff.mean()
    assert np.quantile(diff, 0.99) < 0.05


def test_native_decode_box_halving_path():
    """Image >= 4x target exercises the iterative BOX halving."""
    from jpdvt_mt_ntnu_tpu.data import transforms as T

    data, _ = _png_bytes(800, 900, seed=5)
    out = native.decode_center_crop(data, 96)
    ref = T.normalize(T.to_array(
        T.center_crop_arr(Image.open(io.BytesIO(data)).convert("RGB"), 96)))
    diff = np.abs(out - ref)
    # white-noise source maximizes resampler disagreement; ~3/255 mean is
    # the expected fast-path envelope (PIL stays the bit-parity path)
    assert diff.mean() < 0.04, diff.mean()


def test_native_decode_garbage_raises():
    with pytest.raises(ValueError):
        native.decode_center_crop(b"not an image at all", 64)


def test_native_probe():
    data, _ = _png_bytes(123, 77)
    assert native.probe(data) == (123, 77)
