"""Native C++ image ops: build, parity vs cv2 and vs the TPU warp path."""

import numpy as np
import pytest

from attwarp_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "g++ build of attwarp_native failed"


def test_resize_bilinear_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    src = (rng.random((37, 53, 3)) * 255).astype(np.float32)
    ours = native.resize_bilinear(src, 24, 48)
    ref = cv2.resize(src, (48, 24), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_resize_nearest_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    src = (rng.random((30, 40)) * 255).astype(np.float32)
    ours = native.resize_nearest(src, 13, 17)
    ref = cv2.resize(src, (17, 13), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_remap_separable_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    src = (rng.random((25, 31, 3)) * 255).astype(np.float32)
    mx = (rng.random(20) * 33 - 1).astype(np.float32)   # incl. out-of-range
    my = (rng.random(15) * 27 - 1).astype(np.float32)
    ours = native.remap_separable(src, mx, my)
    gx, gy = np.meshgrid(mx, my)
    ref = cv2.remap(src, gx.astype(np.float32), gy.astype(np.float32),
                    interpolation=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_remap_matches_tpu_path(rng):
    """Host native remap must agree with the jnp gather path."""
    import jax.numpy as jnp

    from attwarp_tpu.warp.resample import remap_bilinear_separable

    src = (rng.random((22, 26, 3)) * 255).astype(np.float32)
    mx = (rng.random(19) * 26).astype(np.float32)
    my = (rng.random(21) * 22).astype(np.float32)
    a = native.remap_separable(src, mx, my)
    b = np.asarray(remap_bilinear_separable(jnp.asarray(src), jnp.asarray(mx), jnp.asarray(my)))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_box_filter_matches_reference(rng):
    import torch
    import torch.nn.functional as TF

    src = rng.random((24, 24)).astype(np.float32)
    ours = native.box_filter(src, 3)
    t = torch.from_numpy(src)[None, None]
    ref = TF.conv2d(TF.pad(t, (1, 1, 1, 1), mode="replicate"),
                    torch.ones(1, 1, 3, 3) / 9.0)[0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_numpy_fallback_matches_native(rng):
    src = (rng.random((18, 20, 3)) * 255).astype(np.float32)
    mx = (rng.random(16) * 20).astype(np.float32)
    my = (rng.random(14) * 18).astype(np.float32)
    a = native.remap_separable(src, mx, my)
    b = native._np_remap_separable(np.ascontiguousarray(src), mx, my)
    np.testing.assert_allclose(a, b, atol=1e-4)
