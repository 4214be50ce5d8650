"""Golden + property tests for attwarp_tpu.numerics against torch/NumPy."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as TF

from attwarp_tpu.numerics import (
    adaptive_avg_pool1d,
    adaptive_avg_pool2d,
    cdf_from_density,
    gt_marginals,
    make_strictly_increasing,
    resample_cdf,
    upsample_pdf_right_inverse,
)
from attwarp_tpu.numerics.safe import entropy, mix_with_uniform, safe_softmax
from attwarp_tpu.testing.oracle import (
    adaptive_avg_pool1d_oracle,
    upsample_pdf_right_inverse_oracle,
)


def test_cdf_from_density_matches_torch(rng):
    p = rng.normal(size=(4, 37)).astype(np.float32)
    p[0, :5] = np.nan
    p[1, 3] = np.inf
    ours = np.asarray(cdf_from_density(jnp.asarray(p)))
    t = torch.nan_to_num(torch.from_numpy(p).float().clamp_min(0), nan=0.0, posinf=0.0, neginf=0.0)
    t = t / t.sum(dim=1, keepdim=True).clamp_min(1e-6)
    ref = torch.cumsum(t, dim=1)
    ref[:, -1] = 1.0
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-6)
    assert np.all(np.diff(ours, axis=1) >= -1e-6)
    assert np.allclose(ours[:, -1], 1.0)


def test_gt_marginals_matches_torch(rng):
    A = rng.random((3, 1, 17, 23)).astype(np.float32)
    mx, my = gt_marginals(jnp.asarray(A))
    At = torch.from_numpy(A).clamp_min(0)
    mxr = At.sum(dim=2).squeeze(1)
    myr = At.sum(dim=3).squeeze(1)
    mxr = mxr / mxr.sum(dim=1, keepdim=True).clamp_min(1e-6)
    myr = myr / myr.sum(dim=1, keepdim=True).clamp_min(1e-6)
    np.testing.assert_allclose(np.asarray(mx), mxr.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(my), myr.numpy(), atol=1e-6)


def _torch_make_strictly_increasing(F, eps=1e-4):
    F = torch.nan_to_num(F, nan=0.0, posinf=1.0, neginf=0.0)
    F_nd, _ = torch.cummax(F, dim=1)
    B, N = F_nd.shape
    min_step = eps / max(N, 1)
    d = torch.clamp(F_nd[:, 1:] - F_nd[:, :-1], min=min_step)
    F_fix = torch.cat([F_nd[:, :1], F_nd[:, :1] + torch.cumsum(d, dim=1)], dim=1)
    last = F_fix[:, -1:].clamp_min(1e-6)
    F_fix = (F_fix / last).clamp(0.0, 1.0)
    F_fix[:, -1] = 1.0
    return F_fix


def test_make_strictly_increasing_matches_torch(rng):
    F = np.sort(rng.random((5, 33)).astype(np.float32), axis=1)
    F[1, 10:15] = F[1, 9]  # plateaus
    F[2] = 0.0             # degenerate
    ours = np.asarray(make_strictly_increasing(jnp.asarray(F)))
    ref = _torch_make_strictly_increasing(torch.from_numpy(F)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)
    assert np.all(np.diff(ours, axis=1) > 0)


@pytest.mark.parametrize("target", [7, 33, 128, 500])
def test_resample_cdf_matches_torch(rng, target):
    F = np.sort(rng.random((3, 24)).astype(np.float32), axis=1)
    ours = np.asarray(resample_cdf(jnp.asarray(F), target))
    Ft = _torch_make_strictly_increasing(torch.from_numpy(F))
    up = TF.interpolate(Ft.unsqueeze(1), size=target, mode="linear", align_corners=True).squeeze(1)
    ref = _torch_make_strictly_increasing(up).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-6)


@pytest.mark.parametrize("pair", [(24, 336), (24, 500), (128, 512), (7, 7), (33, 100)])
def test_adaptive_avg_pool1d_matches_torch(rng, pair):
    out_len, in_len = pair
    x = rng.random((2, in_len)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), out_len))
    ref = TF.adaptive_avg_pool1d(torch.from_numpy(x).unsqueeze(1), out_len).squeeze(1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    np.testing.assert_allclose(ours, adaptive_avg_pool1d_oracle(x, out_len), atol=1e-5)


def test_adaptive_avg_pool2d_matches_torch(rng):
    x = rng.random((2, 1, 512, 512)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (24, 24)))
    ref = TF.adaptive_avg_pool2d(torch.from_numpy(x), (24, 24)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("pair", [(24, 336), (24, 500), (64, 512)])
def test_right_inverse_contract(rng, pair):
    """adaptive_avg_pool1d(upsample(y, L_in), L_out) == y — the documented
    contract of checkpoint_utils.py:70-83."""
    L_out, L_in = pair
    y = rng.random((3, L_out)).astype(np.float32)
    x_hat = upsample_pdf_right_inverse(jnp.asarray(y), L_in)
    back = np.asarray(adaptive_avg_pool1d(x_hat, L_out))
    np.testing.assert_allclose(back, y, atol=5e-4)


def test_right_inverse_matches_torch_reference(rng):
    y = rng.random((4, 24)).astype(np.float32)
    ours = np.asarray(upsample_pdf_right_inverse(jnp.asarray(y), 336))
    ref = upsample_pdf_right_inverse_oracle(y, 336)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_safe_softmax_matches_torch(rng):
    x = rng.normal(size=(3, 50)).astype(np.float32) * 10
    x[0, 0] = np.nan
    x[1, 1] = np.inf
    ours = np.asarray(safe_softmax(jnp.asarray(x), axis=1))
    xt = torch.nan_to_num(torch.from_numpy(x), nan=0.0, posinf=0.0, neginf=0.0)
    xt = xt - xt.amax(dim=1, keepdim=True)
    pt = torch.softmax(xt, dim=1)
    pt = pt / pt.sum(dim=1, keepdim=True).clamp_min(1e-6)
    np.testing.assert_allclose(ours, pt.numpy(), atol=1e-6)


def test_mix_and_entropy(rng):
    p = rng.random((2, 10)).astype(np.float32)
    p = p / p.sum(axis=1, keepdims=True)
    m = np.asarray(mix_with_uniform(jnp.asarray(p), 0.3))
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    np.testing.assert_allclose(m, 0.7 * p + 0.03, atol=1e-6)
    e = float(entropy(jnp.asarray(p)))
    pt = torch.from_numpy(p).clamp_min(1e-8)
    er = float((-(pt * pt.log()).sum(dim=1)).mean())
    assert abs(e - er) < 1e-5
