"""C26 diffusion capture: DDIM-inversion math, recorder convention, and the
full capture -> token-importance -> warp pipeline against a stub pipeline
(diffusers absent in this environment; the pipe surface is duck-typed)."""

import numpy as np
import pytest

from attwarp_tpu.warp.cross_attention import run_cross_attention_warp
from attwarp_tpu.warp.sd_capture import (
    CrossAttnRecorder,
    DiffusionAttnSource,
    make_sd_capture_fn,
)


class _Dist:
    def __init__(self, z):
        self._z = z

    def sample(self):
        return self._z


class _VAE:
    class config:
        scaling_factor = 0.18215

    def encode(self, x):
        # deterministic "latent": 8x downsample by mean pooling, 4 channels
        B, C, H, W = x.shape
        z = x.reshape(B, C, H // 8, 8, W // 8, 8).mean(axis=(3, 5))
        z = np.concatenate([z, z[:, :1]], axis=1)  # (B, 4, H/8, W/8)
        out = type("O", (), {})()
        out.latent_dist = _Dist(z)
        return out


class _TokOut:
    def __init__(self, n):
        self.input_ids = np.arange(n)[None]
        self.attention_mask = np.ones((1, n), np.int64)


class _Tokenizer:
    model_max_length = 7

    def __call__(self, prompt, **kw):
        return _TokOut(self.model_max_length)


class _TextEncoder:
    def __call__(self, input_ids, attention_mask=None):
        n = input_ids.shape[1]
        out = type("O", (), {})()
        rng = np.random.default_rng(0)
        out.last_hidden_state = rng.standard_normal((1, n, 16)).astype(np.float32)
        return out


class _Sched:
    class config:
        num_train_timesteps = 1000

    # linearly decreasing cumulative alphas
    alphas_cumprod = np.linspace(0.999, 0.01, 1000)


class _StubPipe:
    """Duck-typed diffusers pipeline: eps prediction is a fixed linear map so
    the inversion recurrence is exactly checkable; __call__ runs a fake
    denoise that drives the recorder like patched attn processors would."""

    def __init__(self, recorder=None, tokens=7):
        self.vae = _VAE()
        self.tokenizer = _Tokenizer()
        self.text_encoder = _TextEncoder()
        self.scheduler = _Sched()
        self.unet = self  # recorder.install sees attn_processors below
        self.recorder = recorder
        self._tokens = tokens
        self.calls = []

    # eps prediction: deterministic function of z and t
    def unet_eps(self, z, t, emb):
        return 0.1 * z + 0.001 * t

    # minimal attn_processors surface for CrossAttnRecorder.install
    @property
    def attn_processors(self):
        return {"down.attn2.processor": (lambda *a, **k: None),
                "mid.attn1.processor": (lambda *a, **k: None)}

    def set_attn_processor(self, procs):
        self._procs = procs

    def __call__(self, prompt, negative_prompt, num_inference_steps, latents,
                 output_type):
        # fake forward denoise: record one cross-attn map per "layer"
        self.calls.append(np.asarray(latents).copy())
        rng = np.random.default_rng(int(np.asarray(latents).sum() * 1e3) % 2**31)
        h = np.asarray(latents).shape[-1]
        for key in ("layer_a", "layer_b"):
            probs = rng.random((1, 2, h * h, self._tokens)).astype(np.float32)
            probs /= probs.sum(-1, keepdims=True)
            self.recorder.record(key, probs)
        return None


def _source(pipe, **kw):
    src = DiffusionAttnSource(pipe, **kw)
    # The stub's __call__ records via pipe.recorder — point it at the one
    # the source installed on the UNet.
    pipe.recorder = src.recorder
    return src


def test_ddim_inversion_recurrence_matches_reference_formula():
    """The inversion fold reproduces the reference's per-step algebra
    (Stable_diffusion_based_warp.py:264-287), including timestep clamping."""
    src = _source(_StubPipe(), timesteps=(1200, 800, 400))  # 1200 clamps to 999
    z0 = np.full((1, 4, 2, 2), 0.5, np.float32)
    emb = np.zeros((1, 7, 16), np.float32)
    inv = src.invert(z0, emb)
    assert list(inv.keys()) == [800, 400]

    # hand-roll the same recurrence
    ac = _Sched.alphas_cumprod
    z = z0
    for prev_t, t in [(999, 800), (800, 400)]:
        eps = 0.1 * z + 0.001 * prev_t
        a_prev, a = float(ac[prev_t]), float(ac[t])
        x0 = (z - np.sqrt(1 - a_prev) * eps) / np.sqrt(a_prev)
        z = np.sqrt(a) * x0 + np.sqrt(1 - a) * eps
        np.testing.assert_allclose(inv[t], z, rtol=1e-5)


def test_image_latent_shape_and_scale():
    src = _source(_StubPipe(), latent_size=64)
    rng = np.random.default_rng(0)
    img = (rng.random((100, 120, 3)) * 255).astype(np.uint8)
    z = src.image_latent(img)
    assert z.shape == (1, 4, 8, 8)
    # VAE scaling factor applied
    assert np.abs(z).max() < 1.0


def test_recorder_convention_and_square_inference():
    rec = CrossAttnRecorder()
    rec.timestep = 400
    probs = np.random.default_rng(0).random((1, 2, 16, 5)).astype(np.float32)
    rec.record("k", probs)
    assert rec.maps[400]["k"].shape == (1, 2, 4, 4, 5)
    with pytest.raises(ValueError, match="non-square"):
        rec.record("bad", probs[:, :, :15, :])
    n = rec.install(_StubPipe(rec))
    assert n == 1  # only the attn2 processor wrapped


def test_recording_processor_prepares_raw_mask():
    """A raw (B, T) attention mask is routed through prepare_attention_mask
    before get_attention_scores (ADVICE round 2): the processor must hand
    get_attention_scores a broadcastable mask, not the raw one."""
    from attwarp_tpu.warp.sd_capture import _RecordingProcessor

    seen = {}

    class _Attn:
        heads = 2

        def to_q(self, h):
            return h

        def to_k(self, h):
            return h

        def head_to_batch_dim(self, x):
            B, T, D = x.shape
            return np.repeat(x, self.heads, axis=0).reshape(B * self.heads, T, D)

        def prepare_attention_mask(self, mask, target_length, batch_size):
            seen["prepared"] = (mask.shape, target_length, batch_size)
            return np.zeros((batch_size * self.heads, 1, target_length),
                            np.float32)

        def get_attention_scores(self, q, k, mask):
            seen["mask_shape"] = None if mask is None else mask.shape
            B_h, Q, _ = q.shape
            T = k.shape[1]
            p = np.full((B_h, Q, T), 1.0 / T, np.float32)
            return p

    rec = CrossAttnRecorder()
    proc = _RecordingProcessor(rec, "x.attn2", lambda *a, **k: None)
    hidden = np.zeros((1, 4, 8), np.float32)
    enc = np.zeros((1, 5, 8), np.float32)
    raw_mask = np.ones((1, 5), np.float32)
    proc(_Attn(), hidden, encoder_hidden_states=enc, attention_mask=raw_mask)
    assert seen["prepared"] == ((1, 5), 5, 1)
    assert seen["mask_shape"] == (1 * 2, 1, 5)


def test_capture_fn_end_to_end_with_stub_and_warp():
    """make_sd_capture_fn drives encode -> inversion -> forward capture and
    the result flows through run_cross_attention_warp to warped images."""
    pipe = _StubPipe()
    fn = make_sd_capture_fn(pipe=pipe, timesteps=(999, 700, 300),
                            num_inference_steps=3)
    # the stub's __call__ records via pipe.recorder — point it at the one
    # the capture fn's source installed on the UNet
    pipe.recorder = [p for p in pipe._procs.values()
                     if hasattr(p, "recorder")][0].recorder

    rng = np.random.default_rng(1)
    img = rng.random((64, 64, 3)).astype(np.float32)
    captured = fn(img, "a red square")
    assert set(captured.keys()) == {700, 300}
    for t, layers in captured.items():
        assert set(layers) == {"layer_a", "layer_b"}
        assert layers["layer_a"].ndim == 5

    outs, att = run_cross_attention_warp(
        img, "a red square", capture_fn=fn, top_k=3, iterations=1,
        width=48, height=48,
    )
    assert outs[-1].shape == (48, 48, 3)
    assert att.shape == (64, 64)
    assert np.isfinite(np.asarray(outs[-1])).all()
