"""Stable-Diffusion cross-attention capture for the C26 ablation.

The diffusers-side half of ``warp/cross_attention.py``: everything between
"load a pipeline" and "hand ``run_cross_attention_warp`` a captured-map
dict". Behavior parity with ``Ablations/Stable_diffusion_based_warp.py``
(image->latent :233-244, prompt->embeddings :249-262, truncated DDIM
inversion :264-287, denoise-and-record :292-305), re-expressed in this
repo's idiom: one ``DiffusionAttnSource`` object owns the pipeline and the
recorder, the inversion is a fold of a pure per-step ``_renoise`` over
consecutive noise levels, and the recording processors replace the
third-party ``attention_map_diffusers`` hooks.

Captured-map convention (what ``cross_attention.py`` consumes):
``{timestep: {layer_key: (B, heads, H, W, tokens)}}``.

Everything is duck-typed against the diffusers pipeline surface
(``vae.encode``, ``tokenizer``, ``text_encoder``, ``unet``, ``scheduler``),
so the orchestration is fully exercised by the stub pipeline in
``tests/test_sd_capture.py``; the real ``DiffusionPipeline`` import happens
only inside ``load_sd_pipeline`` (diffusers and SD weights are absent in a
zero-egress environment — that load is the only part this repo cannot run).
All math uses operator arithmetic (``** 0.5``, ``*``), so torch tensors and
NumPy arrays both work.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np

DEFAULT_TIMESTEPS: tuple = (999, 800, 600, 400, 200)


def load_sd_pipeline(model_id: str = "stabilityai/stable-diffusion-2-1",
                     device: str = "cpu"):
    """Load a diffusers pipeline with a DDIM scheduler (ref :218-230).
    Requires diffusers + downloaded weights; everything downstream accepts
    any duck-typed equivalent."""
    from diffusers import DDIMScheduler, DiffusionPipeline  # gated import

    sched = DDIMScheduler.from_pretrained(model_id, subfolder="scheduler")
    pipe = DiffusionPipeline.from_pretrained(model_id, scheduler=sched)
    return pipe.to(device)


def _as_pipe_tensor(x: np.ndarray, pipe):
    """Hand a NumPy batch to whatever array type the pipe's VAE expects."""
    if hasattr(pipe, "to_tensor"):
        return pipe.to_tensor(x)
    try:
        import torch
    except ImportError:
        return x
    t = torch.from_numpy(np.ascontiguousarray(x))
    dtype = getattr(pipe.vae, "dtype", None)
    device = getattr(pipe, "device", None)
    if dtype is not None:
        t = t.to(dtype)
    if device is not None:
        t = t.to(device)
    return t


def _renoise(scheduler, z, eps, level_from: int, level_to: int):
    """One truncated-DDIM-inversion step.

    Strip the noise ``eps`` predicted at ``level_from`` to get the clean
    estimate, then deterministically re-noise that estimate to
    ``level_to`` — the z_t = sqrt(a_t)·x0 + sqrt(1-a_t)·eps recurrence the
    reference walks (behavior parity with
    Stable_diffusion_based_warp.py:264-287)."""
    keep_from = float(scheduler.alphas_cumprod[level_from])
    keep_to = float(scheduler.alphas_cumprod[level_to])
    clean = (z - ((1.0 - keep_from) ** 0.5) * eps) * (keep_from ** -0.5)
    return (keep_to ** 0.5) * clean + ((1.0 - keep_to) ** 0.5) * eps


class CrossAttnRecorder:
    """Record cross-attention probabilities from a diffusers UNet.

    ``install(unet)`` swaps every "attn2" (cross-attention) processor for a
    recording wrapper; recorded maps land in ``self.maps`` under the current
    ``self.timestep`` as (B, heads, H, W, tokens) arrays — the captured-map
    convention ``cross_attention.py`` consumes. ``record(layer_key, probs,
    spatial)`` is also callable directly, which is how both the stub tests
    and any custom pipeline integrate without diffusers."""

    def __init__(self):
        self.maps: Dict[int, Dict[str, Any]] = {}
        self.timestep: int = 0

    def clear(self):
        self.maps.clear()

    def record(self, layer_key: str, probs, spatial: Optional[tuple] = None):
        """``probs``: (B, heads, Q, tokens) attention probabilities (or
        already (B, heads, H, W, tokens)); Q must be H*W when ``spatial`` is
        given, else a square grid is inferred."""
        p = np.asarray(probs, np.float32)
        if p.ndim == 4:
            B, heads, Q, T = p.shape
            if spatial is None:
                side = int(round(Q ** 0.5))
                if side * side != Q:
                    raise ValueError(f"non-square Q={Q}; pass spatial=(H, W)")
                spatial = (side, side)
            p = p.reshape(B, heads, spatial[0], spatial[1], T)
        self.maps.setdefault(int(self.timestep), {})[layer_key] = p

    def install(self, unet) -> int:
        """Swap cross-attn processors (diffusers ``attn_processors`` dict
        API); returns how many were wrapped."""
        procs = dict(unet.attn_processors)
        n = 0
        for name, proc in procs.items():
            if "attn2" not in name:
                continue
            procs[name] = _RecordingProcessor(self, name, proc)
            n += 1
        unet.set_attn_processor(procs)
        return n


class _RecordingProcessor:
    """diffusers AttnProcessor wrapper: compute probs like the default
    processor, hand them to the recorder, then delegate."""

    def __init__(self, recorder: CrossAttnRecorder, name: str, inner):
        self.recorder = recorder
        self.name = name
        self.inner = inner

    def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                 attention_mask=None, **kw):
        if encoder_hidden_states is not None:  # cross-attention only
            batch = hidden_states.shape[0]
            q = attn.to_q(hidden_states)
            k = attn.to_k(encoder_hidden_states)
            q = attn.head_to_batch_dim(q)
            k = attn.head_to_batch_dim(k)
            mask = attention_mask
            # A raw (B, T) mask must be broadcast to (B*heads, Q, T) before
            # get_attention_scores, exactly as diffusers' default
            # AttnProcessor does via prepare_attention_mask.
            if mask is not None and hasattr(attn, "prepare_attention_mask"):
                mask = attn.prepare_attention_mask(
                    mask, encoder_hidden_states.shape[1], batch)
            probs = attn.get_attention_scores(q, k, mask)
            B_h, Q, T = probs.shape
            heads = attn.heads
            p = probs.reshape(B_h // heads, heads, Q, T)
            self.recorder.record(self.name, _to_numpy(p))
        return self.inner(attn, hidden_states,
                          encoder_hidden_states=encoder_hidden_states,
                          attention_mask=attention_mask, **kw)


def _to_numpy(t) -> np.ndarray:
    try:
        return t.detach().float().cpu().numpy()
    except AttributeError:
        return np.asarray(t, np.float32)


class DiffusionAttnSource:
    """An attention source backed by a (duck-typed) diffusers pipeline.

    Owns the pipeline and a ``CrossAttnRecorder`` installed on its UNet.
    ``capture(image, prompt)`` runs image->latent, prompt->embeddings, the
    truncated DDIM inversion ladder, then one forward denoise per inversion
    snapshot with the recorder active — and returns the captured maps.
    Behavior parity with Stable_diffusion_based_warp.py:233-305."""

    def __init__(self, pipe, timesteps: Sequence[int] = DEFAULT_TIMESTEPS,
                 num_inference_steps: int = 10, latent_size: int = 768):
        if not hasattr(pipe, "unet_eps"):
            pipe.unet_eps = _diffusers_eps_fn(pipe)
        self.pipe = pipe
        self.timesteps = tuple(timesteps)
        self.num_inference_steps = int(num_inference_steps)
        self.latent_size = int(latent_size)
        self.recorder = CrossAttnRecorder()
        self.recorder.install(pipe.unet)

    def image_latent(self, image: np.ndarray):
        """(H, W, 3) float [0,1] or uint8 -> scaled VAE latent z0."""
        from attwarp_tpu.warp.blend import resize_cubic
        import jax.numpy as jnp

        chw = np.asarray(image, np.float32)
        if chw.max() > 1.5:  # uint8 / [0, 255] input
            chw = chw / 255.0
        chw = jnp.asarray(chw.transpose(2, 0, 1), jnp.float32)
        sized = np.asarray(resize_cubic(chw, (self.latent_size,) * 2))
        batch = _as_pipe_tensor(sized[None] * 2.0 - 1.0, self.pipe)
        posterior = self.pipe.vae.encode(batch).latent_dist
        return posterior.sample() * self.pipe.vae.config.scaling_factor

    def prompt_embeddings(self, prompt: str):
        """Prompt -> (last_hidden_state, input_ids) via the pipe's CLIP
        text encoder, padded to the tokenizer's model max length."""
        tk = self.pipe.tokenizer
        batch = tk(prompt, padding="max_length", truncation=True,
                   max_length=tk.model_max_length, return_tensors="pt")
        hidden = self.pipe.text_encoder(
            batch.input_ids, attention_mask=batch.attention_mask
        ).last_hidden_state
        return hidden, batch.input_ids

    def _noise_levels(self) -> list:
        """Requested timesteps clamped into the scheduler's trained range."""
        horizon = self.pipe.scheduler.config.num_train_timesteps - 1
        return [max(0, min(horizon, int(t))) for t in self.timesteps]

    def invert(self, z0, text_embeds) -> Dict[int, Any]:
        """Truncated DDIM inversion: fold ``_renoise`` over consecutive
        noise-level pairs, snapshotting the latent at each target level.
        Returns ``{level: z_level}`` (the first level seeds the walk and has
        no snapshot, matching the reference)."""
        levels = self._noise_levels()
        snapshots: Dict[int, Any] = {}
        z = z0
        for level_from, level_to in zip(levels, levels[1:]):
            eps = self.pipe.unet_eps(z, level_from, text_embeds)
            z = _renoise(self.pipe.scheduler, z, eps, level_from, level_to)
            snapshots[level_to] = z
        return snapshots

    def denoise_and_record(self, snapshots: Dict[int, Any],
                           prompt: str) -> Dict[int, Dict[str, Any]]:
        """One forward denoise per inversion snapshot, with the recording
        processors filing maps under that snapshot's timestep."""
        self.recorder.clear()
        for level, z in snapshots.items():
            self.recorder.timestep = int(level)
            self.pipe(prompt=[prompt], negative_prompt=[""],
                      num_inference_steps=self.num_inference_steps,
                      latents=z, output_type="latent")
        return self.recorder.maps

    def capture(self, image: np.ndarray, prompt: str) -> Dict:
        """The ``capture_fn(image, prompt)`` contract of
        ``run_cross_attention_warp``."""
        z0 = self.image_latent(image)
        embeds, _ids = self.prompt_embeddings(prompt)
        return self.denoise_and_record(self.invert(z0, embeds), prompt)


def _diffusers_eps_fn(pipe) -> Callable:
    """Adapt a real diffusers pipeline to the ``unet_eps(z, t, emb)``
    surface the inversion fold calls."""
    def unet_eps(z, t, emb):
        import torch

        return pipe.unet(
            z, torch.tensor([t], device=pipe.device),
            encoder_hidden_states=emb,
        ).sample

    return unet_eps


def make_sd_capture_fn(
    pipe=None,
    model_id: str = "stabilityai/stable-diffusion-2-1",
    timesteps: Sequence[int] = DEFAULT_TIMESTEPS,
    num_inference_steps: int = 10,
) -> Callable[[np.ndarray, str], Dict]:
    """Build the ``capture_fn(image, prompt)`` for
    ``run_cross_attention_warp``. Pass a (stub or real) ``pipe`` to skip the
    diffusers load; the returned callable is the bound ``capture`` of a
    ``DiffusionAttnSource`` whose recorder is installed on the pipe's
    UNet."""
    if pipe is None:
        pipe = load_sd_pipeline(model_id)
    return DiffusionAttnSource(
        pipe, timesteps=timesteps, num_inference_steps=num_inference_steps
    ).capture
