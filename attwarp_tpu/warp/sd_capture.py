"""Stable-Diffusion cross-attention capture for the C26 ablation.

The diffusers-side half of ``warp/cross_attention.py``: everything between
"load a pipeline" and "hand ``run_cross_attention_warp`` a captured-map
dict". Mirrors ``Ablations/Stable_diffusion_based_warp.py`` behavior:

- ``encode_image``        (ref :233-244): 768px resize, [-1, 1] normalize,
  VAE-encode, scale by the VAE's scaling factor.
- ``truncated_ddim_inversion`` (ref :264-287): the DDIM inversion
  recurrence z_t = sqrt(a_t)·x0 + sqrt(1-a_t)·eps with
  x0 = (z - sqrt(1-a_prev)·eps)/sqrt(a_prev), snapshotting z at each
  clamped timestep.
- ``CrossAttnRecorder``: replaces the third-party
  ``attention_map_diffusers`` hooks — swaps the UNet's cross-attention
  ("attn2") processors for recording processors and accumulates maps in the
  captured dict convention ``{timestep: {layer_key: (B, heads, H, W,
  tokens)}}``.
- ``make_sd_capture_fn``: assembles the above into the ``capture_fn(image,
  prompt)`` that ``run_cross_attention_warp`` consumes.

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

from typing import Any, Callable, Dict, List, Optional, Sequence

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


def encode_image(pipe, image: np.ndarray, size: int = 768):
    """(H, W, 3) float [0,1] or uint8 -> scaled latent z0 (ref :233-244)."""
    from attwarp_tpu.warp.blend import resize_cubic
    import jax.numpy as jnp

    img = np.asarray(image, np.float32)
    if img.max() > 1.5:        # uint8 / [0,255] input
        img = img / 255.0
    cf = jnp.asarray(img.transpose(2, 0, 1), jnp.float32)       # (3, H, W)
    img = np.asarray(resize_cubic(cf, (size, size)))            # (3, S, S)
    x = (img * 2.0 - 1.0)[None]                                 # (1, 3, S, S)
    x = pipe.to_tensor(x) if hasattr(pipe, "to_tensor") else _torch_from(x, pipe)
    dist = pipe.vae.encode(x).latent_dist
    return dist.sample() * pipe.vae.config.scaling_factor


def _torch_from(x: np.ndarray, pipe):
    try:
        import torch

        t = torch.from_numpy(np.ascontiguousarray(x))
        dtype = getattr(pipe.vae, "dtype", None)
        device = getattr(pipe, "device", None)
        if dtype is not None:
            t = t.to(dtype)
        if device is not None:
            t = t.to(device)
        return t
    except ImportError:
        return x


def get_text_embeddings(pipe, prompt: str):
    """Prompt -> (last_hidden_state, input_ids) (ref :249-262)."""
    toks = pipe.tokenizer(
        prompt, padding="max_length", truncation=True,
        max_length=pipe.tokenizer.model_max_length, return_tensors="pt",
    )
    emb = pipe.text_encoder(
        toks.input_ids, attention_mask=toks.attention_mask
    ).last_hidden_state
    return emb, toks.input_ids


def truncated_ddim_inversion(
    pipe, latents, text_embeds, timesteps: Sequence[int] = DEFAULT_TIMESTEPS,
) -> Dict[int, Any]:
    """Reference :264-287 exactly: clamp timesteps to [0, T_train-1], walk
    prev_t -> t pairs, predict eps at prev_t, reconstruct x0, renoise to t,
    snapshot. Returns {t: z_t}."""
    sched = pipe.scheduler
    max_t = sched.config.num_train_timesteps - 1
    ts = [min(max(int(t), 0), max_t) for t in timesteps]
    inv: Dict[int, Any] = {}
    z = latents
    for prev_t, t in zip(ts[:-1], ts[1:]):
        eps = pipe.unet_eps(z, prev_t, text_embeds)
        a_prev = float(sched.alphas_cumprod[prev_t])
        a = float(sched.alphas_cumprod[t])
        x0 = (z - ((1.0 - a_prev) ** 0.5) * eps) / (a_prev ** 0.5)
        z = (a ** 0.5) * x0 + ((1.0 - a) ** 0.5) * eps
        inv[t] = z
    return inv


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
            q = attn.to_q(hidden_states)
            k = attn.to_k(encoder_hidden_states)
            q = attn.head_to_batch_dim(q)
            k = attn.head_to_batch_dim(k)
            probs = attn.get_attention_scores(q, k, attention_mask)
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


def forward_and_capture(
    pipe, recorder: CrossAttnRecorder, inv_latents: Dict[int, Any],
    prompt: str, num_inference_steps: int = 10,
) -> Dict[int, Dict[str, Any]]:
    """Reference :292-305: clear, then one forward denoise per inversion
    snapshot with the hooks recording under that snapshot's timestep."""
    recorder.clear()
    for t, z in inv_latents.items():
        recorder.timestep = int(t)
        pipe(prompt=[prompt], negative_prompt=[""],
             num_inference_steps=num_inference_steps, latents=z,
             output_type="latent")
    return recorder.maps


def make_sd_capture_fn(
    pipe=None,
    model_id: str = "stabilityai/stable-diffusion-2-1",
    timesteps: Sequence[int] = DEFAULT_TIMESTEPS,
    num_inference_steps: int = 10,
) -> Callable[[np.ndarray, str], Dict]:
    """Build the ``capture_fn(image, prompt)`` for
    ``run_cross_attention_warp``. Pass a (stub or real) ``pipe`` to skip the
    diffusers load; the returned callable owns a ``CrossAttnRecorder``
    installed on the pipe's UNet."""
    if pipe is None:
        pipe = load_sd_pipeline(model_id)
    if not hasattr(pipe, "unet_eps"):
        # real diffusers pipeline: adapt the UNet call (ref :276-281)
        def unet_eps(z, t, emb, _pipe=pipe):
            import torch

            return _pipe.unet(
                z, torch.tensor([t], device=_pipe.device),
                encoder_hidden_states=emb,
            ).sample

        pipe.unet_eps = unet_eps
    recorder = CrossAttnRecorder()
    recorder.install(pipe.unet)

    def capture(image: np.ndarray, prompt: str) -> Dict:
        z0 = encode_image(pipe, image)
        emb, _ids = get_text_embeddings(pipe, prompt)
        inv = truncated_ddim_inversion(pipe, z0, emb, timesteps)
        return forward_and_capture(pipe, recorder, inv, prompt,
                                   num_inference_steps)

    return capture
