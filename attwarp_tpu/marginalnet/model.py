"""MarginalNet in Flax.

Architecture parity with ``model/marginalnet_full_dataset/model.py:17-95``:
a FiLM-conditioned CNN over frozen MLLM visual tokens, text-pooled MLP
conditioning, and per-axis Conv1d heads emitting normalized marginal PDFs
``px: (B, W)`` and ``py: (B, H)`` through a guarded softmax.

TPU-native choices: NHWC layout (XLA's native conv layout on TPU), bf16
compute with f32 parameters (instead of CUDA AMP + GradScaler — bf16 needs no
loss scaling), and a bilinear resize with half-pixel centers (equivalent to
torch ``align_corners=False``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from attwarp_tpu.numerics.safe import safe_softmax

# The marginal-prediction grid: 24x24 = LLaVA-1.5's visual-token layout
# (576 patches). Single source of truth for training and inference.
ATTENTION_GRID = (24, 24)


class MarginalNet(nn.Module):
    hidden: int = 256
    eps: float = 1e-6
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        fmap_v: jnp.ndarray,   # (B, hv, wv, Dv) visual token map, NHWC
        out_hw: Tuple[int, int],
        txt_tok: jnp.ndarray,  # (B, Lt, Dt)
        txt_mask: jnp.ndarray, # (B, Lt, 1)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        H, W = out_hw
        cdt = self.compute_dtype
        fmap_v = fmap_v.astype(cdt)
        txt_tok = txt_tok.astype(cdt)
        txt_mask = txt_mask.astype(cdt)

        # 1) visual projection + bilinear upsample to (H, W)
        v = nn.Conv(self.hidden, (1, 1), dtype=cdt, name="proj_v1")(fmap_v)
        v = nn.silu(v)
        v = nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=cdt, name="proj_v2")(v)
        v = nn.silu(v)
        B = v.shape[0]
        v = jax.image.resize(v, (B, H, W, self.hidden), method="linear")

        # 2) masked text pooling + FiLM conditioning
        denom = jnp.clip(jnp.sum(txt_mask, axis=1), 1.0, None)  # (B, 1)
        t = jnp.sum(txt_tok * txt_mask, axis=1) / denom          # (B, Dt)
        t = nn.silu(nn.Dense(self.hidden, dtype=cdt, name="txt_pool1")(t))
        t = nn.silu(nn.Dense(self.hidden, dtype=cdt, name="txt_pool2")(t))
        gamma_beta = nn.Dense(2 * self.hidden, dtype=cdt, name="film")(t)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        v = gamma[:, None, None, :] * v + beta[:, None, None, :]

        # 3) per-axis heads: integrate out the other axis, Conv1d stack
        vx = jnp.mean(v, axis=1)  # (B, W, hidden): integrate over Y
        vy = jnp.mean(v, axis=2)  # (B, H, hidden): integrate over X
        logit_x = self._head(vx, "head_x")
        logit_y = self._head(vy, "head_y")

        px = safe_softmax(logit_x.astype(jnp.float32), axis=-1, eps=self.eps)
        py = safe_softmax(logit_y.astype(jnp.float32), axis=-1, eps=self.eps)
        return px, py

    def _head(self, x: jnp.ndarray, name: str) -> jnp.ndarray:
        """(B, L, hidden) -> (B, L) via Conv1d(k=5) -> SiLU -> Conv1d(k=1)."""
        h = nn.Conv(self.hidden, (5,), padding="SAME", dtype=self.compute_dtype, name=f"{name}_conv1")(x)
        h = nn.silu(h)
        h = nn.Conv(1, (1,), dtype=self.compute_dtype, name=f"{name}_conv2")(h)
        return jnp.squeeze(h, axis=-1)
