"""Attention-map transforms.

The reference implements these as module-level functions selected through
mutable globals (``new_method.py:134-195,378-403``) — not thread- or
vmap-safe. Here the transform is an enum carried in an immutable
``WarpParams`` pytree-compatible config; everything is a pure function, so
the warp stays jit/vmap-safe and the transform can differ per call site.

Semantics match ``new_method.py``:
- identity:  x
- square:    x**2               (inverse: sqrt(max(x, 0)))
- sqrt:      sqrt(max(x, 0))    (inverse: x**2)
- exp:       exp(scale*x)/div   (inverse: log(max(x*div, 1e-9))/scale)
- log:       log(x + 1e-5)      (inverse: exp(x) - 1e-5)
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class Transform(str, enum.Enum):
    IDENTITY = "identity"
    SQUARE = "square"
    SQRT = "sqrt"
    EXP = "exp"
    LOG = "log"

    @classmethod
    def from_name(cls, name: str) -> "Transform":
        """Resolve a transform by name; unknown names fall back to identity
        (matching ``set_transform_function``, new_method.py:398-401)."""
        try:
            return cls(str(name).lower())
        except ValueError:
            return cls.IDENTITY


@dataclasses.dataclass(frozen=True)
class WarpParams:
    """Static configuration for one warp invocation (hashable: safe as a jit
    static argument)."""

    transform: Transform = Transform.IDENTITY
    exp_scale: float = 1.0
    exp_divisor: float = 1.0
    # "apply transform, take marginal, apply inverse" workflow
    # (new_method.py:162-163,219-226)
    apply_inverse_to_marginals: bool = False


def apply_transform(x: jnp.ndarray, params: WarpParams) -> jnp.ndarray:
    t = params.transform
    if t is Transform.IDENTITY:
        return x
    if t is Transform.SQUARE:
        return x * x
    if t is Transform.SQRT:
        return jnp.sqrt(jnp.clip(x, 0.0, None))
    if t is Transform.EXP:
        return jnp.exp(params.exp_scale * x) / params.exp_divisor
    if t is Transform.LOG:
        return jnp.log(x + 1e-5)
    raise ValueError(f"unknown transform {t!r}")


def apply_inverse_transform(x: jnp.ndarray, params: WarpParams) -> jnp.ndarray:
    t = params.transform
    if t is Transform.IDENTITY:
        return x
    if t is Transform.SQUARE:
        return jnp.sqrt(jnp.clip(x, 0.0, None))
    if t is Transform.SQRT:
        return x * x
    if t is Transform.EXP:
        return jnp.log(jnp.clip(x * params.exp_divisor, 1e-9, None)) / params.exp_scale
    if t is Transform.LOG:
        return jnp.exp(x) - 1e-5
    raise ValueError(f"unknown transform {t!r}")
