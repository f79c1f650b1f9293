"""Mixed-precision helpers (``--precision bf16``).

TPU MXUs natively multiply bf16 at 2× the f32 issue rate and halve the
HBM traffic of every gather/matmul operand. The scheme here is the
standard one: **f32 master params** (the optimizer state and updates stay
f32), a bf16 cast of params + feature tables + batch floats at the top of
the forward, bf16 activations throughout, and f32 losses/metrics (model
outputs are cast back up before the loss). bf16 shares f32's exponent
range, so no loss scaling is needed (unlike fp16).

Norm layers compute their statistics in f32 regardless (see
``nn/norms.py``) — mean/variance of bf16 activations in bf16 loses too
much precision at production batch sizes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast floating-point leaves of a pytree to ``dtype`` (ints, bools
    and None pass through)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def compute_cast(tree, precision: str):
    """Cast a pytree to the compute dtype for ``precision`` ("bf16" →
    bfloat16 floats; "f32" → identity). Used at the top of train/eval
    steps on params and inputs; the cast is traced, so ``jax.grad`` of
    f32 master params through it yields f32 gradients."""
    if precision == "bf16":
        return cast_floats(tree, jnp.bfloat16)
    return tree


def out_f32(tree):
    """Cast model outputs back to f32 before losses/metrics."""
    return cast_floats(tree, jnp.float32)


def bf16_apply(apply_fn, params, *args, **kwargs):
    """Run ``apply_fn`` with bf16 params/inputs, return f32 outputs
    (the serving/bench forward path)."""
    params16 = cast_floats(params, jnp.bfloat16)
    args16 = cast_floats(args, jnp.bfloat16)
    out = apply_fn(params16, *args16, **kwargs)
    return cast_floats(out, jnp.float32)
