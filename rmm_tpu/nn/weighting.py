"""MoCo multi-objective gradient weighting, as pure JAX state transforms.

Rebuilds ``src/nn/weighting/MoCo.py`` (LibMTL-derived: momentum-tracked
per-task gradient directions ``y``, softmax-updated simplex weights ``λ``).
The reference flattens ``.grad`` buffers over shared params and writes the
combined gradient back (``MoCo.py:156-176``); in JAX the per-task gradients
come straight from ``jax.grad`` as pytrees, so the whole update jits —
no buffer surgery, no retain_graph double-backward (SURVEY §7 item 6).

Update rule (``MoCo.py:158-174``), per step t:
    g_k   = ∇L_k / (‖∇L_k‖ + 1e-8) · L_k
    y     ← y − (β/t^βσ) (y − g)
    λ     ← softmax(λ − (γ/t^γσ) (y yᵀ + ρ I) λ)
    grad  = yᵀ λ
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MoCoState:
    y: Any          # [task_num, grad_dim]
    lambd: Any      # [task_num]
    step: Any       # scalar int32

    def tree_flatten(self):
        return (self.y, self.lambd, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_moco(task_num: int, params) -> MoCoState:
    flat, _ = jax.flatten_util.ravel_pytree(params)
    return MoCoState(
        y=jnp.zeros((task_num, flat.shape[0])),
        lambd=jnp.ones((task_num,)) / task_num,
        step=jnp.zeros((), jnp.int32),
    )


def moco_combine(state: MoCoState, task_grads: Sequence[Any],
                 task_losses: Sequence[Any], params,
                 beta: float = 0.999, beta_sigma: float = 0.1,
                 gamma: float = 0.999, gamma_sigma: float = 0.1,
                 rho: float = 0.05):
    """Combine per-task grad pytrees into one; returns (combined_grads,
    new_state, lambd)."""
    flat0, unravel = jax.flatten_util.ravel_pytree(params)
    step = state.step + 1
    g = []
    for grads, loss in zip(task_grads, task_losses):
        v, _ = jax.flatten_util.ravel_pytree(grads)
        g.append(v / (jnp.linalg.norm(v) + 1e-8) * loss)
    g = jnp.stack(g)                                     # [K, P]
    t = step.astype(jnp.float32)
    y = state.y - (beta / t**beta_sigma) * (state.y - g)
    K = y.shape[0]
    m = y @ y.T + rho * jnp.eye(K)
    lambd = jax.nn.softmax(
        state.lambd - (gamma / t**gamma_sigma) * (m @ state.lambd), -1)
    combined = y.T @ lambd                               # [P]
    return unravel(combined), MoCoState(y=y, lambd=lambd, step=step), lambd
