"""Checkpoint / resume.

Rebuilds the reference's two schemes (SURVEY §5 checkpoint/resume) as one:
a per-epoch directory ``<run_dir>/<epoch>/`` holding the component pytrees
(``node_encoder``, ``edge_encoder``, ``model``, ``decoder`` — the reference's
state_dict split at ``main.py:397-405``) plus ``best_m.json``; the previous
epoch directory is pruned. Encoder-only transfer for two-stage SSL →
supervised (``main.py:271-276``) is ``load_components`` with a subset —
missing subtrees keep their fresh init (the ``strict=False`` analogue).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

COMPONENTS = ("node_encoder", "edge_encoder", "model", "decoder")


def save_pytree(path: str, tree: Any) -> None:
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(tree)))


def _merge_loose(template: Any, loaded: Any) -> Any:
    """``strict=False`` merge: graft leaves present in both trees (by
    dict path) with matching shape onto the template; everything else
    keeps its fresh init — the analogue of the reference's
    ``load_state_dict(..., strict=False)`` encoder transfer
    (``main.py:271-276``), needed when the SSL schema carries columns the
    supervised schema doesn't (or vice versa)."""
    if isinstance(template, dict):
        if not isinstance(loaded, dict):
            return template
        return {k: (_merge_loose(v, loaded[k]) if k in loaded else v)
                for k, v in template.items()}
    if loaded is None:
        return template
    t = np.asarray(template)
    l = np.asarray(loaded)
    return loaded if t.shape == l.shape else template


def _convert_scan_layout(state: dict, tstate: dict) -> dict:
    """Bridge the fused model's two param layouts (anywhere in the tree):
    unrolled ``layer_0..layer_{N-1}`` ↔ scanned ``layers/layer`` (stacked
    leading axis). A checkpoint saved from either layout loads into a
    model built with the other — ``--scan_layers`` can change between
    pretraining and resume/transfer."""
    if not (isinstance(state, dict) and isinstance(tstate, dict)):
        return state
    from ..nn.models.fused import stack_fused_layers, unstack_fused_layers

    if "layers" in tstate and "layer_0" in state:
        n = len([k for k in state if k.startswith("layer_")])
        state = stack_fused_layers(state, n)
    elif "layer_0" in tstate and "layers" in state:
        state = unstack_fused_layers(state)
    return {k: (_convert_scan_layout(v, tstate[k]) if k in tstate else v)
            for k, v in state.items()}


def load_pytree(path: str, template: Any, strict: bool = True) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if strict:
        return serialization.from_bytes(template, data)
    try:
        return serialization.from_bytes(template, data)
    except (ValueError, KeyError):
        state = serialization.msgpack_restore(data)
        tstate = serialization.to_state_dict(template)
        state = _convert_scan_layout(state, tstate)
        merged = _merge_loose(tstate, state)
        return serialization.from_state_dict(template, merged)


def save_checkpoint(run_dir: str, epoch, variables: dict,
                    opt_state: Any = None, best_m: Any = None,
                    prune_previous: bool = True) -> str:
    """variables: {"params": ..., "batch_stats": ...} from the task wrapper.

    Components are split by top-level module name so encoders/backbone/head
    can be reloaded independently. ``epoch`` may be a string tag (the SSL
    trainers' best-metric exports ``best_acc``/``best_rmse``/``best_mrr``,
    mirroring the reference's ``<id>_acc/_rmse/_mrr.pth`` files,
    ``fused.py:737-754``); pruning only applies to integer epochs.
    """
    ck = os.path.join(run_dir, str(epoch))
    if not isinstance(epoch, int):
        prune_previous = False
    os.makedirs(ck, exist_ok=True)
    params = variables["params"]
    for comp in params:
        save_pytree(os.path.join(ck, comp), params[comp])
    extras = {k: v for k, v in variables.items() if k != "params"}
    if extras:
        save_pytree(os.path.join(ck, "extras"), extras)
    if opt_state is not None:
        save_pytree(os.path.join(ck, "opt_state"), opt_state)
    if best_m is not None:
        with open(os.path.join(ck, "best_m.json"), "w") as f:
            json.dump({"best_m": np.asarray(best_m).tolist()
                       if not isinstance(best_m, (int, float, list))
                       else best_m}, f)
    if prune_previous and epoch > 0:
        shutil.rmtree(os.path.join(run_dir, str(epoch - 1)),
                      ignore_errors=True)
    return ck


def load_components(ck_dir: str, variables: dict,
                    components: Optional[list] = None) -> dict:
    """Load a subset of component pytrees into fresh variables
    (missing/extra components are left at their initialization —
    ``strict=False`` semantics)."""
    params = dict(variables["params"])
    for comp in components or list(params.keys()):
        path = os.path.join(ck_dir, comp)
        if comp in params and os.path.exists(path):
            params[comp] = load_pytree(path, params[comp], strict=False)
    out = dict(variables)
    out["params"] = params
    extras_path = os.path.join(ck_dir, "extras")
    if os.path.exists(extras_path):
        extras = load_pytree(
            extras_path, {k: v for k, v in variables.items()
                          if k != "params"}, strict=False)
        out.update(extras)
    return out


def load_best_m(ck_dir: str):
    with open(os.path.join(ck_dir, "best_m.json")) as f:
        return json.load(f)["best_m"]


def parse_checkpoint_path(path: str) -> tuple[str, int]:
    """``<run_dir>/<epoch>/`` → (run_id, epoch) (reference resume parses
    epoch + run id out of the load path, ``main.py:195-199``)."""
    parts = [p for p in path.rstrip("/").split(os.sep) if p]
    epoch = int(parts[-1])
    run_id = parts[-2] if len(parts) > 1 else ""
    return run_id, epoch
