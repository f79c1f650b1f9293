"""Tabular-only self-supervised (MCM) trainer — no graph in the loop.

Rebuilds ``fttransformer.py`` (MCM pretraining of a pure FTTransformer on
edge tables) with the *intended* contract the reference's committed script
broke (SURVEY §3.3: ``model(tf)`` vs pre-encoded ``forward(x)`` mismatch):
encoder → FTTransformerConvs backbone → SelfSupervisedHead, composed once,
fully jitted. The whole TensorFrame batch moves to device as column
tensors; loss stays on device (the reference pulled predictions back to
CPU every step, ``fttransformer.py:272-275``).
"""
from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..frame.loader import DataLoader
from ..nn.decoders import SelfSupervisedHead, SelfSupervisedMVHead
from ..nn.encoders import make_stypewise_encoder
from ..nn.models import FTTransformer
from ..utils.config import Config
from ..utils.loss import SSLoss
from ..utils.metric import MCMAccumulator
from .pretrain import adamw_no_decay_groups

logger = logging.getLogger(__name__)


class TabularMCMTrainer:
    def __init__(self, cfg: Config, edges, mask_vector: bool = False):
        """edges: a materialized EdgeTable with MASK pretrain target.
        ``mask_vector=True`` adds the VIME-style mask-vector head + loss
        (the reference's MASK_VECTOR pretrain type, util/mask.py:22,
        SelfSupervisedMVHead)."""
        self.cfg = cfg
        self.edges = edges
        self.mask_vector = mask_vector
        self.encoder = make_stypewise_encoder(edges, cfg.n_hidden)
        self.model = FTTransformer(cfg.n_hidden, cfg.n_gnn_layers,
                                   dropout=cfg.dropout)
        head_cls = SelfSupervisedMVHead if mask_vector else SelfSupervisedHead
        self.head = head_cls(
            cfg.n_hidden, len(edges.masked_numerical_columns),
            tuple(edges.masked_categorical_cardinalities()))
        self.ssloss = SSLoss(len(edges.masked_numerical_columns))

        key = jax.random.PRNGKey(cfg.seed)
        self.rng, k1, k2, k3 = jax.random.split(key, 4)
        tf0 = edges.tensor_frame[np.arange(min(4, edges.tensor_frame
                                               .num_rows))]
        params = {"encoder": self.encoder.init(k1, tf0)}
        ncols = edges.tensor_frame.num_cols
        params["model"] = self.model.init(
            k2, jnp.zeros((4, ncols, cfg.n_hidden)))
        params["head"] = self.head.init(k3, jnp.zeros((4, cfg.n_hidden)))
        self.params = params
        self.tx = adamw_no_decay_groups(cfg.lr, cfg.weight_decay,
                                        cfg.adam_eps)
        self.opt_state = self.tx.init(self.params)
        self._train_step = jax.jit(self._step)
        self._eval_step = jax.jit(self._fwd)

    def _fwd(self, params, tf, rng=None, train: bool = False):
        from ..utils.precision import compute_cast

        # --precision bf16: bf16 compute, f32 master params / losses
        params = compute_cast(params, self.cfg.precision)
        tf = compute_cast(tf, self.cfg.precision)
        tokens, _ = self.encoder.apply(params["encoder"], tf)
        rngs = {"dropout": rng} if train else {}
        _, x_cls = self.model.apply(params["model"], tokens, not train,
                                    rngs=rngs)
        from ..utils.precision import out_f32

        if self.mask_vector:
            num_out, cat_out, mv_out = self.head.apply(params["head"], x_cls)
            return out_f32((num_out, cat_out, mv_out))
        num_out, cat_out = self.head.apply(params["head"], x_cls)
        return out_f32((num_out, cat_out, None))

    def _step(self, params, opt_state, tf, seed_mask, rng):
        def loss_fn(p):
            num_out, cat_out, mv_out = self._fwd(p, tf, rng, True)
            total, (cl, tc, acc), (nl, tn) = self.ssloss.mcm_loss(
                cat_out, num_out, tf.y, valid_mask=seed_mask)
            if mv_out is not None:
                total = total + self.ssloss.mv_loss(mv_out, tf.y, seed_mask)
            return total, {"loss_c": cl, "t_c": tc, "acc": acc,
                           "loss_n": nl, "t_n": tn}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    def _loader(self, view, shuffle, epoch: int = 0):
        from ..utils.seeding import mix_seed

        return DataLoader(view.tensor_frame, self.cfg.batch_size,
                          shuffle=shuffle,
                          seed=mix_seed(self.cfg.seed, epoch))

    def train_epoch(self, view, epoch: int) -> dict:
        t0 = time.time()
        tot = cnt = 0.0
        agg = {"loss_c": 0.0, "t_c": 0, "acc": 0.0, "loss_n": 0.0, "t_n": 0}
        for tf, valid in self._loader(view, True, epoch):
            mask = np.zeros(self.cfg.batch_size, bool)
            mask[:valid] = True
            self.rng, k = jax.random.split(self.rng)
            self.params, self.opt_state, loss, aux = self._train_step(
                self.params, self.opt_state, tf, mask, k)
            tot += float(loss)
            cnt += 1
            for key in agg:
                agg[key] += float(aux[key])
        return {"loss": tot / max(cnt, 1),
                "train_acc": agg["acc"] / max(agg["t_c"], 1),
                "train_rmse": float(np.sqrt(agg["loss_n"]
                                            / max(agg["t_n"], 1))),
                "sec": time.time() - t0}

    def evaluate(self, view) -> dict:
        from ..utils.metric import SSMetric

        acc = MCMAccumulator(self.ssloss.num_numerical)
        mv_accs = []
        for tf, valid in self._loader(view, False):
            num_out, cat_out, mv_out = self._eval_step(self.params, tf)
            acc.update(cat_out, num_out, np.asarray(tf.y), valid)
            if mv_out is not None:
                ssm = SSMetric(self.ssloss.num_numerical)
                mv_accs.append(ssm.mv_accuracy(
                    np.asarray(mv_out)[:valid], np.asarray(tf.y)[:valid]))
        out = {"accuracy": acc.accuracy, "rmse": acc.rmse}
        if mv_accs:
            out["mv_accuracy"] = float(np.mean(mv_accs))
        return out

    # -- checkpoint / resume / export ----------------------------------
    # Reference scheme: ``run_<id>_epoch_<e>.pth`` files + best-metric
    # weight files (``fttransformer.py`` shares ``fused.py:420-446,737-754``).
    # Encoder params are saved under ``edge_encoder`` so the supervised
    # CLI's encoder transfer (``cli/main.py --load_model``) can load them.
    def save(self, run_dir: str, epoch, best: dict = None,
             with_opt: bool = True) -> str:
        from ..utils.checkpoint import save_checkpoint

        variables = {"params": {
            "edge_encoder": self.params["encoder"]["params"],
            "model": self.params["model"]["params"],
            "head": self.params["head"]["params"],
        }}
        ck = save_checkpoint(run_dir, epoch, variables,
                             self.opt_state if with_opt else None, None,
                             backend=getattr(self.cfg, "ckpt_backend",
                                             "msgpack"))
        if best is not None:
            import json
            import os

            with open(os.path.join(ck, "best_m.json"), "w") as f:
                json.dump({"best_m": best}, f)
        return ck

    def restore(self, ck_dir: str, with_opt: bool = True) -> dict:
        import os

        from ..utils.checkpoint import load_pytree

        p = dict(self.params)
        for name, comp in (("encoder", "edge_encoder"), ("model", "model"),
                           ("head", "head")):
            path = os.path.join(ck_dir, comp)
            if os.path.exists(path):
                v = dict(p[name])
                v["params"] = load_pytree(path, v["params"])
                p[name] = v
        self.params = p
        opt = os.path.join(ck_dir, "opt_state")
        if with_opt and os.path.exists(opt):
            self.opt_state = load_pytree(opt, self.opt_state)
        best = {"accuracy": -1.0, "rmse": float("inf")}
        bj = os.path.join(ck_dir, "best_m.json")
        if os.path.exists(bj):
            import json

            with open(bj) as f:
                best.update(json.load(f)["best_m"])
        return best

    def fit(self, run_logger=None, run_dir: str = None,
            start_epoch: int = 0, best: dict = None):
        tr, va, te = self.edges.split()
        history = []
        if best is None:
            best = {"accuracy": -1.0, "rmse": float("inf")}
        for epoch in range(start_epoch, start_epoch + self.cfg.epochs):
            tm = self.train_epoch(tr, epoch)
            vm = self.evaluate(va)
            rec = {"epoch": epoch, **tm,
                   **{f"val_{k}": v for k, v in vm.items()}}
            improved = []
            if vm["accuracy"] > best["accuracy"]:
                best["accuracy"] = vm["accuracy"]
                improved.append("acc")
            if vm["rmse"] < best["rmse"]:
                best["rmse"] = vm["rmse"]
                improved.append("rmse")
            logger.info(str(rec))
            if run_logger is not None:
                run_logger.log(rec, step=epoch)
            if run_dir is not None:
                self.save(run_dir, epoch, best)
                for k in improved:
                    self.save(run_dir, f"best_{k}", best, with_opt=False)
            history.append(rec)
        from ..utils.checkpoint import wait_for_saves
        wait_for_saves()
        return history, best
