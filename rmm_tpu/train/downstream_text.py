"""Text+tabular downstream trainer (regression on review ratings).

Rebuilds ``downstream_model_LLM.py``: FTTransformer over AmazonFashion with
two text paths — frozen precomputed embeddings (``text_embedded`` →
LinearEmbeddingEncoder) or a trainable text encoder inside the forward pass
(``text_tokenized`` → LinearModelEncoder wrapping
:class:`~rmm_tpu.nn.text.TextToEmbeddingFinetune`, optionally LoRA). Loss is
MSE, metric RMSE (``downstream_model_LLM.py:123``); per-phase wall-clock
timers keep the reference's metric names (data_load / transfer / forward /
loss / backward → here data_load / transfer / step, since
forward+loss+backward fuse into one device program).
"""
from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..frame.loader import DataLoader
from ..nn.decoders import SupervisedHead
from ..nn.encoders import make_stypewise_encoder
from ..nn.models import FTTransformer
from ..nn.text import TextToEmbeddingFinetune
from ..utils.config import Config

logger = logging.getLogger(__name__)


class TextTabularRegressionTrainer:
    def __init__(self, cfg: Config, dataset, finetune_text: bool = False,
                 lora_rank: int = 8, text_module=None, text_model_dim: int = 0):
        """``text_module``: an optional pre-built text encoder module (e.g.
        :func:`rmm_tpu.nn.text.pretrained_text_model` — frozen cached HF LM
        + trainable LoRA); default is the from-scratch flax LM."""
        self.cfg = cfg
        self.dataset = dataset
        edges = dataset.edges
        text_model = None
        model_dim = 0
        if finetune_text:
            if text_module is not None:
                text_model = text_module
                model_dim = text_model_dim
            else:
                text_model = TextToEmbeddingFinetune(
                    hidden=cfg.n_hidden, num_layers=1, lora_rank=lora_rank)
                model_dim = cfg.n_hidden
        self.encoder = make_stypewise_encoder(
            edges, cfg.n_hidden, text_model=text_model, model_dim=model_dim)
        self.model = FTTransformer(cfg.n_hidden, cfg.n_gnn_layers,
                                   dropout=cfg.dropout)
        self.head = SupervisedHead(cfg.n_hidden, 1)

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
        self.tx = optax.adamw(cfg.lr, eps=cfg.adam_eps,
                              weight_decay=cfg.weight_decay)
        self.opt_state = self.tx.init(self.params)
        self._train_step = jax.jit(self._step)
        self._eval_step = jax.jit(self._fwd)

    def _fwd(self, params, tf, rng=None, train: bool = False):
        from ..utils.precision import compute_cast, out_f32

        # --precision bf16: bf16 compute, f32 master params / losses
        params = compute_cast(params, self.cfg.precision)
        tf = compute_cast(tf, self.cfg.precision)
        rngs = {"dropout": rng} if train else {}
        tokens, _ = self.encoder.apply(params["encoder"], tf, rngs=rngs)
        _, x_cls = self.model.apply(params["model"], tokens, not train,
                                    rngs=rngs)
        return out_f32(self.head.apply(params["head"], x_cls)[:, 0])

    def _step(self, params, opt_state, tf, mask, rng):
        def loss_fn(p):
            pred = self._fwd(p, tf, rng, True)
            m = mask.astype(jnp.float32)
            err = (pred - tf.y[:, 0]) ** 2 * m
            return err.sum() / jnp.maximum(m.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def train_epoch(self, view, epoch: int) -> dict:
        cfg = self.cfg
        timers = {"data_load": 0.0, "transfer": 0.0, "step": 0.0}
        tot = cnt = 0.0
        loader = DataLoader(view.tensor_frame, cfg.batch_size, shuffle=True,
                            seed=cfg.seed)
        t_last = time.time()
        for tf, valid in loader:
            timers["data_load"] += time.time() - t_last
            t0 = time.time()
            tf = jax.device_put(tf)
            timers["transfer"] += time.time() - t0
            mask = np.zeros(cfg.batch_size, bool)
            mask[:valid] = True
            self.rng, k = jax.random.split(self.rng)
            t0 = time.time()
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, tf, mask, k)
            loss = float(loss)
            timers["step"] += time.time() - t0
            tot += loss
            cnt += 1
            t_last = time.time()
        return {"loss": tot / max(cnt, 1), **timers}

    def evaluate(self, view) -> float:
        cfg = self.cfg
        se = n = 0.0
        for tf, valid in DataLoader(view.tensor_frame, cfg.batch_size,
                                    shuffle=False):
            pred = np.asarray(self._eval_step(self.params, tf))[:valid]
            y = np.asarray(tf.y[:valid, 0])
            se += float(((pred - y) ** 2).sum())
            n += valid
        return float(np.sqrt(se / max(n, 1)))

    def fit(self, run_logger=None):
        tr, va, te = self.dataset.edges.split()
        history = []
        best = float("inf")
        for epoch in range(self.cfg.epochs):
            tm = self.train_epoch(tr, epoch)
            val_rmse = self.evaluate(va)
            test_rmse = self.evaluate(te)
            rec = {"epoch": epoch, **tm, "val_rmse": val_rmse,
                   "test_rmse": test_rmse}
            best = min(best, val_rmse)
            logger.info(str(rec))
            if run_logger is not None:
                run_logger.log(rec, step=epoch)
            history.append(rec)
        return history, best
