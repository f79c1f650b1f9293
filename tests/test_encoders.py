"""Tests for stype encoders and the stype-wise dispatcher."""
import jax
import jax.numpy as jnp
import numpy as np

from rmm_tpu.frame import Stype
from rmm_tpu.nn.encoders import (
    EmbeddingEncoder,
    LinearEncoder,
    ProjectionEncoder,
    TimestampEncoder,
    make_stypewise_encoder,
)
from .test_frame import make_dataset


def test_linear_encoder_normalizes():
    enc = LinearEncoder(channels=8, means=(2.0,), stds=(4.0,))
    x = jnp.array([[2.0], [6.0]])
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 1, 8)
    # row 0 is the mean -> normalized 0 -> output equals bias
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(params["params"]["bias"][0]),
        rtol=1e-5)


def test_embedding_encoder_missing_row():
    enc = EmbeddingEncoder(channels=4, cardinalities=(3,))
    x = jnp.array([[-1], [0], [2]], dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (3, 1, 4)
    table = params["params"]["embedding_0"]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(table[0]))
    np.testing.assert_allclose(np.asarray(out[1, 0]), np.asarray(table[1]))


def test_timestamp_encoder_periodicity():
    enc = TimestampEncoder(channels=6, num_cols=1)
    x = jnp.array([[0], [86400 * 7]], dtype=jnp.int64)  # same time-of-day/dow
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (2, 1, 6)


def test_projection_encoder():
    enc = ProjectionEncoder(channels=5, num_cols=2)
    x = jnp.ones((3, 2))
    params = enc.init(jax.random.PRNGKey(0), x)
    assert enc.apply(params, x).shape == (3, 2, 5)


def test_stypewise_dispatcher_shape_and_jit():
    ds = make_dataset()
    enc = make_stypewise_encoder(ds, channels=16)
    tf = ds.tensor_frame[np.arange(10)]
    params = enc.init(jax.random.PRNGKey(0), tf)
    out, names = enc.apply(params, tf)
    assert out.shape == (10, 4, 16)
    assert names == ["amount", "currency", "fmt", "ts"]

    # jit end-to-end over the TensorFrame pytree
    fn = jax.jit(lambda p, t: enc.apply(p, t)[0])
    out2 = fn(params, tf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-4,
                               atol=1e-5)


def test_dispatcher_grads_flow():
    ds = make_dataset()
    enc = make_stypewise_encoder(ds, channels=8)
    tf = ds.tensor_frame[np.arange(6)]
    params = enc.init(jax.random.PRNGKey(0), tf)

    def loss(p):
        out, _ = enc.apply(p, tf)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert gnorm > 0
