"""Pallas kernel tests (interpret mode on CPU) — parity vs the XLA path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmm_tpu.ops.pallas.column_attention import (
    fused_column_attention,
    reference_column_attention,
)


def test_fused_column_attention_matches_reference():
    rng = np.random.RandomState(0)
    B, S, C, H = 16, 6, 128, 8
    x = jnp.array(rng.randn(B, S, C), jnp.float32)
    wqkv = jnp.array(rng.randn(C, 3 * C) * 0.05, jnp.float32)
    bqkv = jnp.array(rng.randn(3 * C) * 0.01, jnp.float32)
    wout = jnp.array(rng.randn(C, C) * 0.05, jnp.float32)
    bout = jnp.array(rng.randn(C) * 0.01, jnp.float32)
    ref = reference_column_attention(x, wqkv, bqkv, wout, bout, H)
    out = fused_column_attention(x, wqkv, bqkv, wout, bout, H,
                                 block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_attention_layer_pallas_flag_matches_xla():
    from rmm_tpu.nn.transformer import MultiHeadSelfAttention

    rng = np.random.RandomState(1)
    x = jnp.array(rng.randn(8, 5, 128), jnp.float32)
    m_xla = MultiHeadSelfAttention(128, 8, dropout=0.0, use_pallas="never")
    p = m_xla.init(jax.random.PRNGKey(0), x)
    out_xla = m_xla.apply(p, x, deterministic=True)
    # interpret-mode kernel through the layer params
    out_k = fused_column_attention(
        x, p["params"]["qkv_kernel"], p["params"]["qkv_bias"],
        p["params"]["out_kernel"], p["params"]["out_bias"], 8,
        block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-4)


def _rand_params(rng, C):
    return (jnp.array(rng.randn(C, 3 * C) * 0.05, jnp.float32),
            jnp.array(rng.randn(3 * C) * 0.01, jnp.float32),
            jnp.array(rng.randn(C, C) * 0.05, jnp.float32),
            jnp.array(rng.randn(C) * 0.01, jnp.float32))


@pytest.mark.parametrize("C,H", [(128, 8), (32, 8), (64, 4)])
def test_fused_attention_small_channels(C, H):
    """C=32/64 (the supervised config of record) — no 128-lane gate."""
    rng = np.random.RandomState(2)
    B, S = 16, 6
    x = jnp.array(rng.randn(B, S, C), jnp.float32)
    wqkv, bqkv, wout, bout = _rand_params(rng, C)
    ref = reference_column_attention(x, wqkv, bqkv, wout, bout, H)
    out = fused_column_attention(x, wqkv, bqkv, wout, bout, H,
                                 block_rows=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("C,H,rate", [(128, 8, 0.0), (32, 8, 0.0),
                                      (64, 4, 0.25), (128, 8, 0.25)])
def test_fused_attention_backward_parity(C, H, rate):
    """custom_vjp fused backward == autodiff of the XLA reference, for all
    six inputs, with and without the dropout keep-mask."""
    rng = np.random.RandomState(3)
    B, S = 8, 5
    x = jnp.array(rng.randn(B, S, C), jnp.float32)
    wqkv, bqkv, wout, bout = _rand_params(rng, C)
    cot = jnp.array(rng.randn(B, S, C), jnp.float32)
    mask = None
    if rate > 0.0:
        mask = jnp.array(rng.rand(B, H, S, S) > rate)

    def loss_fused(x, wqkv, bqkv, wout, bout):
        o = fused_column_attention(x, wqkv, bqkv, wout, bout, H,
                                   drop_mask=mask, dropout_rate=rate,
                                   block_rows=4, interpret=True)
        return jnp.sum(o * cot)

    def loss_ref(x, wqkv, bqkv, wout, bout):
        o = reference_column_attention(x, wqkv, bqkv, wout, bout, H,
                                       drop_mask=mask, dropout_rate=rate)
        return jnp.sum(o * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, wqkv, bqkv, wout, bout)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, wqkv, bqkv, wout, bout)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_attention_dropout_semantics():
    """Keep-mask dropout == nn.Dropout on attention probs: full-ones mask
    reproduces the no-dropout output scaled consistently; a zero-row mask
    zeroes that query's context contribution."""
    rng = np.random.RandomState(4)
    B, S, C, H = 4, 5, 32, 4
    x = jnp.array(rng.randn(B, S, C), jnp.float32)
    wqkv, bqkv, wout, bout = _rand_params(rng, C)
    rate = 0.5
    ones = jnp.ones((B, H, S, S), bool)
    out = fused_column_attention(x, wqkv, bqkv, wout, bout, H,
                                 drop_mask=ones, dropout_rate=rate,
                                 block_rows=4, interpret=True)
    # all-keep mask = no-dropout output scaled by 1/(1-p) inside attention;
    # compare against the XLA reference with the same mask (exact semantics)
    ref = reference_column_attention(x, wqkv, bqkv, wout, bout, H,
                                     drop_mask=ones, dropout_rate=rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)
    assert not np.allclose(
        np.asarray(out),
        np.asarray(fused_column_attention(x, wqkv, bqkv, wout, bout, H,
                                          block_rows=4, interpret=True)))


def test_fused_attention_nondivisible_batch_padding():
    """B not divisible by a sublane-friendly tile (the SSL-config shape
    class: bt*S must be divisible by 8 — found round 3 when B=13000, S=6
    picked bt=125 → block rows 750). The wrapper now pads the batch axis;
    forward AND backward must match the reference exactly on the real
    rows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rmm_tpu.ops.pallas.column_attention import (
        fused_column_attention,
        reference_column_attention,
    )

    rng = np.random.RandomState(7)
    B, S, C, H = 10, 6, 16, 4   # bt=8 (mult=4), Bp=16 → padding exercised
    x = jnp.asarray(rng.randn(B, S, C).astype(np.float32))
    wqkv = jnp.asarray(rng.randn(C, 3 * C).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.randn(3 * C).astype(np.float32) * 0.1)
    wout = jnp.asarray(rng.randn(C, C).astype(np.float32) * 0.1)
    bout = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)

    got = fused_column_attention(x, wqkv, bqkv, wout, bout, H,
                                 block_rows=8, interpret=True)
    want = reference_column_attention(x, wqkv, bqkv, wout, bout, H)
    np.testing.assert_allclose(got, want, atol=2e-5)

    def loss_f(args, fn, **kw):
        return (fn(*args, H, **kw) ** 2).sum()

    g_f = jax.grad(lambda a: loss_f(a, fused_column_attention,
                                    block_rows=8, interpret=True))(
        (x, wqkv, bqkv, wout, bout))
    g_r = jax.grad(lambda a: loss_f(a, reference_column_attention))(
        (x, wqkv, bqkv, wout, bout))
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_fused_attention_bf16_inputs():
    """--precision bf16 feeds the kernel bf16 params/activations (the
    C=128 SSL config, head_dim 16): output dtype follows the input, f32
    accumulation keeps the error at bf16 resolution (~0.1% relative),
    grads flow and stay finite."""
    rng = np.random.RandomState(0)
    B, S, C, H = 16, 6, 128, 8
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    args32 = (mk(B, S, C), mk(C, 3 * C), mk(3 * C), mk(C, C), mk(C))
    args = [a.astype(jnp.bfloat16) for a in args32]
    out = fused_column_attention(*args, nhead=H, interpret=True)
    assert out.dtype == jnp.bfloat16
    # compare against the XLA path fed the SAME bf16 inputs (the ~9%
    # scaled gap to an f32-input reference is inherent bf16 input
    # rounding through softmax, identical for both implementations)
    ref = reference_column_attention(*args, nhead=H).astype(jnp.float32)
    err = (jnp.abs(out.astype(jnp.float32) - ref).max()
           / (jnp.abs(ref).max() + 1e-6))
    assert float(err) < 1e-2
    g = jax.grad(lambda *a: fused_column_attention(
        *a, nhead=H, interpret=True).astype(jnp.float32).sum())(*args)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
