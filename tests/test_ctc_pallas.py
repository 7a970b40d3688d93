"""Pallas CTC kernel parity vs the lax.scan implementation and the numpy
oracle — run in interpreter mode on CPU (the compiled kernel path is
exercised on TPU by bench.py and the trainer's impl="auto").

Covers: loss parity, analytic-gradient-vs-autodiff parity, ragged
input/target lengths, empty targets, repeated labels (skip-transition
masking), impossible alignments (zero_infinity), and the trainer-level
mean reduction.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from turkish_asr_tpu.ops.ctc import ctc_loss, ctc_loss_numpy_oracle


def _random_case(seed, B=3, T=37, V=7, L=9, ragged=True):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = rng.integers(1, V, (B, L)).astype(np.int32)
    if ragged:
        il = rng.integers(T // 2, T + 1, (B,)).astype(np.int32)
        tl = rng.integers(1, L + 1, (B,)).astype(np.int32)
    else:
        il = np.full((B,), T, dtype=np.int32)
        tl = np.full((B,), L, dtype=np.int32)
    return log_probs, jnp.asarray(targets), jnp.asarray(il), jnp.asarray(tl)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_loss_matches_scan_and_oracle(seed):
    lp, tg, il, tl = _random_case(seed)
    scan = ctc_loss(lp, tg, il, tl, reduction="none", impl="scan")
    pal = ctc_loss(lp, tg, il, tl, reduction="none",
                   impl="pallas_interpret")
    oracle = ctc_loss_numpy_oracle(lp, tg, il, tl)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(scan),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pal), oracle, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_grad_matches_scan_autodiff(seed):
    lp, tg, il, tl = _random_case(seed, B=4, T=25, V=6, L=7)

    def mean_loss(lp, impl):
        per = ctc_loss(lp, tg, il, tl, reduction="none", impl=impl)
        return jnp.mean(per / jnp.maximum(tl, 1))

    g_scan = jax.grad(lambda x: mean_loss(x, "scan"))(lp)
    g_pal = jax.grad(lambda x: mean_loss(x, "pallas_interpret"))(lp)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_scan),
                               rtol=1e-4, atol=1e-5)
    # padded frames get exactly zero gradient
    g = np.asarray(g_pal)
    for b, n in enumerate(np.asarray(il)):
        assert np.all(g[b, int(n):] == 0.0)


def test_pallas_repeated_labels_and_empty_targets():
    rng = np.random.default_rng(11)
    B, T, V, L = 3, 20, 5, 6
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32)), -1)
    # row 0: repeated labels (skip transitions masked); row 2: empty target
    tg = jnp.asarray([[2, 2, 3, 3, 2, 2],
                      [1, 2, 3, 4, 1, 2],
                      [0, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    il = jnp.asarray([T, T - 4, T], dtype=jnp.int32)
    tl = jnp.asarray([6, 6, 0], dtype=jnp.int32)
    scan = ctc_loss(lp, tg, il, tl, reduction="none", impl="scan")
    pal = ctc_loss(lp, tg, il, tl, reduction="none", impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(pal), np.asarray(scan),
                               rtol=1e-5, atol=1e-5)
    g_scan = jax.grad(lambda x: jnp.sum(
        ctc_loss(x, tg, il, tl, reduction="none", impl="scan")))(lp)
    g_pal = jax.grad(lambda x: jnp.sum(
        ctc_loss(x, tg, il, tl, reduction="none",
                 impl="pallas_interpret")))(lp)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_scan),
                               rtol=1e-4, atol=1e-5)


def test_pallas_zero_infinity_impossible_alignment():
    # target longer than frames -> impossible -> zero_infinity zeroes it
    rng = np.random.default_rng(5)
    B, T, V, L = 2, 4, 5, 8
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32)), -1)
    tg = jnp.asarray(rng.integers(1, V, (B, L)).astype(np.int32))
    il = jnp.asarray([T, T], dtype=jnp.int32)
    tl = jnp.asarray([8, 2], dtype=jnp.int32)  # row 0 impossible
    pal = ctc_loss(lp, tg, il, tl, reduction="none",
                   impl="pallas_interpret")
    scan = ctc_loss(lp, tg, il, tl, reduction="none", impl="scan")
    assert float(pal[0]) == 0.0 and float(scan[0]) == 0.0
    np.testing.assert_allclose(float(pal[1]), float(scan[1]), rtol=1e-5)
    # gradient of the zeroed sample must be zero, not NaN
    g = jax.grad(lambda x: jnp.sum(
        ctc_loss(x, tg, il, tl, reduction="none",
                 impl="pallas_interpret")))(lp)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.asarray(g)[0] == 0.0)


def test_pallas_matches_torch_ctc():
    """Loss and *logit* gradients vs torch.nn.CTCLoss. The comparison goes
    through log_softmax because torch's CTC kernel defines its log-prob
    gradient only up to a softmax-direction gauge term that the
    log_softmax backward annihilates (same convention as test_ctc.py)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(21)
    B, T, V, L = 4, 30, 9, 8
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    il = np.array([30, 25, 18, 30], dtype=np.int64)
    tl = np.array([8, 5, 3, 1], dtype=np.int64)
    tg = rng.integers(1, V, (B, L)).astype(np.int64)

    logits_t = torch.tensor(logits, requires_grad=True)
    t_lp = torch.nn.functional.log_softmax(logits_t, -1).permute(1, 0, 2)
    loss = torch.nn.CTCLoss(blank=0, zero_infinity=True, reduction="mean")(
        t_lp, torch.tensor(tg), torch.tensor(il), torch.tensor(tl))
    loss.backward()

    def mean_loss(x):
        lp = jax.nn.log_softmax(x, -1)
        return ctc_loss(lp, jnp.asarray(tg.astype(np.int32)),
                        jnp.asarray(il.astype(np.int32)),
                        jnp.asarray(tl.astype(np.int32)),
                        reduction="mean", impl="pallas_interpret")

    j_loss, j_grad = jax.value_and_grad(mean_loss)(jnp.asarray(logits))
    np.testing.assert_allclose(float(j_loss), float(loss.detach()),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_grad), logits_t.grad.numpy(),
                               rtol=1e-3, atol=1e-5)


def test_sharded_ctc_matches_scan_on_mesh():
    """make_sharded_ctc (shard_map over the data axis, used by the trainer
    for --ctc_impl pallas on multi-device meshes) matches the scan path
    for loss and grads on a data x model mesh."""
    from turkish_asr_tpu.ops.ctc import make_sharded_ctc
    from turkish_asr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh("data=4,model=2")
    lp, tg, il, tl = _random_case(9, B=8, T=30, V=6, L=7)
    want = ctc_loss(lp, tg, il, tl, reduction="none", impl="scan")
    fn = make_sharded_ctc(mesh, impl="pallas_interpret")
    got = jax.jit(fn)(lp, tg, il, tl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    g0 = jax.grad(lambda x: jnp.sum(
        ctc_loss(x, tg, il, tl, reduction="none", impl="scan")))(lp)
    g1 = jax.grad(lambda x: jnp.sum(fn(x, tg, il, tl)))(lp)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)
