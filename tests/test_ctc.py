import numpy as np
import jax
import jax.numpy as jnp
import pytest

from turkish_asr_tpu.ops.ctc import ctc_loss, ctc_loss_numpy_oracle


def _random_case(seed, B=3, T=20, V=7, L=6):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    targets = rng.integers(1, V, size=(B, L)).astype(np.int32)
    input_lengths = rng.integers(T // 2, T + 1, size=(B,)).astype(np.int32)
    target_lengths = rng.integers(1, L + 1, size=(B,)).astype(np.int32)
    # CTC requires input_length >= extended path needs; keep feasible.
    input_lengths = np.maximum(input_lengths, 2 * target_lengths + 1)
    return np.asarray(log_probs), targets, input_lengths, target_lengths


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_numpy_oracle(seed):
    lp, tgt, il, tl = _random_case(seed)
    got = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(tgt),
                              jnp.asarray(il), jnp.asarray(tl), reduction="none"))
    want = ctc_loss_numpy_oracle(lp, tgt, il, tl)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mean_reduction_matches_torch_semantics():
    lp, tgt, il, tl = _random_case(7)
    got = float(ctc_loss(jnp.asarray(lp), jnp.asarray(tgt),
                         jnp.asarray(il), jnp.asarray(tl), reduction="mean"))
    per = ctc_loss_numpy_oracle(lp, tgt, il, tl)
    want = float(np.mean(per / tl))
    assert abs(got - want) < 1e-4


def test_torch_parity():
    torch = pytest.importorskip("torch")
    lp, tgt, il, tl = _random_case(11, B=4, T=25, V=9, L=5)
    t_lp = torch.tensor(lp).permute(1, 0, 2)  # (T, B, V)
    t_loss = torch.nn.CTCLoss(blank=0, zero_infinity=True)(
        t_lp, torch.tensor(tgt), torch.tensor(il), torch.tensor(tl))
    got = float(ctc_loss(jnp.asarray(lp), jnp.asarray(tgt),
                         jnp.asarray(il), jnp.asarray(tl)))
    assert abs(got - float(t_loss)) < 1e-4


def test_torch_gradient_parity():
    torch = pytest.importorskip("torch")
    lp, tgt, il, tl = _random_case(13, B=2, T=15, V=6, L=4)

    logits_t = torch.tensor(lp, requires_grad=True)
    t_lp = torch.nn.functional.log_softmax(logits_t, dim=-1).permute(1, 0, 2)
    t_loss = torch.nn.CTCLoss(blank=0, zero_infinity=True)(
        t_lp, torch.tensor(tgt), torch.tensor(il), torch.tensor(tl))
    t_loss.backward()

    def f(logits):
        lps = jax.nn.log_softmax(logits, axis=-1)
        return ctc_loss(lps, jnp.asarray(tgt), jnp.asarray(il), jnp.asarray(tl))

    g = jax.grad(f)(jnp.asarray(lp))
    np.testing.assert_allclose(np.asarray(g), logits_t.grad.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_impossible_alignment_zeroed():
    # target longer than input frames -> -inf NLL -> zero_infinity zeroes it
    lp = np.log(np.full((1, 3, 4), 0.25, dtype=np.float32))
    tgt = np.array([[1, 2, 3]], dtype=np.int32)
    loss = float(ctc_loss(jnp.asarray(lp), jnp.asarray(tgt),
                          jnp.asarray([2]), jnp.asarray([3]), reduction="none")[0])
    assert loss == 0.0


def test_empty_target():
    # All-blank path: NLL = -sum log p(blank)
    lp = np.log(np.full((1, 4, 3), 1 / 3, dtype=np.float32))
    loss = float(ctc_loss(jnp.asarray(lp), jnp.asarray([[0, 0]]),
                          jnp.asarray([4]), jnp.asarray([0]), reduction="none")[0])
    assert abs(loss - 4 * np.log(3)) < 1e-4
