"""Optimizer and schedule tests: convergence + mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fusion_tpu.train.optim import get_optimizer, shampoo
from fusion_tpu.train.schedules import get_schedule


def quadratic_problem(rng, dim=20):
    a = rng.normal(size=(dim, dim)).astype(np.float32)
    a = a @ a.T / dim + np.eye(dim, dtype=np.float32)
    b = rng.normal(size=(dim,)).astype(np.float32)
    a_j, b_j = jnp.asarray(a), jnp.asarray(b)

    def loss_fn(params):
        x = params["w"]
        return 0.5 * x @ a_j @ x - b_j @ x

    x_star = np.linalg.solve(a, b)
    return loss_fn, {"w": jnp.zeros(dim)}, x_star


@pytest.mark.parametrize("name,lr", [("adamw", 0.1), ("adafactor", 0.5), ("shampoo", 0.3)])
def test_optimizers_converge_on_quadratic(rng, name, lr):
    loss_fn, params, x_star = quadratic_problem(rng)
    tx = get_optimizer(name, lr, weight_decay=0.0, max_grad_norm=None)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(300):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5 * abs(losses[0]), f"{name} failed to descend: {losses[::60]}"


def test_shampoo_blocks_and_matrix_params(rng):
    # matrix param larger than block_size exercises the tiling path
    w = jnp.asarray(rng.normal(size=(20, 36)).astype(np.float32))
    params = {"w": w}
    tx = shampoo(0.05, block_size=16, precondition_every=2)
    state = tx.init(params)

    target = jnp.asarray(rng.normal(size=(20, 36)).astype(np.float32))

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(lambda p: ((p["w"] - target) ** 2).mean())(params)
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    first = None
    for i in range(60):
        params, state, loss = step(params, state)
        first = first if first is not None else float(loss)
    assert float(loss) < 0.2 * first


def test_shampoo_vector_params(rng):
    params = {"b": jnp.asarray(rng.normal(size=(33,)).astype(np.float32))}
    tx = shampoo(0.1, block_size=16)
    state = tx.init(params)
    grads = {"b": jnp.ones(33)}
    updates, state = tx.update(grads, state, params)
    assert updates["b"].shape == (33,)
    assert np.isfinite(np.asarray(updates["b"])).all()


def test_linear_schedule_shape():
    sched = get_schedule("linear", 2e-5, total_steps=100, warmup_ratio=0.1)
    vals = [float(sched(s)) for s in [0, 5, 10, 55, 100]]
    assert vals[0] == 0.0
    assert vals[2] == pytest.approx(2e-5, rel=1e-6)  # peak at end of warmup
    assert 0 < vals[3] < 2e-5
    assert vals[4] == pytest.approx(0.0, abs=1e-12)


def test_no_decay_mask():
    from fusion_tpu.train.optim import _no_decay_mask

    params = {
        "layer": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)},
        "ln": {"scale": jnp.ones(2), "bias": jnp.ones(2)},
    }
    mask = _no_decay_mask(params)
    assert mask["layer"]["kernel"] is True
    assert mask["layer"]["bias"] is False
    assert mask["ln"]["scale"] is False


def test_merge_small_dims():
    from fusion_tpu.train.optim import merge_small_dims

    assert merge_small_dims((8, 8, 64), 128) == (64, 64)
    assert merge_small_dims((1, 768), 128) == (768,)
    # 12*64 = 768 exceeds the 128 cap, so nothing merges
    assert merge_small_dims((768, 12, 64), 128) == (768, 12, 64)
    assert merge_small_dims((768, 12, 64), 768) == (768, 768)
    assert merge_small_dims((2, 2, 2, 2), 16) == (16,)
    assert merge_small_dims((), 128) == (1,)


def test_shampoo_sgd_graft_and_merged_dims(rng):
    # rank-3 param exercises dim merging; sgd grafting must still descend
    w = jnp.asarray(rng.normal(size=(4, 4, 8)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(4, 4, 8)).astype(np.float32))
    params = {"w": w}
    tx = shampoo(0.3, block_size=16, precondition_every=2, graft_type="sgd")
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(lambda p: ((p["w"] - target) ** 2).mean())(params)
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    first = None
    for _ in range(80):
        params, state, loss = step(params, state)
        first = first if first is not None else float(loss)
    assert float(loss) < 0.3 * first


def test_shampoo_padded_edge_blocks_match_exact_partition(rng):
    """Zero-padding edge blocks is mathematically EXACT, not a bias: the
    padded Gram matrix is block-diagonal ([L_real, 0; 0, 0] + eps I), so its
    inverse root acts on the real coordinates exactly as the root of the
    unpadded block (the reference's exact BlockPartitioner, optim.py:242-306,
    would compute).  This oracle re-implements one preconditioned step with
    EXACT (unpadded) edge blocks and must match the padded implementation.
    """
    eps = 1e-6
    bs = 16
    r, c = 21, 37  # edge blocks of 5 x 16, 16 x 5, 5 x 5
    g = rng.normal(size=(r, c)).astype(np.float32)

    def inv_root(mat, p):
        n = mat.shape[0]
        w, v = np.linalg.eigh(mat + eps * np.eye(n, dtype=np.float32))
        w = np.maximum(w, eps)
        return (v * (w ** (-1.0 / p))[None, :]) @ v.T

    # oracle: exact per-block preconditioning, no padding anywhere
    pre_oracle = np.zeros_like(g)
    for i0 in range(0, r, bs):
        for j0 in range(0, c, bs):
            blk = g[i0 : i0 + bs, j0 : j0 + bs]
            l_root = inv_root(blk @ blk.T, 4)
            r_root = inv_root(blk.T @ blk, 4)
            pre_oracle[i0 : i0 + bs, j0 : j0 + bs] = l_root @ blk @ r_root

    # implementation: single step at count==start_preconditioning_step with
    # sgd grafting so the update direction is pre * (|g| / |pre|)
    tx = shampoo(
        1.0, block_size=bs, precondition_every=1, start_preconditioning_step=1,
        graft_type="sgd", nesterov=False, beta1=0.0,
    )
    params = {"w": jnp.zeros((r, c), jnp.float32)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g)}, state, params)
    got = -np.asarray(updates["w"])  # -lr * direction, lr=1, momentum off

    scale = np.linalg.norm(g) / max(np.linalg.norm(pre_oracle), 1e-30)
    np.testing.assert_allclose(got, pre_oracle * scale, rtol=2e-3, atol=2e-4)
