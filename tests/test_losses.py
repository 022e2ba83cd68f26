"""Loss parity vs torch oracles (torch-cpu is available in the image).

The oracle expressions are built from torch's own loss primitives with the
same wiring the reference uses (splade/losses.py), so numeric agreement here
is agreement with the reference's loss values.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from fusion_tpu.train import losses


@pytest.fixture
def score_data(rng):
    b, n = 6, 4
    pos = rng.normal(size=(b,)).astype(np.float32) * 3
    neg = rng.normal(size=(b, n)).astype(np.float32) * 3
    tpos = rng.normal(size=(b,)).astype(np.float32) * 8
    tneg = rng.normal(size=(b, n)).astype(np.float32) * 8
    return pos, neg, tpos, tneg


def test_info_nce_vs_torch(score_data):
    pos, neg, _, _ = score_data
    temp = 0.05
    got = float(losses.info_nce(jnp.asarray(pos), jnp.asarray(neg), temperature=temp))
    scores = torch.cat([torch.tensor(pos).unsqueeze(-1), torch.tensor(neg)], dim=-1) / temp
    exp = torch.nn.functional.cross_entropy(scores, torch.zeros(len(pos), dtype=torch.long))
    assert got == pytest.approx(float(exp), rel=1e-5)


def test_margin_mse_vs_torch(score_data):
    pos, neg, tpos, tneg = score_data
    scale = 0.08
    got = float(
        losses.margin_mse(
            jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(tpos), jnp.asarray(tneg), scale
        )
    )
    sm = torch.tensor(pos).unsqueeze(-1) - torch.tensor(neg)
    tm = (torch.tensor(tpos).unsqueeze(-1) - torch.tensor(tneg)) * scale
    exp = torch.nn.functional.mse_loss(sm, tm)
    assert got == pytest.approx(float(exp), rel=1e-5)


def test_kld_vs_torch(score_data):
    pos, neg, tpos, tneg = score_data
    got = float(
        losses.kld(jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(tpos), jnp.asarray(tneg))
    )
    s = torch.cat([torch.tensor(pos).unsqueeze(-1), torch.tensor(neg)], dim=1)
    t = torch.cat([torch.tensor(tpos).unsqueeze(-1), torch.tensor(tneg)], dim=1)
    exp = torch.nn.functional.kl_div(
        torch.log_softmax(s, dim=1), torch.softmax(t, dim=1), reduction="batchmean"
    )
    assert got == pytest.approx(float(exp), rel=1e-5)


def test_bce_vs_torch(rng):
    logits = rng.normal(size=(10,)).astype(np.float32)
    labels = (rng.random(10) > 0.5).astype(np.float32)
    got = float(losses.bce_logits(jnp.asarray(logits), jnp.asarray(labels)))
    exp = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(labels)
    )
    assert got == pytest.approx(float(exp), rel=1e-5)


def test_mnrl_matches_manual(rng):
    b, h = 5, 16
    q = rng.normal(size=(b, h)).astype(np.float32)
    d = rng.normal(size=(b, h)).astype(np.float32)
    got = float(losses.mnrl(jnp.asarray(q), jnp.asarray(d), scale=20.0))
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    scores = torch.tensor(qn @ dn.T) * 20.0
    exp = torch.nn.functional.cross_entropy(scores, torch.arange(b))
    assert got == pytest.approx(float(exp), rel=1e-4)


def test_flops_reg_value_and_rampup(rng):
    reps = rng.normal(size=(4, 9)).astype(np.float32)
    val = float(losses.flops_value(jnp.asarray(reps)))
    exp = float((np.abs(reps).mean(axis=0) ** 2).sum())
    assert val == pytest.approx(exp, rel=1e-5)

    w, target = 3e-4, 100
    # quadratic ramp below target, flat after
    assert float(losses.flops_weight(w, 0, target)) == 0.0
    mid = float(losses.flops_weight(w, 50, target))
    assert mid == pytest.approx(w * (50 / 101) ** 2, rel=1e-5)
    assert float(losses.flops_weight(w, 100, target)) == pytest.approx(w)
    assert float(losses.flops_weight(w, 5000, target)) == pytest.approx(w)
    assert float(losses.flops_weight(w, 50, None)) == pytest.approx(w)


def test_l1_l0(rng):
    reps = rng.normal(size=(3, 6)).astype(np.float32)
    reps[0, :3] = 0
    got_l1 = float(losses.l1_reg(jnp.asarray(reps), 0.5))
    assert got_l1 == pytest.approx(0.5 * np.abs(reps).sum(-1).mean(), rel=1e-5)
    got_l0 = float(losses.l0_reg(jnp.asarray(reps), 2.0))
    assert got_l0 == pytest.approx(2.0 * (reps != 0).sum(-1).mean(), rel=1e-5)


def test_regularizer_dispatch(rng):
    reps = jnp.asarray(rng.normal(size=(3, 6)).astype(np.float32))
    a = float(losses.regularizer("FlopsLoss", reps, 1e-3, step=10, target_step=5))
    b = float(losses.flops_reg(reps, 1e-3, 10, 5))
    assert a == b
    assert float(losses.regularizer("L1Loss", reps, 0.1)) == pytest.approx(
        float(losses.l1_reg(reps, 0.1))
    )
