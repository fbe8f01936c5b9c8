"""Optimizer parity: the avsync update rule (clip -> Adam -> -lr) must track
torch.optim.Adam + clip_grad_norm_ step for step (`trainer.py:23,64-70`)."""

import numpy as np
import torch

import jax.numpy as jnp
import optax

from avsync.train.lipnet_trainer import make_optimizer


def test_adam_with_clipping_matches_torch():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7, 5)).astype(np.float32)
    grads = [rng.normal(size=(7, 5)).astype(np.float32) * s for s in (0.5, 3.0, 0.1, 10.0)]
    lr = 1e-3

    # torch: clip_grad_norm_(1.0) then Adam(lr)
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([tp], max_norm=1.0)
        topt.step()

    # avsync: same rule, lr applied as the runtime scalar
    opt = make_optimizer(lr, 1.0)
    params = {"w": jnp.asarray(p0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        updates = {"w": -lr * updates["w"]}
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), atol=1e-6, rtol=1e-5
    )


def test_detector_adam_weight_decay_matches_torch():
    """torch Adam(weight_decay) = coupled L2 into the gradient
    (`misalignment_detection_train.py:412`)."""
    from avsync.train.detector_trainer import make_detector_optimizer

    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(6, 4)).astype(np.float32)
    grads = [rng.normal(size=(6, 4)).astype(np.float32) for _ in range(3)]
    lr, wd = 1e-3, 1e-2

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    opt = make_detector_optimizer(lr, wd)
    params = {"w": jnp.asarray(p0)}
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), atol=1e-6, rtol=1e-5
    )
