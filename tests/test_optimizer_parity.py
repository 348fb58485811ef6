"""Optimizer parity: our optax chain must reproduce torch.optim.Adam with
coupled weight decay (the reference's optimizer, /root/reference/trainer.py:54)
step-for-step, including bias correction, across several updates."""

import numpy as np
import pytest

from rot_mvgaze_tpu.train.schedule import cyclic_triangular2
from rot_mvgaze_tpu.train.trainer import make_optimizer

torch = pytest.importorskip("torch")


def test_adam_parity_multi_step():
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    w0 = rng.randn(7, 5).astype(np.float32)
    grads = [rng.randn(7, 5).astype(np.float32) * 0.1 for _ in range(5)]
    lr, wd = 3e-4, 1e-6

    # ---- torch ----
    wt = torch.nn.Parameter(torch.tensor(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()
    torch_result = wt.detach().numpy()

    # ---- ours (constant schedule) ----
    tx = make_optimizer(lambda count: lr, weight_decay=wd)
    params = jnp.asarray(w0)
    state = tx.init(params)
    import optax

    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), torch_result, atol=1e-6)


def test_cyclic_schedule_matches_torch_cycliclr():
    """Our schedule vs torch CyclicLR(triangular2), stepped per tick."""
    sched = cyclic_triangular2(1e-6, 1e-3, step_size_up=7, step_size_down=13)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1e-6)
    tsched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=1e-6, max_lr=1e-3, step_size_up=7, step_size_down=13,
        mode="triangular2", cycle_momentum=False,
    )
    for t in range(45):
        torch_lr = tsched.get_last_lr()[0]
        ours = float(sched(t))
        np.testing.assert_allclose(ours, torch_lr, rtol=1e-6, err_msg=f"t={t}")
        opt.step()
        tsched.step()
