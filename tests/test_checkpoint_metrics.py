import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from detectax.train.checkpoint import CheckpointManager
from detectax.train.loop import TrainState
from detectax.train.metrics import MetricsLogger, ThroughputMeter, format_console


def _tiny_state(value=0.0):
    params = {"w": jnp.full((4, 4), value), "b": jnp.zeros((4,))}
    opt = optax.sgd(0.1, momentum=0.9)
    return TrainState(
        step=jnp.asarray(3, jnp.int32),
        params=params,
        batch_stats={"bn": {"mean": jnp.zeros((4,))}},
        opt_state=opt.init(params),
    )


def test_checkpoint_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    state = _tiny_state(1.5)
    mgr.save(3, state)
    mgr.wait()
    assert mgr.latest_step() == 3
    restored, step = mgr.restore_latest(_tiny_state(0.0))
    assert step == 3
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 1.5)
    assert int(restored.step) == 3
    mgr.close()


def test_checkpoint_max_to_keep(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    for s in (1, 2):
        st = _tiny_state(float(s))
        mgr.save(s, st)
    mgr.wait()
    assert mgr.latest_step() == 2
    restored, _ = mgr.restore_latest(_tiny_state())
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.0)
    mgr.close()


def test_restore_params_cross_optimizer(tmp_path):
    """Pin the raw-restore contract of restore_params (advisor finding):
    a checkpoint saved with an SGD opt_state must load via restore_params
    into an Adam-template state (opt_state pytrees differ), both the plain
    and use_ema branches."""
    params = {"w": jnp.full((4, 4), 2.5), "b": jnp.zeros((4,))}
    sgd = optax.sgd(0.1, momentum=0.9)
    state_sgd = TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats={"bn": {"mean": jnp.full((4,), 0.25)}},
        opt_state=sgd.init(params),
        ema_params={"w": jnp.full((4, 4), 9.0), "b": jnp.ones((4,))},
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state_sgd)
    mgr.wait()
    mgr.close()

    adam = optax.adam(1e-3)
    zeros = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    template = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=zeros,
        batch_stats={"bn": {"mean": jnp.zeros((4,))}},
        opt_state=adam.init(zeros),
        ema_params=None,
    )
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
    restored, step = mgr2.restore_params(template)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 2.5)
    np.testing.assert_allclose(
        np.asarray(restored.batch_stats["bn"]["mean"]), 0.25
    )
    # template's optimizer state untouched (Adam, not the saved SGD)
    assert restored.opt_state is template.opt_state

    ema_state, _ = mgr2.restore_params(template, use_ema=True)
    np.testing.assert_allclose(np.asarray(ema_state.params["w"]), 9.0)
    mgr2.close()


def test_restore_params_no_ema_raises(tmp_path):
    state = _tiny_state(1.0)  # ema_params=None
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, state)
    mgr.wait()
    try:
        mgr.restore_params(_tiny_state(0.0), use_ema=True)
        raised = False
    except ValueError:
        raised = True
    assert raised
    mgr.close()


def test_metrics_logger_csv_resume(tmp_path):
    csv_path = str(tmp_path / "losses.csv")
    log = MetricsLogger(csv_path=csv_path)
    log.log(1, {"total": 5.0, "cls": 3.0})
    log.log(2, {"total": 4.0, "cls": 2.5})
    log.flush_csv()
    # simulate resume: history reloads (reference train_fcos.py:296-310)
    log2 = MetricsLogger(csv_path=csv_path)
    assert log2.last_step() == 2
    assert len(log2.history) == 2
    log2.log(3, {"total": 3.0, "cls": 2.0})
    log2.flush_csv()
    log3 = MetricsLogger(csv_path=csv_path)
    assert log3.last_step() == 3


def test_throughput_meter():
    m = ThroughputMeter()
    m.start()
    m.update(100)
    assert m.rate() > 0
    r = m.reset()
    assert r > 0 and m.rate() == 0.0


def test_format_console():
    s = format_console(10, 0.001, {"total": 1.2345})
    assert "step 10" in s and "total 1.2345" in s
