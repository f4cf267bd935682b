"""Ported-backbone initialization: round-trip + trainer smoke."""
import jax
import jax.numpy as jnp
import numpy as np

from detectax.models import FCOS
from detectax.tools.port_tf_weights import load_ported, save_ported
from detectax.train.driver import load_backbone_weights
from detectax.train.loop import create_train_state
from detectax.train.schedules import exponential_with_floor, make_optimizer


def _fresh_state():
    model = FCOS(num_classes=3, backbone="tiny")
    opt = make_optimizer("sgd", exponential_with_floor(1e-3))
    return create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), opt
    )


def test_save_load_roundtrip_and_state_injection(tmp_path):
    state = _fresh_state()
    marked = jax.tree_util.tree_map(
        lambda t: t * 2.0 + 1.0, {
            "params": state.params["TinyBackbone_0"],
            "batch_stats": state.batch_stats["TinyBackbone_0"],
        },
    )
    path = str(tmp_path / "bb.msgpack")
    save_ported(marked, path)

    template = {
        "params": state.params["TinyBackbone_0"],
        "batch_stats": state.batch_stats["TinyBackbone_0"],
    }
    loaded = load_ported(path, template)
    for a, b in zip(
        jax.tree_util.tree_leaves(loaded), jax.tree_util.tree_leaves(marked)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    state2 = load_backbone_weights(state, path)
    got = jax.tree_util.tree_leaves(state2.params["TinyBackbone_0"])
    want = jax.tree_util.tree_leaves(marked["params"])
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # heads untouched
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.params["fpn"])[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params["fpn"])[0]),
    )


def test_trainer_smoke_from_ported_weights(tmp_path):
    from detectax.cli import train_fcos

    state = _fresh_state()
    path = str(tmp_path / "bb.msgpack")
    save_ported({
        "params": state.params["TinyBackbone_0"],
        "batch_stats": state.batch_stats["TinyBackbone_0"],
    }, path)
    summary = train_fcos.main([
        "--backbone", "tiny", "--canvas", "64", "--batch_size", "8",
        "--max_steps", "2", "--display_step", "1", "--step_save", "2",
        "--synthetic_n", "8", "--max_boxes", "8",
        "--init_backbone", path,
        "--ckpt_dir", str(tmp_path / "ckpt"),
        "--out_dir", str(tmp_path / "out"),
    ])
    assert summary["final_step"] == 2
    assert np.isfinite(summary["total"])
