"""Tests for config system, registries, schedules, and checkpointing."""

import numpy as np
import pytest

from tdal.runtime.config import Config, ConfigDict
from tdal.runtime.registry import Registry, build_from_cfg
from tdal.runtime.schedules import labeler_step_decay, one_cycle


def test_config_fromfile_py(tmp_path):
    cfg_file = tmp_path / "cfg.py"
    cfg_file.write_text(
        "lr = 0.001\n"
        "model = dict(type='Net', hidden=64)\n"
        "data = dict(train=dict(batch_size=8))\n"
        "derived = lr * 10\n"
    )
    cfg = Config.fromfile(cfg_file)
    assert cfg.lr == 0.001
    assert cfg.model.type == "Net"
    assert cfg.data.train.batch_size == 8
    assert cfg.derived == pytest.approx(0.01)
    assert "lr = 0.001" in cfg.text


def test_config_merge_from_dict(tmp_path):
    cfg = Config({"optimizer": {"lr": 1e-3}})
    cfg.merge_from_dict({"optimizer.lr": 5e-4, "work_dir": "/tmp/x"})
    assert cfg.optimizer.lr == 5e-4
    assert cfg.work_dir == "/tmp/x"


def test_configdict_nested_attr():
    d = ConfigDict({"a": {"b": [{"c": 1}]}})
    assert d.a.b[0].c == 1
    d.a.new = {"x": 2}
    assert d.a.new.x == 2


def test_registry_build():
    REG = Registry("test")

    @REG.register_module
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build_from_cfg({"type": "Foo", "a": 1}, REG, default_args={"b": 7})
    assert (obj.a, obj.b) == (1, 7)
    with pytest.raises(KeyError):
        build_from_cfg({"type": "Bar"}, REG)


def test_labeler_step_decay():
    sched = labeler_step_decay(1e-3, steps_per_epoch=10, step_size=20, gamma=0.7)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(10 * 20)) == pytest.approx(7e-4)  # epoch 20
    assert float(sched(10 * 40)) == pytest.approx(0.49e-3)
    # Very late epochs floor at init_lr * 0.01 (static_train.py:222-227 eta_min rule)
    assert float(sched(10 * 2000)) == pytest.approx(1e-5)


def test_one_cycle_endpoints():
    lr, mom = one_cycle(0.003, total_steps=1000)
    assert float(lr(0)) == pytest.approx(0.0003, rel=1e-3)
    assert float(lr(400)) == pytest.approx(0.003, rel=1e-3)
    assert float(lr(1000)) == pytest.approx(0.003 / 1e4, rel=1e-2)
    assert float(mom(0)) == pytest.approx(0.95, rel=1e-3)
    assert float(mom(400)) == pytest.approx(0.85, rel=1e-3)
    assert float(mom(1000)) == pytest.approx(0.95, rel=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from tdal.runtime.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ckpts", max_to_keep=2)
    tree = {"params": {"w": jnp.arange(4.0)}, "step": np.int32(3)}
    mgr.save(1, tree, meta={"acc": 0.5})
    mgr.save(2, tree, meta={"acc": 0.9}, is_best=True)
    mgr.save(3, tree, meta={"acc": 0.7})
    mgr.save(4, tree, meta={"acc": 0.6})
    assert mgr.latest_step() == 4
    assert mgr.best_step() == 2  # best survives GC
    restored, meta = mgr.restore(2)
    np.testing.assert_allclose(restored["params"]["w"], np.arange(4.0))
    assert meta["acc"] == 0.9


def test_load_params_tolerant():
    import jax.numpy as jnp

    from tdal.runtime.checkpoint import load_params_tolerant

    target = {"a": jnp.zeros((2, 2)), "b": jnp.zeros(3), "c": jnp.zeros(1)}
    restored = {"a": jnp.ones((2, 2)), "b": jnp.ones(4)}  # b shape mismatch, c missing
    out = load_params_tolerant(restored, target)
    np.testing.assert_allclose(out["a"], 1.0)
    np.testing.assert_allclose(out["b"], 0.0)
    np.testing.assert_allclose(out["c"], 0.0)


def test_migrate_legacy_conv_params_and_loud_rename_failure():
    """ADVICE r2: pre-FusedConvBN checkpoints must either migrate exactly or
    fail loudly — never silently leave a conv/BN stack at random init."""
    import jax.numpy as jnp

    from tdal.runtime.checkpoint import (
        load_params_tolerant,
        migrate_legacy_conv_params,
    )

    k = jnp.arange(3 * 3 * 4 * 8, dtype=jnp.float32).reshape(3, 3, 4, 8)
    legacy = {
        "params": {
            "rpn": {
                "block0": {
                    "Conv_0": {"kernel": k},
                    "BatchNorm_0": {"scale": jnp.full(8, 2.0), "bias": jnp.full(8, 3.0)},
                    # a strided conv (with bias) must NOT be fused
                    "Conv_1": {"kernel": k, "bias": jnp.zeros(8)},
                }
            }
        },
        "batch_stats": {
            "rpn": {
                "block0": {"BatchNorm_0": {"mean": jnp.full(8, 5.0), "var": jnp.full(8, 7.0)}}
            }
        },
    }
    mig = migrate_legacy_conv_params(legacy)
    fused = mig["params"]["rpn"]["block0"]["FusedConvBN_0"]
    np.testing.assert_allclose(fused["kernel"], k)
    np.testing.assert_allclose(fused["scale"], 2.0)
    np.testing.assert_allclose(fused["bias"], 3.0)
    assert "Conv_0" not in mig["params"]["rpn"]["block0"]
    assert "Conv_1" in mig["params"]["rpn"]["block0"]  # untouched
    stats = mig["batch_stats"]["rpn"]["block0"]["FusedConvBN_0"]
    np.testing.assert_allclose(stats["mean"], 5.0)
    np.testing.assert_allclose(stats["var"], 7.0)

    # End-to-end: a legacy checkpoint restores exactly into the fused target.
    target = {
        "params": {
            "rpn": {
                "block0": {
                    "FusedConvBN_0": {
                        "kernel": jnp.zeros_like(k),
                        "scale": jnp.ones(8),
                        "bias": jnp.zeros(8),
                    },
                    "Conv_1": {"kernel": jnp.zeros_like(k), "bias": jnp.ones(8)},
                }
            }
        },
        "batch_stats": {
            "rpn": {"block0": {"FusedConvBN_0": {"mean": jnp.zeros(8), "var": jnp.ones(8)}}}
        },
    }
    out = load_params_tolerant(legacy, target)
    np.testing.assert_allclose(out["params"]["rpn"]["block0"]["FusedConvBN_0"]["kernel"], k)
    np.testing.assert_allclose(out["batch_stats"]["rpn"]["block0"]["FusedConvBN_0"]["mean"], 5.0)

    # A rename the migrator does NOT know about: whole module unrestored while
    # old keys sit unconsumed under the same parent -> loud error, not silence.
    weird = {
        "params": {"rpn": {"block0": {"SomeOldConv_0": {"kernel": k, "bias": jnp.zeros(8)}}}}
    }
    tgt2 = {
        "params": {
            "rpn": {"block0": {"NewConv_0": {"kernel": jnp.zeros_like(k), "bias": jnp.zeros(8)}}}
        }
    }
    with pytest.raises(ValueError, match="layer rename"):
        load_params_tolerant(weird, tgt2)
    out2 = load_params_tolerant(weird, tgt2, allow_partial_modules=True)
    np.testing.assert_allclose(out2["params"]["rpn"]["block0"]["NewConv_0"]["kernel"], 0.0)

    # Legitimate partial restore (finetune overlay: stage-2 absent from the
    # checkpoint, nothing unconsumed) must keep working without the flag.
    stage1 = {"params": {"stage1": {"w": jnp.ones(3)}}}
    both = {"params": {"stage1": {"w": jnp.zeros(3)}, "stage2": {"w": jnp.zeros(3)}}}
    out3 = load_params_tolerant(stage1, both)
    np.testing.assert_allclose(out3["params"]["stage1"]["w"], 1.0)
    np.testing.assert_allclose(out3["params"]["stage2"]["w"], 0.0)


def test_load_checkpoint_uri_url_and_npz(tmp_path):
    """URL (file://) tarball + .npz zoo loading (checkpoint.py:96-174 parity)."""
    import tarfile

    import jax.numpy as jnp

    from tdal.runtime.checkpoint import CheckpointManager, load_checkpoint_uri

    mgr = CheckpointManager(tmp_path / "zoo_ckpt")
    tree = {"params": {"w": jnp.arange(4.0)}}
    mgr.save(7, tree, meta={"acc": 1.0})
    tarball = tmp_path / "zoo.tar.gz"
    with tarfile.open(tarball, "w:gz") as tf:
        tf.add(tmp_path / "zoo_ckpt", arcname="zoo_ckpt")
    restored, meta = load_checkpoint_uri(
        f"file://{tarball}", cache_dir=tmp_path / "cache"
    )
    np.testing.assert_allclose(restored["params"]["w"], np.arange(4.0))
    # cache hit: second load must not re-download
    restored2, _ = load_checkpoint_uri(
        f"file://{tarball}", cache_dir=tmp_path / "cache"
    )
    np.testing.assert_allclose(restored2["params"]["w"], np.arange(4.0))

    np.savez(tmp_path / "flat.npz", **{"params/w": np.arange(3.0)})
    tree2, _ = load_checkpoint_uri(
        f"file://{tmp_path}/flat.npz", cache_dir=tmp_path / "cache"
    )
    np.testing.assert_allclose(tree2["params"]["w"], np.arange(3.0))

    # plain local path dispatch
    tree3, meta3 = load_checkpoint_uri(str(tmp_path / "zoo_ckpt"))
    np.testing.assert_allclose(tree3["params"]["w"], np.arange(4.0))


def test_async_checkpoint_roundtrip(tmp_path):
    """ROADMAP item 5: async saves commit in the background; restore waits."""
    import jax.numpy as jnp

    from tdal.runtime.checkpoint import CheckpointManager

    mgr = CheckpointManager(tmp_path / "ck", use_async=True)
    tree = {"params": {"w": jnp.arange(8.0)}}
    mgr.save(1, tree, meta={"acc": 0.5})
    mgr.wait()
    restored, meta = mgr.restore(target=tree)
    np.testing.assert_allclose(restored["params"]["w"], np.arange(8.0))
    assert meta["acc"] == 0.5
    # a second save immediately after the first (tests in-flight handling)
    mgr.save(2, {"params": {"w": jnp.ones(8)}}, meta={"acc": 0.9}, is_best=True)
    restored, meta = mgr.restore(target=tree)  # restore() waits internally
    np.testing.assert_allclose(restored["params"]["w"], 1.0)
    assert mgr.best_step() == 2


def test_torchie_lr_policy_surface():
    """The six torchie LrUpdaterHook policies (lr_updater.py:85-175) pinned to
    the reference formulas at hand-picked steps."""
    import numpy as np

    from tdal.runtime.schedules import (
        cosine_lr,
        exp_lr,
        fixed_lr,
        inv_lr,
        poly_lr,
        step_lr,
        with_warmup,
    )

    assert float(fixed_lr(0.01)(123)) == pytest.approx(0.01)
    # step: int step_size -> gamma^(progress//N)
    s = step_lr(0.1, 3, gamma=0.5)
    assert float(s(0)) == pytest.approx(0.1)
    assert float(s(3)) == pytest.approx(0.05)
    assert float(s(7)) == pytest.approx(0.025)
    # step: milestone list -> gamma^(#milestones passed)
    s = step_lr(0.1, [2, 5], gamma=0.1)
    assert float(s(1)) == pytest.approx(0.1)
    assert float(s(2)) == pytest.approx(0.01)
    assert float(s(5)) == pytest.approx(0.001)
    assert float(exp_lr(0.1, 0.9)(10)) == pytest.approx(0.1 * 0.9**10)
    # poly: (base-min)*(1-p/P)^pow + min
    assert float(poly_lr(0.1, 100, power=2.0, min_lr=0.01)(50)) == pytest.approx(
        (0.1 - 0.01) * 0.25 + 0.01
    )
    assert float(inv_lr(0.1, gamma=0.01, power=2.0)(100)) == pytest.approx(
        0.1 * (1 + 0.01 * 100) ** -2.0
    )
    c = cosine_lr(0.1, 100, target_lr=0.02)
    assert float(c(0)) == pytest.approx(0.1)
    assert float(c(100)) == pytest.approx(0.02)
    assert float(c(50)) == pytest.approx(0.02 + 0.5 * 0.08)
    # warmup composition keeps the torchie ramp semantics
    w = with_warmup(fixed_lr(0.1), warmup_steps=10, warmup_ratio=0.5, mode="linear")
    assert float(w(0)) == pytest.approx(0.05)
    assert float(w(10)) == pytest.approx(0.1)
