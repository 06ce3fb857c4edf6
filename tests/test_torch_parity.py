"""Weight-graft numerical parity against the ACTUAL reference torch models.

The strongest parity evidence available in this environment (VERDICT r2 item 2):
import the reference's own nn.Modules (/root/reference/tools/static_model.py,
dynamic_model.py, det3d/models/losses/centernet_loss.py) under the installed
CPU torch, graft the SAME weights into the tdal flax models, and assert that
forward outputs and loss values agree in fp32 — closing the "output box
parameterization bit-compatible" contract with the reference's own code rather
than re-derived oracles (tests/oracles.py).

Scope notes:
- EVAL-mode forward (running-stat BN, no dropout): the reference's random
  object-point gather (static_model.py:23-49) and tdal's vectorized gather
  (pointnet.gather_object_points) produce the same SET of positive points when
  n_pos < n_pts; every consumer is a permutation/duplication-invariant
  max-pool, so eval forwards must match to float tolerance. TRAIN-mode batch
  stats over the gathered set depend on the (random) duplication multiplicities
  in the reference itself, so no canonical train-mode value exists to pin.
- Losses are pure functions of (output, labels): with outputs verified equal,
  loss values are compared directly on both sides.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_TOOLS = Path("/root/reference/tools")
REF_ROOT = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF_TOOLS.exists(), reason="reference checkout not available"
)


# ---------------------------------------------------------------------------
# Reference import harness: stub CUDA + absent deps, load the real modules
# ---------------------------------------------------------------------------


def _stub_module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _stub_package(name, path):
    mod = _stub_module(name)
    mod.__path__ = [str(path)]
    return mod


def _load_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    """The reference torch modules, importable on this CPU-only image.

    Stubs: det3d.core.bbox.box_np_ops (unused by the model classes),
    fpointnet_train.provider_fpointnet (absent from the reference repo
    entirely), numba.jit (pass-through), and .cuda() as a no-op."""
    saved = {
        k: sys.modules.get(k)
        for k in (
            "utils",
            "static_model",
            "dynamic_model",
            "numba",
            "fpointnet_train",
            "fpointnet_train.provider_fpointnet",
        )
    }
    # torch.Tensor.cuda / nn.Module.cuda -> identity (CPU-only torch).
    orig_t_cuda = torch.Tensor.cuda
    orig_m_cuda = torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # the reference was written against numpy<1.24 (np.float annotations)
    legacy_aliases = {"float": float, "int": int}
    added_aliases = [k for k in legacy_aliases if not hasattr(np, k)]
    for k in added_aliases:
        setattr(np, k, legacy_aliases[k])

    prov = _stub_module("fpointnet_train.provider_fpointnet")
    _stub_module("fpointnet_train", provider_fpointnet=prov)
    _stub_module("numba", jit=lambda *a, **k: (lambda f: f))

    # det3d as hollow packages (correct __path__, but the real __init__.py
    # files must NOT execute: they pull in spconv/apex) so that
    # centernet_loss.py and center_utils.py load for real, including the
    # relative `from .circle_nms_jit import circle_nms`.
    _stub_package("det3d", REF_ROOT / "det3d")
    _stub_package("det3d.models", REF_ROOT / "det3d/models")
    _stub_package("det3d.models.losses", REF_ROOT / "det3d/models/losses")
    core = _stub_package("det3d.core", REF_ROOT / "det3d/core")
    _stub_package("det3d.core.utils", REF_ROOT / "det3d/core/utils")
    bbox = _stub_module("det3d.core.bbox", box_np_ops=types.SimpleNamespace())
    core.bbox = bbox
    import det3d.core.utils.center_utils as center_utils

    try:
        utils = _load_file("utils", REF_TOOLS / "utils.py")
        static = _load_file("static_model", REF_TOOLS / "static_model.py")
        dynamic = _load_file("dynamic_model", REF_TOOLS / "dynamic_model.py")
        import det3d.models.losses.centernet_loss as centernet_loss

        yield types.SimpleNamespace(
            utils=utils,
            static=static,
            dynamic=dynamic,
            centernet_loss=centernet_loss,
            center_utils=center_utils,
        )
    finally:
        torch.Tensor.cuda = orig_t_cuda
        torch.nn.Module.cuda = orig_m_cuda
        for k in added_aliases:
            delattr(np, k)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# ---------------------------------------------------------------------------
# Weight graft: torch modules -> flax param/batch_stats trees
# ---------------------------------------------------------------------------


def _t2n(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def _conv1d(m):  # nn.Conv1d(k=1) (Cout, Cin, 1) -> Dense kernel (Cin, Cout)
    return {"kernel": _t2n(m.weight)[:, :, 0].T, "bias": _t2n(m.bias)}


def _linear(m):  # nn.Linear (Cout, Cin) -> Dense kernel (Cin, Cout)
    return {"kernel": _t2n(m.weight).T, "bias": _t2n(m.bias)}


def _mlp(layers):
    """[(linear_or_conv, bn, is_conv)] -> (SharedMLP/DenseBNStack params, stats)."""
    params, stats = {}, {}
    for i, (lin, bn, is_conv) in enumerate(layers):
        params[f"Dense_{i}"] = _conv1d(lin) if is_conv else _linear(lin)
        params[f"BatchNorm_{i}"] = {"scale": _t2n(bn.weight), "bias": _t2n(bn.bias)}
        stats[f"BatchNorm_{i}"] = {
            "mean": _t2n(bn.running_mean),
            "var": _t2n(bn.running_var),
        }
    return params, stats


def _graft_seg(ts):
    """torch PointNetInstanceSeg -> flax PointNetSeg (static_model.py:241-296)."""
    p, s = {}, {}
    p["SharedMLP_0"], s["SharedMLP_0"] = _mlp(
        [(ts.conv1, ts.bn1, True), (ts.conv2, ts.bn2, True)]
    )
    p["SharedMLP_1"], s["SharedMLP_1"] = _mlp(
        [(ts.conv3, ts.bn3, True), (ts.conv4, ts.bn4, True), (ts.conv5, ts.bn5, True)]
    )
    p["SharedMLP_2"], s["SharedMLP_2"] = _mlp(
        [
            (ts.dconv1, ts.dbn1, True),
            (ts.dconv2, ts.dbn2, True),
            (ts.dconv3, ts.dbn3, True),
            (ts.dconv4, ts.dbn4, True),
        ]
    )
    p["Dense_0"] = _conv1d(ts.dconv5)
    return p, s


def _graft_box_est(tb):
    """torch PointNetEstimation -> flax PointNetBoxEst (static_model.py:298-339)."""
    p, s = {}, {}
    p["SharedMLP_0"], s["SharedMLP_0"] = _mlp(
        [
            (tb.conv1, tb.bn1, True),
            (tb.conv2, tb.bn2, True),
            (tb.conv3, tb.bn3, True),
            (tb.conv4, tb.bn4, True),
        ]
    )
    p["DenseBNStack_0"], s["DenseBNStack_0"] = _mlp(
        [(tb.fc1, tb.fcbn1, False), (tb.fc2, tb.fcbn2, False)]
    )
    p["Dense_0"] = _linear(tb.fc3)
    return p, s


def _graft_embedding(tm):
    """torch Point/BoxEmbedding -> flax (dynamic_model.py:214-286)."""
    p, s = {}, {}
    p["SharedMLP_0"], s["SharedMLP_0"] = _mlp(
        [
            (tm.conv1, tm.bn1, True),
            (tm.conv2, tm.bn2, True),
            (tm.conv3, tm.bn3, True),
            (tm.conv4, tm.bn4, True),
        ]
    )
    p["DenseBNStack_0"], s["DenseBNStack_0"] = _mlp(
        [(tm.fc1, tm.fcbn1, False), (tm.fc2, tm.fcbn2, False)]
    )
    return p, s


def _graft_mlp_head(th):
    """torch dynamic PointNetEstimation (MLP-only, dynamic_model.py:288-312)."""
    p, s = {}, {}
    p["DenseBNStack_0"], s["DenseBNStack_0"] = _mlp(
        [(th.fc1, th.fcbn1, False), (th.fc2, th.fcbn2, False)]
    )
    p["Dense_0"] = _linear(th.fc3)
    return p, s


def _assert_same_tree(grafted, initialized, where=""):
    import jax

    gk = {
        (jax.tree_util.keystr(p), tuple(np.shape(l)))
        for p, l in jax.tree_util.tree_flatten_with_path(grafted)[0]
    }
    ik = {
        (jax.tree_util.keystr(p), tuple(np.shape(l)))
        for p, l in jax.tree_util.tree_flatten_with_path(initialized)[0]
    }
    assert gk == ik, f"{where}: graft/init tree mismatch:\nonly-graft={gk - ik}\nonly-init={ik - gk}"


# ---------------------------------------------------------------------------
# Shared inputs
# ---------------------------------------------------------------------------

B, N = 4, 256


def _boxes(rng, b):
    c = rng.normal(size=(b, 3)).astype(np.float32)
    d = (np.abs(rng.normal(size=(b, 3))) + 1.0).astype(np.float32)
    h = rng.uniform(-np.pi, np.pi, size=(b, 1)).astype(np.float32)
    return np.concatenate([c, d, h], axis=1)


def _labels(rng, b, n):
    return {
        "mask_label": (rng.random((b, n)) > 0.5).astype(np.float32),
        "center_label": rng.normal(size=(b, 3)).astype(np.float32),
        "heading_class_label": rng.integers(0, 12, size=(b,)).astype(np.int64),
        "heading_residuals_label": rng.uniform(-0.2, 0.2, size=(b,)).astype(np.float32),
        "size_class_label": rng.integers(0, 3, size=(b,)).astype(np.int64),
        "size_residuals_label": rng.normal(scale=0.2, size=(b, 3)).astype(np.float32),
    }


def _loss_args_torch(labels):
    return (
        torch.from_numpy(labels["mask_label"]),
        torch.from_numpy(labels["center_label"]),
        torch.from_numpy(labels["heading_class_label"]),
        torch.from_numpy(labels["heading_residuals_label"]),
        torch.from_numpy(labels["size_class_label"]),
        torch.from_numpy(labels["size_residuals_label"]),
    )


def _close(a, b, what, atol=2e-4, rtol=1e-4):
    np.testing.assert_allclose(
        np.asarray(a, np.float64), np.asarray(b, np.float64), atol=atol, rtol=rtol,
        err_msg=what,
    )


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_codecs_match_reference_utils(ref):
    """tdal.core.codecs vs reference tools/utils.py:53-79, dense angle sweep."""
    from tdal.core import codecs

    # +0.0137 keeps the sweep off exact bin-edge angles (e.g. -pi/4), where the
    # reference's fp64 int() truncation and fp32 floor legitimately tie-break
    # to adjacent bins; the boundary itself is measure-zero and both codecs
    # agree with their own class2angle inverse there.
    for ang in np.linspace(-3 * np.pi, 3 * np.pi, 97) + 0.0137:
        rc, rr = ref.utils.angle2class(ang, 12)
        mc, mr = codecs.angle2class(np.float32(ang))
        assert int(mc) == rc, f"angle2class bin at {ang}"
        _close(float(mr), rr, f"angle2class residual at {ang}", atol=1e-5)
        for res in (-0.1, 0.0, 0.2):
            _close(
                float(codecs.class2angle(np.int32(rc), np.float32(res))),
                ref.utils.class2angle(rc, res, 12),
                f"class2angle at {ang}",
                atol=1e-5,
            )
    rng = np.random.default_rng(0)
    for lwh in np.abs(rng.normal(size=(50, 3))) * 3 + 0.5:
        rc, rr = ref.utils.size2class(lwh)
        mc, mr = codecs.size2class(lwh.astype(np.float32))
        assert int(mc) == rc
        _close(mr, rr, "size2class residual", atol=1e-5)
        _close(
            codecs.class2size(np.int32(rc), rr.astype(np.float32)),
            ref.utils.class2size(rc, rr),
            "class2size",
            atol=1e-5,
        )


def test_static_one_box_forward_and_loss_parity(ref):
    import jax
    import jax.numpy as jnp

    from tdal.models.static_labeler import StaticLabelerOneBox, frustum_loss_one_box
    from tdal.runtime.train_state import init_model

    torch.manual_seed(0)
    tm = ref.static.StaticModelOneBoxEst()
    tm.eval()
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    init_box = _boxes(rng, B)
    bbox_gt = _boxes(rng, B)

    with torch.no_grad():
        tout = tm(
            torch.from_numpy(pts.transpose(0, 2, 1)),
            torch.from_numpy(init_box),
            torch.from_numpy(bbox_gt),
        )

    seg_p, seg_s = _graft_seg(tm.ins_seg)
    box_p, box_s = _graft_box_est(tm.box_est)
    params = {"PointNetSeg_0": seg_p, "PointNetBoxEst_0": box_p}
    stats = {"PointNetSeg_0": seg_s, "PointNetBoxEst_0": box_s}

    model = StaticLabelerOneBox()
    ip, istats = init_model(
        model, jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(init_box)
    )
    _assert_same_tree(params, ip, "one-box params")
    _assert_same_tree(stats, istats, "one-box batch_stats")

    fout = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts),
        jnp.asarray(init_box),
        jnp.asarray(bbox_gt),
        train=False,
    )
    for k in (
        "logits",
        "center",
        "center_boxnet",
        "heading_scores",
        "heading_residuals_normalized",
        "heading_residuals",
        "size_scores",
        "size_residuals_normalized",
        "size_residuals",
    ):
        _close(fout[k], _t2n(tout[k]), f"one-box output[{k}]")
    np.testing.assert_array_equal(
        np.asarray(fout["mask"]), tout["mask"].numpy(), "one-box mask"
    )

    labels = _labels(rng, B, N)
    tloss = ref.static.FrustumPointNetLossOneBoxEst()(tout, *_loss_args_torch(labels))
    floss = frustum_loss_one_box(
        {k: jnp.asarray(v) for k, v in fout.items()},
        {k: jnp.asarray(v) for k, v in labels.items()},
    )
    for k in tloss:
        _close(float(floss[k]), float(tloss[k]), f"one-box loss[{k}]")


def test_static_two_box_forward_and_loss_parity(ref):
    import jax
    import jax.numpy as jnp

    from tdal.models.static_labeler import StaticLabelerTwoBox, frustum_loss_two_box
    from tdal.runtime.train_state import init_model

    torch.manual_seed(1)
    tm = ref.static.StaticModelTwoBoxEst()
    tm.eval()
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    init_box = _boxes(rng, B)
    bbox_gt = _boxes(rng, B)

    with torch.no_grad():
        tout = tm(
            torch.from_numpy(pts.transpose(0, 2, 1)),
            torch.from_numpy(init_box),
            torch.from_numpy(bbox_gt),
        )

    seg_p, seg_s = _graft_seg(tm.ins_seg)
    one_p, one_s = _graft_box_est(tm.box_est_one)
    two_p, two_s = _graft_box_est(tm.box_est_two)
    params = {
        "PointNetSeg_0": seg_p,
        "PointNetBoxEst_0": one_p,
        "PointNetBoxEst_1": two_p,
    }
    stats = {
        "PointNetSeg_0": seg_s,
        "PointNetBoxEst_0": one_s,
        "PointNetBoxEst_1": two_s,
    }

    model = StaticLabelerTwoBox()
    ip, istats = init_model(
        model, jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(init_box)
    )
    _assert_same_tree(params, ip, "two-box params")
    _assert_same_tree(stats, istats, "two-box batch_stats")

    fout = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts),
        jnp.asarray(init_box),
        jnp.asarray(bbox_gt),
        train=False,
    )
    for k in (
        "logits",
        "center_one",
        "center_two",
        "center",
        "heading_scores_one",
        "heading_scores_two",
        "heading_residuals_normalized_one",
        "heading_residuals_normalized_two",
        "size_scores_one",
        "size_scores_two",
        "size_residuals_normalized_one",
        "size_residuals_normalized_two",
        "size_residuals_one",
        "size_residuals_two",
    ):
        _close(fout[k], _t2n(tout[k]), f"two-box output[{k}]")
    # box_one heading may differ by 2*pi wrapping conventions; compare center,
    # size directly and heading via sin/cos.
    b1_ref, b1 = _t2n(tout["box_one"]), np.asarray(fout["box_one"])
    _close(b1[:, :6], b1_ref[:, :6], "box_one center+size")
    _close(np.sin(b1[:, 6]), np.sin(b1_ref[:, 6]), "box_one sin(heading)")
    _close(np.cos(b1[:, 6]), np.cos(b1_ref[:, 6]), "box_one cos(heading)")
    np.testing.assert_array_equal(
        np.asarray(fout["heading_class_label_two"]),
        _t2n(tout["heading_class_label_two"]).astype(np.int64),
        "heading_class_label_two",
    )
    _close(
        fout["heading_residuals_label_two"],
        _t2n(tout["heading_residuals_label_two"]),
        "heading_residuals_label_two",
    )

    labels = _labels(rng, B, N)
    tloss = ref.static.FrustumPointNetLossTwoBoxEst()(tout, *_loss_args_torch(labels))
    floss = frustum_loss_two_box(
        {k: jnp.asarray(np.asarray(v)) for k, v in fout.items()},
        {k: jnp.asarray(v) for k, v in labels.items()},
    )
    for k in tloss:
        _close(float(floss[k]), float(tloss[k]), f"two-box loss[{k}]")


def test_dynamic_forward_and_loss_parity(ref):
    import jax
    import jax.numpy as jnp

    from tdal.models.dynamic_labeler import DynamicLabeler, dynamic_loss
    from tdal.runtime.train_state import init_model

    torch.manual_seed(2)
    tm = ref.dynamic.DynamicModel()
    tm.eval()
    rng = np.random.default_rng(3)
    n = 320  # < n_object_points (2560): every positive is gathered on both sides
    pts = rng.normal(size=(B, n, 4)).astype(np.float32)
    boxes = rng.normal(size=(B, 101, 8)).astype(np.float32)
    bbox_gt = _boxes(rng, B)

    with torch.no_grad():
        tout = tm(
            torch.from_numpy(pts.transpose(0, 2, 1)),
            torch.from_numpy(boxes.transpose(0, 2, 1)),
            torch.from_numpy(bbox_gt),
        )

    seg_p, seg_s = _graft_seg(tm.ins_seg)
    pe_p, pe_s = _graft_embedding(tm.point_emb)
    be_p, be_s = _graft_embedding(tm.box_emb)
    bh_p, bh_s = _graft_mlp_head(tm.box_est)
    params = {
        "PointNetSeg_0": seg_p,
        "PointEmbedding_0": pe_p,
        "BoxEmbedding_0": be_p,
        "EmbeddingBoxHead_0": bh_p,
    }
    stats = {
        "PointNetSeg_0": seg_s,
        "PointEmbedding_0": pe_s,
        "BoxEmbedding_0": be_s,
        "EmbeddingBoxHead_0": bh_s,
    }

    model = DynamicLabeler()
    ip, istats = init_model(
        model, jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(boxes)
    )
    _assert_same_tree(params, ip, "dynamic params")
    _assert_same_tree(stats, istats, "dynamic batch_stats")

    fout = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts),
        jnp.asarray(boxes),
        jnp.asarray(bbox_gt),
        train=False,
    )
    for k in (
        "logits",
        "center",
        "heading_scores",
        "heading_residuals_normalized",
        "heading_residuals",
        "size_scores",
        "size_residuals_normalized",
        "size_residuals",
    ):
        _close(fout[k], _t2n(tout[k]), f"dynamic output[{k}]")

    labels = _labels(rng, B, n)
    tloss = ref.dynamic.DynamicModelLoss()(tout, *_loss_args_torch(labels))
    floss = dynamic_loss(
        {k: jnp.asarray(np.asarray(v)) for k, v in fout.items()},
        {k: jnp.asarray(v) for k, v in labels.items()},
    )
    for k in tloss:
        _close(float(floss[k]), float(tloss[k]), f"dynamic loss[{k}]")


def test_centernet_losses_parity(ref):
    """FastFocalLoss / RegLoss vs det3d/models/losses/centernet_loss.py."""
    import jax.numpy as jnp

    from tdal.models.center_head import fast_focal_loss, reg_loss

    rng = np.random.default_rng(4)
    b, h, w, c, m, d = 2, 16, 24, 3, 20, 8
    out = rng.uniform(1e-3, 1 - 1e-3, size=(b, h, w, c)).astype(np.float32)
    target = np.zeros((b, h, w, c), np.float32)
    # sparse gaussian-ish peaks like assign_centernet_targets produces
    for _ in range(30):
        target[
            rng.integers(b), rng.integers(h), rng.integers(w), rng.integers(c)
        ] = rng.uniform(0.3, 1.0)
    ind = rng.integers(0, h * w, size=(b, m)).astype(np.int64)
    mask = (rng.random((b, m)) > 0.3).astype(np.float32)
    cat = rng.integers(0, c, size=(b, m)).astype(np.int64)

    tfl = ref.centernet_loss.FastFocalLoss()(
        torch.from_numpy(out.transpose(0, 3, 1, 2)),
        torch.from_numpy(target.transpose(0, 3, 1, 2)),
        torch.from_numpy(ind),
        torch.from_numpy(mask),
        torch.from_numpy(cat),
    )
    ffl = fast_focal_loss(
        jnp.asarray(out), jnp.asarray(target), jnp.asarray(ind),
        jnp.asarray(mask), jnp.asarray(cat),
    )
    _close(float(ffl), float(tfl), "fast_focal_loss", atol=1e-5)

    # num_pos == 0 edge case (centernet_loss.py:50-51)
    tfl0 = ref.centernet_loss.FastFocalLoss()(
        torch.from_numpy(out.transpose(0, 3, 1, 2)),
        torch.from_numpy(target.transpose(0, 3, 1, 2)),
        torch.from_numpy(ind),
        torch.zeros(b, m),
        torch.from_numpy(cat),
    )
    ffl0 = fast_focal_loss(
        jnp.asarray(out), jnp.asarray(target), jnp.asarray(ind),
        jnp.zeros((b, m)), jnp.asarray(cat),
    )
    _close(float(ffl0), float(tfl0), "fast_focal_loss num_pos=0", atol=1e-5)

    reg_out = rng.normal(size=(b, h, w, d)).astype(np.float32)
    reg_target = rng.normal(size=(b, m, d)).astype(np.float32)
    trl = ref.centernet_loss.RegLoss()(
        torch.from_numpy(reg_out.transpose(0, 3, 1, 2)),
        torch.from_numpy(mask),
        torch.from_numpy(ind),
        torch.from_numpy(reg_target),
    )
    frl = reg_loss(
        jnp.asarray(reg_out), jnp.asarray(mask), jnp.asarray(ind),
        jnp.asarray(reg_target),
    )
    _close(np.asarray(frl), _t2n(trl), "reg_loss", atol=1e-5)
