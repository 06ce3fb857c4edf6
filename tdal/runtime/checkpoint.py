"""Checkpoint save/load (orbax) with best-metric selection and tolerant loading.

Capability parity with the reference's two checkpoint stories:
- torchie save/load/resume with meta{epoch,iter}, latest symlink, prefix-stripping and
  shape-mismatch-tolerant loading (det3d/torchie/trainer/checkpoint.py:42-215,
  trainer.py:337-351,482-495)
- the labeler tools' best-by-eval-acc ad-hoc torch.save (tools/static_train.py:149-165)

One orbax-based story serves both (SURVEY.md §5.4).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Directory of step-numbered checkpoints + meta.json, with latest/best markers."""

    def __init__(
        self, directory: str | os.PathLike, max_to_keep: int = 5,
        use_async: bool = False,
    ):
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        # use_async=True: saves return immediately and serialize on a
        # background thread (orbax AsyncCheckpointer); call wait() before
        # reading the checkpoint back or exiting. Training loops keep the
        # default synchronous story (the labeler/detector ckpts are small);
        # async is for multi-GB two-stage states on multi-day runs.
        if use_async:
            self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        else:
            self._ckptr = ocp.PyTreeCheckpointer()
        self._async = use_async
        self._pending_meta = []  # (step, meta, is_best) awaiting async commit
        self.max_to_keep = max_to_keep

    def wait(self):
        """Block until any in-flight async save has committed, then write the
        deferred meta/best markers (the step dir only exists post-commit)."""
        if self._async:
            self._ckptr.wait_until_finished()
            for step, meta, is_best in self._pending_meta:
                self._write_markers(step, meta, is_best)
            self._pending_meta = []
            self._gc()

    def _step_dir(self, step: int) -> Path:
        return self.directory / f"ckpt_{step:08d}"

    def _write_markers(self, step: int, meta: dict, is_best: bool):
        path = self._step_dir(step)
        (path / "meta.json").write_text(json.dumps(meta, default=float))
        (self.directory / "latest.json").write_text(json.dumps({"step": step}))
        if is_best:
            (self.directory / "best.json").write_text(
                json.dumps({"step": step, **{k: v for k, v in meta.items()}}, default=float)
            )

    def save(self, step: int, state_tree: Any, meta: Optional[dict] = None, is_best: bool = False):
        """state_tree: any pytree (e.g. {'params':..., 'batch_stats':..., 'opt_state':...})."""
        path = self._step_dir(step)
        self._ckptr.save(path, _to_host(state_tree), force=True)
        meta = dict(meta or {})
        meta["step"] = step
        if self._async:
            # the step dir appears only when the background commit finishes
            self._pending_meta.append((step, meta, is_best))
            return path
        self._write_markers(step, meta, is_best)
        self._gc()
        return path

    def _gc(self):
        """Keep the newest max_to_keep checkpoints plus the best one."""
        steps = sorted(self.all_steps())
        best = self.best_step()
        for s in steps[: max(0, len(steps) - self.max_to_keep)]:
            if s == best:
                continue
            import shutil

            shutil.rmtree(self._step_dir(s), ignore_errors=True)

    def all_steps(self):
        return [
            int(p.name.split("_")[1])
            for p in self.directory.glob("ckpt_*")
            if p.is_dir()
        ]

    def latest_step(self) -> Optional[int]:
        marker = self.directory / "latest.json"
        if marker.exists():
            step = json.loads(marker.read_text())["step"]
            if self._step_dir(step).exists():
                return step
        steps = self.all_steps()
        return max(steps) if steps else None

    def best_step(self) -> Optional[int]:
        marker = self.directory / "best.json"
        if marker.exists():
            step = json.loads(marker.read_text())["step"]
            if self._step_dir(step).exists():
                return step
        return None

    def restore(self, step: Optional[int] = None, target: Any = None):
        """Restore a checkpoint tree. step=None -> latest. Returns (tree, meta)."""
        self.wait()
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        path = self._step_dir(step)
        tree = self._ckptr.restore(path, item=_to_host(target) if target is not None else None)
        meta_path = path / "meta.json"
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {"step": step}
        return tree, meta


def load_checkpoint_uri(uri: str, target: Any = None, cache_dir=None, logger=None):
    """Restore a checkpoint from a path or URL (pretrained-zoo workflow).

    Parity: reference load_checkpoint's url/modelzoo dispatch
    (torchie/trainer/checkpoint.py:96-174). http(s):// and file:// checkpoints
    are downloaded (an orbax step directory packed as .tar.gz, or a .npz of
    flat params) into ``cache_dir`` (~/.cache/tdal by default) keyed by URL
    hash; local paths restore directly via CheckpointManager."""
    import hashlib
    import tarfile
    import urllib.request

    if "://" in uri:
        cache_dir = Path(cache_dir or Path.home() / ".cache" / "tdal")
        cache_dir.mkdir(parents=True, exist_ok=True)
        name = hashlib.sha256(uri.encode()).hexdigest()[:16]
        suffix = ".npz" if uri.endswith(".npz") else ".tar.gz"
        local = cache_dir / (name + suffix)
        if not local.exists():
            if logger:
                logger.info(f"downloading checkpoint {uri} -> {local}")
            with urllib.request.urlopen(uri) as r, open(local, "wb") as f:
                f.write(r.read())
        if suffix == ".npz":
            import numpy as np

            flat = dict(np.load(local))
            tree = {}
            for k, v in flat.items():
                node = tree
                parts = k.split("/")
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = v
            return tree, {}
        extract = cache_dir / name
        if not extract.exists():
            with tarfile.open(local) as tf:
                # filter="data" rejects absolute paths, "..", links outside the
                # tree, and device files — a hostile checkpoint archive must
                # not be able to write outside the cache dir.
                tf.extractall(extract, filter="data")
        # the archive holds one checkpoint-manager directory
        roots = [p for p in extract.iterdir() if p.is_dir()]
        ckpt_dir = roots[0] if len(roots) == 1 and not (extract / "latest.json").exists() else extract
        return CheckpointManager(ckpt_dir).restore(target=target)
    return CheckpointManager(uri).restore(target=target)


def migrate_legacy_conv_params(state: dict) -> dict:
    """Rewrite pre-FusedConvBN checkpoint subtrees to the current layout.

    Round-2 moved ConvBNReLU's 3x3 stride-1 case from nn.Conv+nn.BatchNorm
    (``Conv_N/kernel`` + ``BatchNorm_N/{scale,bias}``, stats under
    ``batch_stats/.../BatchNorm_N/{mean,var}``) to FusedConvBN (flat
    ``FusedConvBN_N/{kernel,scale,bias}`` + stats ``{mean,var}``). This walks
    the ``params`` collection, fuses sibling Conv_N/BatchNorm_N pairs that
    match the FusedConvBN dispatch condition (3x3 kernel, no conv bias), and
    applies the same renames at the same module paths inside ``batch_stats``
    (where the kernel isn't visible, so params must drive). Trees without a
    params collection, and subtrees that don't match, pass through unchanged."""
    if not isinstance(state, dict) or "params" not in state:
        return state
    renames = []  # (module_path_tuple, old_bn_name, new_name)

    def walk_params(tree, path):
        if not isinstance(tree, dict):
            return tree
        out = {}
        consumed = set()
        for m, sub in tree.items():
            if (
                m.startswith("Conv_")
                and isinstance(sub, dict)
                and "kernel" in sub
                and "bias" not in sub
            ):
                idx = m.split("_", 1)[1]
                bn = f"BatchNorm_{idx}"
                k = sub["kernel"]
                if (
                    bn in tree
                    and isinstance(tree[bn], dict)
                    and getattr(k, "ndim", 0) == 4
                    and k.shape[0] == 3
                    and k.shape[1] == 3
                ):
                    out[f"FusedConvBN_{idx}"] = {"kernel": k, **tree[bn]}
                    consumed.update({m, bn})
                    renames.append((path, bn, f"FusedConvBN_{idx}"))
                    continue
            if m not in consumed:
                out[m] = walk_params(sub, path + (m,))
        for m in consumed:
            out.pop(m, None)
        return out

    new_state = dict(state)
    new_state["params"] = walk_params(state["params"], ())
    if "batch_stats" in state and renames:
        import copy

        bs = copy.deepcopy(state["batch_stats"])
        for path, old, new in renames:
            node = bs
            ok = True
            for p in path:
                if not isinstance(node, dict) or p not in node:
                    ok = False
                    break
                node = node[p]
            if ok and isinstance(node, dict) and old in node:
                node[new] = node.pop(old)
        new_state["batch_stats"] = bs
    return new_state


def load_params_tolerant(
    restored: dict, target: dict, logger=None, allow_partial_modules: bool = False
) -> dict:
    """Overlay restored leaves onto target, skipping missing keys and shape mismatches.

    Parity: reference load_state_dict(strict=False)-with-shape-skips
    (torchie/trainer/checkpoint.py:42-94). Used for finetune/freeze flows where the
    two-stage model loads first-stage weights.

    Legacy flax trees (pre-FusedConvBN naming) are migrated via
    migrate_legacy_conv_params before matching. If after that an ENTIRE target
    module subtree restores zero leaves while the restored tree still has
    unconsumed keys under the same parent (the signature of a layer rename,
    not of a genuinely absent stage), this raises instead of silently leaving
    the module at random init — pass allow_partial_modules=True to override."""
    restored = migrate_legacy_conv_params(restored)
    flat_r = dict(jax.tree_util.tree_flatten_with_path(restored)[0])
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(target)
    used = set()
    out = []
    skipped = []
    for path, leaf in flat_t:
        if path in flat_r and getattr(flat_r[path], "shape", None) == getattr(leaf, "shape", None):
            out.append(flat_r[path])
            used.add(path)
        else:
            skipped.append(path)
            if logger is not None:
                logger.warning(f"checkpoint: skipping {jax.tree_util.keystr(path)}")
            out.append(leaf)
    if skipped and not allow_partial_modules:
        # Group by module (path minus leaf name): a module with SOME leaves
        # restored is a shape-mismatch case; one with NONE restored is either
        # a genuinely new stage (fine — nothing similar in the checkpoint) or
        # a rename (dangerous — the old weights sit unconsumed next door).
        target_modules = {}
        for path, _ in flat_t:
            target_modules.setdefault(path[:-1], []).append(path)
        unconsumed_parents = {p[:-1][:-1] for p in flat_r if p not in used}
        for mod, paths in target_modules.items():
            if any(p in used for p in paths):
                continue
            if all(p in skipped for p in paths) and mod[:-1] in unconsumed_parents:
                names = [jax.tree_util.keystr(p) for p in paths[:4]]
                raise ValueError(
                    "checkpoint restore left module "
                    f"{jax.tree_util.keystr(mod) or '<root>'} entirely at init "
                    f"({names}...) while unrestored checkpoint keys exist under "
                    "the same parent — this looks like a layer rename, not a "
                    "missing stage. Migrate the checkpoint or pass "
                    "allow_partial_modules=True if this is intentional."
                )
    return jax.tree_util.tree_unflatten(treedef, out)
